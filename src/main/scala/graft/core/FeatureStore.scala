package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, StructField, StructType, TimestampType}

import graft.operators.LatestPerKey

/** Dual online/offline feature store (SURVEY.md §1.1).
  *
  * Layout under `root`:
  * {{{
  *   <root>/<group>/manifest.json        — schema + key/event-time + next batch id
  *   <root>/<group>/offline/v<N>/        — append-only history, parquet,
  *                                         partitioned by _ingest_date
  *                                         (reference: offline S3 parquet store,
  *                                          setup.sh:86,139-141 — unpartitioned
  *                                          there; we add date partitioning so
  *                                          pruning actually prunes files)
  *   <root>/<group>/offline/CURRENT      — pointer file: active offline version
  *                                         (absent ⇒ v1; flipped atomically by
  *                                          compaction)
  *   <root>/<group>/online/v<N>/         — latest-per-key snapshot, parquet,
  *                                         partitioned by _key_bucket =
  *                                         crc32(key) mod buckets; contains
  *                                         `_meta` (bucket count + per-bucket
  *                                         key counts) and `_serving/` (per-
  *                                         bucket sparse-indexed KV files for
  *                                         job-free point lookups). Commits
  *                                         are INCREMENTAL: untouched buckets
  *                                         carry from v<N-1> by hard link.
  *   <root>/<group>/online/LATEST        — pointer file: currently active N
  *   <root>/<group>/models/              — model artifacts
  * }}}
  *
  * Online-store semantics (reference: setup.sh:87 EnableOnlineStore, read path
  * real_time_inference.py:16-19): exactly one current record per entity key;
  * an ingest with a newer event_time replaces the visible record. We maintain
  * it as a materialized latest-per-key snapshot, swapped atomically by writing
  * a staged v<N+1> and then flipping the LATEST pointer — a crash mid-swap
  * leaves the old snapshot active (SURVEY.md §7 risk 5). Writer safety
  * without Delta/Iceberg (documented substitution): every pointer commit is
  * a COMPARE-AND-SWAP against the version the rewrite derived from
  * ([[OptimisticPointer]]) — concurrent writers cannot silently clobber
  * each other; the loser fails loudly.
  */
/** @param maxServingCacheRows upper bound on the DRIVER-side serving cache:
  *   a snapshot with more entity keys than this is never collected — lookups
  *   fall through to a key-bucket-pruned parquet read instead (one partition
  *   directory, not a snapshot scan). This is the driver-memory guard rail;
  *   at cluster scale the cache seam is an external KV store fed by the same
  *   versioned snapshot, with the same version-keyed invalidation.
  * @param targetKeysPerBucket sizing dial for the online snapshot's key-hash
  *   bucketing: commits choose the bucket count from the PREVIOUS version's
  *   recorded key count (`buckets = nextPow2(keys / target)`, floor
  *   [[FeatureStore.OnlineKeyBuckets]], cap
  *   [[FeatureStore.MaxOnlineKeyBuckets]]); once a version's keys exceed
  *   4× target × buckets, the next refresh rebuckets with a full rewrite —
  *   a billion-key store lands at ~64 Ki keys per bucket instead of the
  *   fixed-64 layout's ~16 M (VERDICT r9 "serving-KV bucket scaling").
  * @param clock serving-time source for [[getRecordFresh]]'s staleness gate —
  *   injectable so the gate is deterministic under test; production uses the
  *   default wall clock. */
final class FeatureStore(spark: SparkSession, root: String,
    maxServingCacheRows: Int = 1 << 20,
    targetKeysPerBucket: Long = FeatureStore.DefaultTargetKeysPerBucket,
    clock: () => java.time.Instant = () => java.time.Instant.now()) {

  // charset check at the PATH chokepoint: every group-addressed path —
  // read or write — goes through here, so an unvalidated name (or a
  // traversal like "../x" from the SQL faces' string args) can never
  // resolve outside the store root
  private def groupDir(name: String): Path = {
    require(name.matches("[A-Za-z0-9_]+"), s"illegal feature group name: '$name'")
    Paths.get(root, name)
  }
  private def manifestPath(name: String): Path = groupDir(name).resolve("manifest.json")
  /** The offline store is VERSIONED (`offline/v<N>/` + `CURRENT` pointer),
    * so compaction can commit by one atomic pointer move instead of the
    * round-3 two-move directory swap whose crash window lost the store until
    * a re-run. No CURRENT file means v1 (the pointer is only ever written by
    * [[compactOffline]]'s commit). */
  private def offlineRoot(name: String): Path = groupDir(name).resolve("offline")
  private def offlineVersion(name: String): Long = {
    val p = offlineRoot(name).resolve("CURRENT")
    if (Files.exists(p)) new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong else 1L
  }
  private def offlineDir(name: String): String =
    offlineRoot(name).resolve(s"v${offlineVersion(name)}").toString
  private def onlineDir(name: String): Path = groupDir(name).resolve("online")
  def modelDir(name: String): String = groupDir(name).resolve("models").toString

  // ---- catalog (reference: setup.sh feature-group / database / table DDL; cleanup.sh drops) ----

  def groupExists(name: String): Boolean = Files.exists(manifestPath(name))

  /** Serialize the manifest's read-modify-write commits through the
    * [[Coordination]] seam — the same discipline the index families
    * follow. Two concurrent ingests must never both claim one
    * `_ingest_seq` (the deterministic last-writer tie-break depends on
    * uniqueness), and two schema mutations must never interleave their
    * read→validate→write. Sections are kept NARROW: the lock never spans
    * a Spark job, so a widen's multi-second materialization blocks other
    * writers via the `widening` flag, not via lock hold time, and READERS
    * never take it (reads resolve through immutable versions + the atomic
    * manifest swap). */
  private def withManifestLock[A](groupName: String, mustExist: Boolean = true)(
      body: => A): A = {
    // existence precedes acquisition: the lock CREATES its root directory,
    // so probing a typo'd group through a mutator must error before it
    // materializes a phantom group dir (round-12 review; the name charset
    // itself is validated at [[groupDir]], the path chokepoint)
    require(!mustExist || groupExists(groupName),
      s"no such feature group: $groupName")
    Coordination.current.withWriterLock(groupDir(groupName), "manifest.lock")(body)
  }

  def createGroup(g: FeatureGroup): Unit =
    withManifestLock(g.name, mustExist = false) {
      require(!groupExists(g.name), s"feature group ${g.name} already exists")
      Files.createDirectories(groupDir(g.name))
      writeManifest(g, nextSeq = 0L, epoch = 0L)
    }

  def describeGroup(name: String): FeatureGroup = readManifest(name).group

  /** Evolution state surfaced to operators (the SQL describe face), from
    * ONE manifest read so the declared view and the registry can never
    * disagree: the declared group, the LINGERING-column registry — names
    * whose bytes may remain in offline files at the recorded type without
    * a declared owner (from drops and from renames' alias eras), each
    * blocking a conflicting-type claim until [[compactOffline]] erases
    * them — and any pending widen awaiting its recovery re-run. */
  def evolutionState(name: String): (FeatureGroup, Seq[(String, FType)], Option[String]) = {
    val m = readManifest(name)
    (m.group, m.lingering.map(e => (e._1, e._2)), m.widening)
  }

  /** Schema EVOLUTION: declare a new feature on an existing group. A
    * metadata-only commit — one atomic manifest swap, no data rewritten
    * (the Delta/Iceberg `ADD COLUMN` semantic; at 100 TB rewriting history
    * for a new column is not an option). History written before the change
    * reads as NULL for the new feature ([[offline]] reads with the DECLARED
    * schema, so parquet fills absent columns); the online snapshot grows the
    * column at the next [[refreshOnline]] (it conforms every frame to the
    * declared schema); [[getRecord]] serves null until then — the caller's
    * default applies, the reference's missing-feature semantic (P4). */
  def addFeature(groupName: String, f: FeatureDef): Unit = withManifestLock(groupName) {
    val m = readManifest(groupName)
    requireNoPendingWiden(m, groupName, s"declare '${f.name}'")
    require(!m.group.features.exists(_.name == f.name),
      s"feature ${f.name} already declared on $groupName")
    requireNoLingeringConflict(m, groupName, f.name, f.ftype)
    // a feature added to a group WITH history is only real from the next
    // ingest seq on — for a brand-new name that is a no-op (old files lack
    // the column, parquet fills nulls), but for a RE-ADD after dropFeature
    // the old bytes still exist and must read as null (FeatureDef.since)
    val stamped = f.copy(since = if (m.nextSeq > 0L) m.nextSeq else 0L)
    // FeatureGroup's constructor re-validates the name charset; a
    // compatible (same-type) re-claim clears the name's lingering entry —
    // the re-declared column owns the name again, masking handles the old
    // bytes, and any later drop/rename-away re-records it
    writeManifest(m.group.copy(features = m.group.features :+ stamped),
      m.nextSeq, m.lastBatchId, m.lingering.filterNot(_._1 == f.name), m.widening,
      m.epoch + 1)
  }

  /** Guard for every operation that CLAIMS a column name (re-add, rename
    * target): refuse when offline files may still hold bytes under `name`
    * at a type parquet cannot read as `t` — the registry's recorded type.
    * A conflicting claim would make the offline read (and
    * [[compactOffline]], the only erase path, which reads through it)
    * throw on the long↔double/string conversion, permanently wedging the
    * group; refuse up front with the erase step named. Same-type claims
    * pass — `since` masking / era-exact reads keep the old bytes invisible
    * (round-12 review findings: the original guard covered only re-adds
    * of DROPPED names; rename targets and renames' alias eras wedge the
    * same way). */
  private def requireNoLingeringConflict(m: Manifest, groupName: String,
      name: String, t: FType): Unit =
    m.lingering.find(_._1 == name).foreach { case (_, orphanT, _) =>
      require(orphanT == t,
        s"cannot declare '$name' as ${FType.name(t)}: bytes of type " +
          s"${FType.name(orphanT)} may remain under that column in " +
          s"$groupName's offline history and parquet cannot read them as " +
          s"${FType.name(t)} — run compactOffline(\"$groupName\") to erase " +
          "them first, then re-declare")
    }

  /** Schema EVOLUTION: DROP COLUMN — metadata-only, like [[addFeature]]
    * (at 100 TB, rewriting history to remove a column is not an option).
    * Offline reads project the declared schema, so the column vanishes
    * from every read path at once; the online snapshot and serving KV
    * re-render without it at the next commit (the schema mismatch forces
    * a full refresh), while [[getRecord]] paths over the pre-drop
    * snapshot render DECLARED features only. The bytes are physically
    * erased at the next [[compactOffline]] (which rewrites through the
    * declared-schema read). A later [[addFeature]] of the same name gets
    * FRESH NULLS for pre-re-add history, not the orphaned bytes
    * (FeatureDef.since masking) — but only at the SAME type: a re-claim at
    * a different type is refused while orphaned bytes may remain, because
    * parquet cannot read them under the new declared schema (the manifest's
    * LINGERING registry tracks this; compact first to erase, then re-add).
    * The key and event-time columns are not droppable. */
  def dropFeature(groupName: String, featureName: String): Unit = withManifestLock(groupName) {
    val m = readManifest(groupName)
    val g = m.group
    requireNoPendingWiden(m, groupName, s"drop '$featureName'")
    val f = g.features.find(_.name == featureName).getOrElse(
      throw new IllegalArgumentException(s"no such feature $featureName on $groupName"))
    require(featureName != g.keyCol && featureName != g.eventTimeCol,
      s"cannot drop the group's key/event-time column: $featureName")
    // a drop on a group WITH history leaves orphaned bytes in parquet under
    // the feature's current name AND any alias names (files written while
    // an alias was current, not yet compacted) — all at the drop-time type,
    // since widen (the only type changer) materializes before clearing its
    // alias. Record a lingering entry for each, stamped with THIS write's
    // epoch (entry IDENTITY for compaction's fold — a re-record after the
    // compaction's plan capture carries a later epoch, so a compaction
    // that never read those bytes cannot clear it); entries clear on a
    // compatible re-claim or when [[compactOffline]] erases the bytes.
    // an alias name can have been RE-CLAIMED by a later same-type add —
    // it has a declared owner again, so it gets no entry (the registry's
    // invariant is "no declared owner"; an entry here would also make the
    // describe face list one name as both declared and lingering)
    val declaredAfter = g.features.iterator
      .filterNot(_.name == featureName).map(_.name).toSet
    val orphans =
      if (m.nextSeq > 0L)
        ((featureName, f.ftype, m.epoch + 1) +:
          f.renames.map { case (n, _) => (n, f.ftype, m.epoch + 1) })
          .distinctBy(_._1)
          .filterNot(o => declaredAfter(o._1))
      else Nil
    writeManifest(g.copy(features = g.features.filterNot(_.name == featureName)),
      m.nextSeq, m.lastBatchId,
      m.lingering.filterNot(d => orphans.exists(_._1 == d._1)) ++ orphans, m.widening,
      m.epoch + 1)
  }

  /** Schema EVOLUTION: RENAME COLUMN — metadata-only like the other two
    * (no 100 TB rewrite). The rename is stamped with the next ingest seq
    * and recorded in [[FeatureDef.renames]]; every read path resolves a
    * row's ERA to the name that held the value when the row was written
    * ([[eraColumn]]), so pre-rename history serves under the NEW name
    * immediately. New ingests must carry the new name (the declared-schema
    * validation). A rewrite (compaction, online full refresh) materializes
    * the history under the new name; the adaptive era rule then reads the
    * current column wherever the alias column no longer exists, so reads
    * stay correct before, during, and after the rewrite with no manifest
    * mutation. Era-exactness also means a rename TO a name whose orphaned
    * bytes linger from an earlier [[dropFeature]] cannot resurrect them —
    * rows of the alias era read the alias column, never the orphan — but
    * the TYPE of those orphans still constrains the claim: the next ingest
    * would write `to`-named bytes at this feature's type next to them, so
    * a conflicting-type claim is refused ([[requireNoLingeringConflict]]).
    * Symmetrically, the rename leaves `from`-named bytes lingering in
    * un-compacted files and records them in the registry. The key and
    * event-time columns are not renameable (their names anchor bucketing,
    * tombstones, and the manifest contract). */
  def renameFeature(groupName: String, from: String, to: String): Unit = withManifestLock(groupName) {
    val m = readManifest(groupName)
    val g = m.group
    requireNoPendingWiden(m, groupName, s"rename '$from'")
    val f = g.features.find(_.name == from).getOrElse(
      throw new IllegalArgumentException(s"no such feature $from on $groupName"))
    require(!g.features.exists(_.name == to),
      s"feature $to already declared on $groupName")
    require(from != g.keyCol && from != g.eventTimeCol,
      s"cannot rename the group's key/event-time column: $from")
    requireNoLingeringConflict(m, groupName, to, f.ftype)
    val renamed = g.features.map {
      case ff if ff.name == from =>
        ff.copy(name = to, renames = (from, m.nextSeq) +: ff.renames)
      case ff => ff
    }
    // registry bookkeeping mirrors [[dropFeature]]'s: with history, the
    // alias-era bytes under `from` linger until compaction (stamped with
    // this write's epoch); the claim of `to` clears any same-type entry
    val lingering0 = m.lingering.filterNot(_._1 == to)
    val lingering =
      if (m.nextSeq > 0L)
        lingering0.filterNot(_._1 == from) :+ ((from, f.ftype, m.epoch + 1))
      else lingering0
    // FeatureGroup's constructor re-validates the new name's charset
    writeManifest(g.copy(features = renamed), m.nextSeq, m.lastBatchId,
      lingering, m.widening, m.epoch + 1)
  }

  /** Schema EVOLUTION: WIDEN a feature's type (Integral→Fractional,
    * Integral→FString, Fractional→FString). The one evolution that
    * REWRITES history: Spark's parquet reader upcasts int→long and
    * long→decimal natively but NOT long→double/string (probed on 4.1), so
    * the widened type must be materialized into the files. The sequence
    * is crash-safe at every step:
    *
    *  1. metadata flip — the new type plus a SELF-ALIAS rename entry,
    *     which routes reads through the era/merge path where the old
    *     files' column is CAST on read (reads are correct immediately,
    *     before any rewrite);
    *  2. one [[compactOffline]] under its CAS commit materializes the
    *     type into v<N+1> (cost class: a compaction — at 100 TB schedule
    *     it like one);
    *  3. every rename alias is cleared (the rewrite materialized all
    *     eras under current names), returning reads to the
    *     explicit-schema fast path;
    *  4. the online snapshot rebuilds in the new type.
    *
    * A crash between any two steps leaves a readable store, and re-running
    * `widenFeature` with the same arguments completes the remaining steps
    * (same-type re-runs are accepted for exactly that recovery). A widen
    * left pending by a crash BLOCKS ingest and every other schema mutator
    * until the re-run materializes it (the manifest's `widening` flag,
    * armed atomically with the flip — [[requireNoPendingWiden]]): an
    * ingest landing between the flip and the rewrite would put new-typed
    * files next to old-typed ones under one column name — unreadable by
    * any parquet schema merge — so the store fails fast with the recovery
    * step named instead of wedging; deletes alone stay legal (GDPR never
    * waits, and they cannot create mixed-type files). The key and
    * event-time columns are not widenable (the key's string rendering
    * anchors bucket hashing and KV entries). */
  def widenFeature(groupName: String, featureName: String, to: FType): Unit = {
    // FLIP section (one arbitrated RMW — the lock is NOT held across the
    // materializing compaction below; the `widening` flag carries the
    // cross-step guard instead)
    val hadHistory = withManifestLock(groupName) {
      val m = readManifest(groupName)
      val g = m.group
      val f = g.features.find(_.name == featureName).getOrElse(
        throw new IllegalArgumentException(s"no such feature $featureName on $groupName"))
      require(featureName != g.keyCol && featureName != g.eventTimeCol,
        s"cannot widen the group's key/event-time column: $featureName")
      require(f.ftype == to || FeatureStore.isWidening(f.ftype, to),
        s"not a widening: ${FType.name(f.ftype)} -> ${FType.name(to)} " +
          "(allowed: Integral->Fractional, Integral->FString, Fractional->FString)")
      // while a widen's crash window is open, the only legal widen is the
      // recovery re-run on the SAME feature (any target type — reads cast
      // through the era path, so a chained recovery widen stays sound)
      require(m.widening.forall(_ == featureName),
        s"feature group $groupName has an unfinished widenFeature on " +
          s"'${m.widening.getOrElse("")}' — re-run it before widening $featureName")
      if (f.ftype != to) {
        val flipped = g.features.map {
          case ff if ff.name == featureName =>
            ff.copy(ftype = to, renames = (featureName, m.nextSeq) +: ff.renames)
          case ff => ff
        }
        // `widening` armed in the SAME atomic manifest swap as the flip:
        // until the materializing rewrite lands, ingest and every other
        // schema mutator refuse (see [[requireNoPendingWiden]]) — the
        // self-alias alone cannot carry that guard, because a rename could
        // move the feature's name out from under a shape-based check
        // (round-12 review finding)
        writeManifest(g.copy(features = flipped), m.nextSeq, m.lastBatchId,
          m.lingering, widening = Some(featureName), epoch = m.epoch + 1)
      }
      m.nextSeq > 0L
    }
    if (hadHistory) { // a group with history: materialize + clear aliases
      compactOffline(groupName): Unit
      val cleared = withManifestLock(groupName) {
        val m2 = readManifest(groupName)
        val c = m2.group.copy(
          features = m2.group.features.map(_.copy(renames = Nil)))
        writeManifest(c, m2.nextSeq, m2.lastBatchId, m2.lingering,
          widening = None, epoch = m2.epoch + 1)
        c
      }
      refreshOnline(cleared, None)
    } else {
      // no history yet — the flip alone suffices; drop every alias (no
      // files exist, so aliases are dead weight). UNCONDITIONAL so a
      // same-type re-run clears a crash-stranded self-alias + widening
      // flag too (the documented recovery; round-12 review finding).
      withManifestLock(groupName) {
        val m2 = readManifest(groupName)
        writeManifest(m2.group.copy(
            features = m2.group.features.map(_.copy(renames = Nil))),
          m2.nextSeq, m2.lastBatchId, m2.lingering, widening = None,
          epoch = m2.epoch + 1)
      }
    }
  }

  /** Guard shared by the metadata mutators: while a widen's crash window is
    * open ([[widenFeature]]'s step-1 flip landed, its materializing rewrite
    * has not — the manifest's `widening` flag) the ONLY legal next step is
    * re-running that widen. Any other schema mutation could move the
    * pending feature's identity out from under the recovery contract (the
    * rename-away-and-back attack from the round-12 review). Deletes stay
    * legal during the window: tombstones carry no feature columns and the
    * online rewrite conforms per immutable version, so no mixed-type file
    * can arise from them — GDPR never waits on a crashed widen. */
  private def requireNoPendingWiden(m: Manifest, groupName: String,
      action: String): Unit =
    require(m.widening.isEmpty,
      s"cannot $action on $groupName: unfinished widenFeature on " +
        s"'${m.widening.getOrElse("")}' — re-run it to materialize first")

  /** The era-resolved SOURCE expression of feature `f` over a layout whose
    * columns are `avail` (requires `_ingest_seq` in the frame): rows at or
    * past the newest rename's seq read the current column; older rows read
    * the alias that held the value in their era — unless that alias is
    * absent from the layout, which means a rewrite already materialized
    * the era under the current name (the adaptive rule in
    * [[renameFeature]]'s doc). Plain column (or typed null) when the
    * feature was never renamed. */
  private[core] def eraColumn(f: FeatureDef, avail: Set[String]): org.apache.spark.sql.Column = {
    def colOrNull(n: String): org.apache.spark.sql.Column =
      if (avail.contains(n)) col(n).cast(f.ftype.spark)
      else lit(null).cast(f.ftype.spark)
    val cur = colOrNull(f.name)
    if (f.renames.isEmpty) cur
    else {
      // era i's value lives under its own name — or, when a rewrite
      // already materialized it, under the first NEWER name in the chain
      // that the layout still carries (a rewrite renders to the name
      // current AT REWRITE TIME, which may be an intermediate alias, not
      // necessarily today's). Schema-level first-present pick, NOT a
      // runtime coalesce: a legit null under the era name must not fall
      // through to a newer name's orphaned bytes.
      def eraExpr(i: Int): org.apache.spark.sql.Column =
        ((i to 0 by -1).map(j => f.renames(j)._1) :+ f.name)
          .find(avail.contains) match {
          case Some(n) => col(n).cast(f.ftype.spark)
          case None => lit(null).cast(f.ftype.spark)
        }
      val seqC = col(EngineColumns.IngestSeq)
      var e = when(seqC >= f.renames.head._2, cur)
      f.renames.init.zipWithIndex.foreach { case (_, i) =>
        e = e.when(seqC >= f.renames(i + 1)._2, eraExpr(i))
      }
      e.otherwise(eraExpr(f.renames.size - 1))
    }
  }

  /** Null out each feature's stored values where the row predates the
    * feature's `since` seq — the RE-ADD read mask (see [[FeatureDef]]).
    * Identity for never-evolved groups. Requires `_ingest_seq` in `df`. */
  private[core] def maskSince(g: FeatureGroup, df: DataFrame): DataFrame =
    if (g.features.forall(_.since == 0L)) df
    else df.select(df.columns.toSeq.map { c =>
      g.features.find(f => f.name == c && f.since > 0L) match {
        case Some(f) =>
          when(col(EngineColumns.IngestSeq) >= f.since, col(c)).as(c)
        case None => col(c)
      }
    }: _*)

  def dropGroup(name: String): Unit = {
    val dir = groupDir(name)
    if (Files.exists(dir)) {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
      finally walk.close()
    }
    servingCache.remove(name): Unit
    bucketCountCache.remove(name): Unit // a recreated group may re-reach v1
    schemaMatchCache.keySet.removeIf(_._1 == name): Unit // same re-reach hazard
  }

  // ---- ingest (reference: update_feature_store.py — per-row put_record; ours is set-oriented) ----

  /** Batch ingest: validates against the declared schema, appends full history
    * to the offline store, and refreshes the online snapshot incrementally
    * (only keys present in the batch are recomputed — old ∪ batch → argmax,
    * SURVEY.md §4 "caching / incremental view maintenance").
    *
    * Crash safety: the sequence is bumped and persisted BEFORE the data
    * append, so a retried ingest after a crash never reuses an `_ingest_seq`
    * (which would break the deterministic last-writer tie-break). A crash
    * between the manifest bump and the append just skips a sequence number.
    *
    * Concurrency: the seq claim is one arbitrated manifest RMW and the
    * append job is serialized per group ([[Coordination]] writer locks —
    * see [[withManifestLock]]), so concurrent ingests can never duplicate
    * a seq or clobber each other's committer staging; their ONLINE commits
    * still race through the snapshot CAS, where the loser fails loudly and
    * its appended history rows surface at the group's next commit.
    *
    * @param batchId streaming replay guard: when given (foreachBatch batch id),
    *                an id at or below the last recorded one is a replay and is
    *                skipped (returns -1) — otherwise foreachBatch retries would
    *                append duplicate rows to offline history. The id is
    *                recorded AFTER the append commits, so a crash (or a
    *                stale-schema rejection) before the rows are durable
    *                leaves the batch unclaimed and the stream's retry lands
    *                it — at-least-once: only a crash in the narrow window
    *                between the append's commit and the record can duplicate
    *                the batch's offline rows (fresh seq; argmax serving is
    *                unaffected), never lose them.
    */
  def ingest(groupName: String, df: DataFrame, batchId: Option[Long] = None): Long = {
    // seq claim = one arbitrated manifest RMW: two concurrent ingests must
    // never both read nextSeq=N and stamp duplicate `_ingest_seq` values
    // (which would silently break the deterministic last-writer tie-break
    // — far worse than the loud CAS loss their online commits race into)
    val claimed = withManifestLock(groupName) {
      val m = readManifest(groupName)
      if (batchId.exists(_ <= m.lastBatchId)) None
      else {
        // a PENDING widen (the manifest flag a crashed widenFeature left
        // between its metadata flip and its materializing rewrite) must
        // complete before new data lands: an ingest here would write
        // new-typed files next to old-typed ones under ONE column name,
        // which no parquet schema merge can read back — fail fast with the
        // recovery step instead of wedging the store. The guard keys on
        // `widening`, not the self-alias SHAPE: a shape check either
        // misses a rename-away (head only) or false-positives on a
        // legitimate rename-back (exists) — round-12 review finding;
        // renames are blocked while the flag is set, so the recorded name
        // stays the feature's name.
        require(m.widening.isEmpty, {
          val w = m.widening.getOrElse("")
          val t = m.group.features.find(_.name == w).map(f => FType.name(f.ftype))
            .getOrElse("<widened type>")
          s"feature group $groupName has an unfinished widenFeature on '$w' — " +
            s"re-run widenFeature(\"$groupName\", \"$w\", $t) to materialize it " +
            "before ingesting"
        })
        val missing = m.group.featureNames.filterNot(df.columns.contains)
        require(missing.isEmpty, s"ingest batch missing declared features: $missing")
        // NOTE the claim does NOT advance lastBatchId — that records only
        // after the append COMMITS (below). Recording it here would make
        // any failure between claim and append (a crash, a stale-schema
        // rejection) read as a replay on the stream's retry and silently
        // drop the micro-batch: permanent row loss. The post-append record
        // means a crash inside the window can instead DUPLICATE the
        // batch's offline rows under a fresh seq on retry — at-least-once,
        // the argmax serve unaffected — which is the recoverable side of
        // that trade (round-12 review).
        writeManifest(m.group, m.nextSeq + 1, m.lastBatchId,
          m.lingering, m.widening, m.epoch + 1)
        Some((m.group, m.nextSeq))
      }
    }
    val (g, seq) = claimed.getOrElse(return -1L)

    val typed = df.select(g.features.map(f => col(f.name).cast(f.ftype.spark).as(f.name)): _*)
      .withColumn(EngineColumns.IngestSeq, lit(seq))
      .withColumn(EngineColumns.IngestDate, to_date(col(g.eventTimeCol)))

    // integrity metrics ride the append job (Dataset.observe — zero extra
    // scans, exactly what a 100 TB ingest wants); the UN-observed `typed`
    // goes to refreshOnline because an Observation binds to one action
    val obs = org.apache.spark.sql.Observation(s"ingest_${groupName}_$seq")
    phaseTimings.remove(groupName): Unit
    timedPhase(groupName, "offline_append") {
      // appends to ONE directory share the committer's `_temporary`
      // staging — two concurrent append jobs there can delete each
      // other's in-flight task output (silent row loss). One lock acquire
      // per BATCH serializes just the append job; version commits still
      // arbitrate through their own CAS (losers loud, as spec'd).
      // compactOffline holds this same lock across its rewrite+CAS, so an
      // append never lands in a version dir the post-flip GC deletes.
      Coordination.current.withWriterLock(offlineRoot(groupName), "append.lock") {
        // VALIDATE-AT-APPEND: the seq claim admitted this batch under the
        // manifest it read; if a schema evolution landed between the claim
        // and this append — e.g. while it waited behind a compaction
        // holding this lock (a widen's materialization) — the typed
        // frame's casts are stale and could write unmergeable bytes into
        // the new layout. Fail loudly with the claimed seq skipped (the
        // crash rule already tolerates skipped seqs) instead.
        // A failure here needs no rollback: the batch id records only
        // after the append commits, so the stream's retry of this same
        // micro-batch is not a replay and lands under the evolved schema.
        val now = readManifest(groupName)
        require(now.widening.isEmpty && FeatureStore.declaredFingerprint(now.group)
            == FeatureStore.declaredFingerprint(g),
          s"feature group $groupName evolved while ingest seq=$seq was in " +
            "flight — the batch was NOT appended (seq skipped); re-run the ingest")
        typed.observe(obs,
            count(lit(1)).as("rows"),
            count(when(col(g.keyCol).isNull, 1)).as("null_keys"),
            count(when(col(g.eventTimeCol).isNull, 1)).as("null_event_times"),
            // rides the same append job (zero extra scans) so the BOOTSTRAP
            // commit can size its bucket count without a second persist+count
            // pass over the store — see fullRefresh (VERDICT r10 item 2: the
            // per-commit fixed tax behind the q59 regression)
            approx_count_distinct(col(g.keyCol)).as("distinct_keys"))
          .write.mode("append").partitionBy(EngineColumns.IngestDate).parquet(offlineDir(groupName))
      }
    }
    // the batch id becomes a replay-skippable fact only now that its rows
    // are DURABLY in offline history (see the claim's NOTE)
    batchId.foreach { b =>
      withManifestLock(groupName) {
        val mm = readManifest(groupName)
        if (mm.lastBatchId < b)
          writeManifest(mm.group, mm.nextSeq, b, mm.lingering, mm.widening,
            mm.epoch + 1)
      }
    }
    val o = obs.get
    metrics.put(groupName, IngestMetrics(o("rows").asInstanceOf[Long],
      o("null_keys").asInstanceOf[Long], o("null_event_times").asInstanceOf[Long]))
    timedPhase(groupName, "seq_marker")(recordSeqCommit(groupName, seq))

    // seq 0 ⇒ this batch IS the whole offline history: the refresh can
    // size its buckets from the append job's observed key count
    refreshOnline(g, Some(typed),
      firstIngestKeys = if (seq == 0L) Some(o("distinct_keys").asInstanceOf[Long]) else None)
    seq
  }

  // ---- time travel (read-as-of) ----

  private def seqLogDir(name: String): Path = groupDir(name).resolve("seqlog")

  /** One empty marker file per committed ingest, `seq-<n>-<epochMillis>` —
    * the seq→wall-clock mapping [[ingestSeqAt]] resolves timestamps
    * against. Lives OUTSIDE the versioned offline dirs so compaction GC
    * never sweeps it; the filename carries both fields, so resolution is a
    * directory listing with zero file reads (at minute-level micro-batches
    * that is ~500k tiny names per year — list-cheap on any store; prune old
    * markers with retention if a group outlives its reproducibility
    * window). Written AFTER the offline append: a crashed ingest that never
    * materialized data never becomes a resolvable point in time. */
  private def recordSeqCommit(name: String, seq: Long): Unit = {
    Files.createDirectories(seqLogDir(name))
    Files.write(seqLogDir(name).resolve(s"seq-$seq-${System.currentTimeMillis}"),
      Array.emptyByteArray): Unit
  }

  /** Offline history pinned at an ingest sequence — the time-travel read:
    * exactly the rows a consumer saw when `asOfSeq` was the newest committed
    * batch, no matter how much the store has ingested since. The pin is a
    * plain filter on the `_ingest_seq` column every offline row carries, so
    * it survives [[compactOffline]] (compaction rewrites files, never rows)
    * and composes with partition pruning like any other predicate.
    *
    * GDPR wins over reproducibility: [[deleteRecords]] tombstones (and the
    * physical erase a later compaction performs) apply to EVERY read,
    * pinned or not — time travel never resurrects a deleted key. */
  def offlineAsOf(name: String, asOfSeq: Long): DataFrame =
    offline(name).filter(col(EngineColumns.IngestSeq) <= asOfSeq)

  /** [[historicalQuery]] against the [[offlineAsOf]] pinned view — the
    * reproducible-training-frame read: re-running with the same `asOfSeq`
    * returns the same frame against a store that kept ingesting. */
  def historicalQueryAsOf(groupName: String, columns: Seq[String],
      start: String, end: String, asOfSeq: Long): DataFrame =
    historicalRange(offlineAsOf(groupName, asOfSeq), describeGroup(groupName),
      columns, start, end)

  /** Resolve a wall-clock instant to the newest ingest seq committed at or
    * before it (the `(timestamp)` form of read-as-of: pass the result to
    * [[offlineAsOf]]/[[historicalQueryAsOf]]). None when no ingest had
    * committed yet — or for groups whose ingests predate the seq log (the
    * seq form still works there; `_ingest_seq` is as old as the store). */
  def ingestSeqAt(groupName: String, asOf: java.time.Instant): Option[Long] = {
    val d = seqLogDir(groupName)
    if (!Files.exists(d)) return None
    import scala.jdk.CollectionConverters._
    val ls = Files.list(d)
    val marks = try ls.iterator().asScala.flatMap { p =>
      p.getFileName.toString.split("-") match {
        case Array("seq", s, t) if s.forall(_.isDigit) && t.forall(_.isDigit) =>
          Some((s.toLong, t.toLong))
        case _ => None
      }
    }.toList finally ls.close()
    marks.filter(_._2 <= asOf.toEpochMilli).map(_._1).maxOption
  }

  private val metrics = new java.util.concurrent.ConcurrentHashMap[String, IngestMetrics]()

  /** Metrics observed during the MOST RECENT [[ingest]] for the group (this
    * store instance). None before any ingest; a replayed/skipped batch does
    * not overwrite them. */
  def lastIngestMetrics(groupName: String): Option[IngestMetrics] =
    Option(metrics.get(groupName))

  // per-commit phase timings (observability for the fixed per-ingest tax:
  // which term — append, sizing, snapshot write, KV, CAS — a slow commit
  // spent its time in). Driver-side nanoTime pairs, zero Spark overhead.
  private val phaseTimings =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[(String, Double)]]()

  private def timedPhase[A](groupName: String, phase: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    phaseTimings.merge(groupName, Vector(phase -> (System.nanoTime() - t0) / 1e9),
      (old, one) => old ++ one)
    a
  }

  /** Driver-side wall-clock breakdown of the MOST RECENT [[ingest]] (or
    * [[refreshOnline]]) for the group, in call order — the per-commit tax
    * decomposed by term. Empty before any commit on this instance. */
  def lastCommitPhases(groupName: String): Seq[(String, Double)] =
    Option(phaseTimings.get(groupName)).getOrElse(Vector.empty)

  /** Conform a frame to the DECLARED schema + ingest seq (absent columns →
    * typed null): after addFeature the previous snapshot lacks the new
    * column and must not silently drop it from the incoming batch. */
  private def conformToDeclared(g: FeatureGroup, df: DataFrame): DataFrame = {
    val avail = df.columns.toSet
    df.select(g.features.map(f => eraColumn(f, avail).as(f.name))
      :+ col(EngineColumns.IngestSeq): _*)
  }

  /** Recompute the online snapshot. With `batch` given and a previous
    * snapshot whose bucket meta and schema allow it, the refresh is
    * INCREMENTAL IN THE BUCKET DIMENSION: only the key buckets the batch
    * touches are recomputed (old-bucket ∪ batch → latest-per-key) and
    * rewritten; every untouched bucket's parquet and serving-KV files carry
    * forward into v<next> by reference — O(batch ∩ buckets) compute and
    * I/O per commit instead of O(store), the shape a minute-level
    * micro-batch cadence over 10⁹ keys requires (VERDICT r9 missing #1).
    * Falls back to a full rewrite when: no previous snapshot; no batch
    * (explicit rebuild from history); the snapshot predates bucket meta;
    * the schema evolved since the snapshot (addFeature); the batch has
    * null keys; or the store outgrew its bucket count (the rebucketing
    * commit — see `targetKeysPerBucket`). */
  def refreshOnline(g: FeatureGroup, batch: Option[DataFrame],
      firstIngestKeys: Option[Long] = None): Unit = {
    val baseVersion = currentVersion(g.name) // the version this refresh derives from
    val incremental = (baseVersion, batch) match {
      case (Some(v), Some(b)) =>
        readVersionMeta(versionDirOf(g.name, v)).flatMap { case (buckets, counts) =>
          val total = counts.values.sum
          val grow = buckets < FeatureStore.MaxOnlineKeyBuckets &&
            total > 4L * targetKeysPerBucket * buckets
          if (grow || !snapshotSchemaMatches(g, v)) None
          else Some((v, buckets, counts, b))
        }
      case _ => None
    }
    incremental match {
      case Some((v, buckets, counts, b)) =>
        // pin the batch: the touched-bucket probe and the rewrite would
        // otherwise run the caller's plan twice (cost, and a correctness
        // hazard if the plan is nondeterministic — the rewrite must cover
        // exactly the buckets the probe saw)
        val bb = conformToDeclared(g, b).withColumn(EngineColumns.KeyBucket,
          pmod(crc32(col(g.keyCol).cast("string")), lit(buckets))).persist()
        try {
          // the batch's touched buckets: ≤ buckets distinct values by
          // construction, so the collect is driver-bounded at any data scale
          val touchedRows = bb.select(col(EngineColumns.KeyBucket)).distinct().collect()
          if (touchedRows.exists(_.isNullAt(0))) {
            // null keys bucket to null (crc32(null) is null) — rare; let the
            // full path's default-partition write handle them rather than
            // special-casing the carry-forward links
            fullRefresh(g, batch, baseVersion, Some(buckets))
          } else {
            val touched = touchedRows.map(_.get(0).asInstanceOf[Number].longValue).toSet
            if (touched.isEmpty) { servingCache.remove(g.name): Unit; return } // empty batch
            // belt over the fingerprint gate: carried-forward rows from a
            // correctly-matching version are already materialized-clean,
            // but masking is identity there and closes any residual
            // re-add window at the cost of one projection
            val snapTouched = maskSince(g,
              conformToDeclared(g, snapshotBuckets(g, v, touched)))
            val latestTouched = LatestPerKey.viaMaxBy(
              snapTouched.unionByName(bb.drop(EngineColumns.KeyBucket)),
              Seq(g.keyCol), g.eventTimeCol, Seq(EngineColumns.IngestSeq))
            commitIncremental(g, v, buckets, counts, touched, latestTouched)
          }
        } finally bb.unpersist(false): Unit
      case None =>
        // full rewrite: bucket count re-derived from the previous version's
        // recorded key count; with no prior meta (bootstrap / legacy
        // snapshot) it is derived from the COMPUTED latest frame inside
        // fullRefresh — without that, a large store's first commit lands at
        // the 64-bucket floor and its second commit pays a guaranteed
        // full rebucketing rewrite (measured: a 64-key batch into a fresh
        // 1M-key store cost the whole store again)
        val buckets = baseVersion
          .flatMap(v => readVersionMeta(versionDirOf(g.name, v)))
          .map { case (_, counts) =>
            FeatureStore.bucketCountFor(counts.values.sum, targetKeysPerBucket) }
        fullRefresh(g, batch, baseVersion, buckets, firstIngestKeys)
    }
  }

  private def fullRefresh(g: FeatureGroup, batch: Option[DataFrame],
      baseVersion: Option[Long], bucketsOpt: Option[Long],
      firstIngestKeys: Option[Long] = None): Unit = {
    // the FIRST ingest of a group (seq 0, no committed snapshot): the batch
    // IS the whole offline history, so derive the snapshot from the batch
    // frame directly — no parquet re-read of the history that was just
    // appended — and size buckets from the append job's observed
    // approx-distinct key count instead of a second persist+count pass
    // (two whole-store passes cut from the per-commit fixed tax the q59
    // driver tail exposed; the power-of-two bucket envelope absorbs the
    // ±few-% approximation error)
    val bootstrap = firstIngestKeys.filter(_ =>
      baseVersion.isEmpty && currentSnapshot(g.name).isEmpty && batch.isDefined)
    val base = (currentSnapshot(g.name), batch) match {
      case (Some(snap), Some(b)) =>
        // maskSince on the snapshot side: a full refresh crossing a
        // drop/re-add boundary must NOT carry the orphaned pre-drop values
        // into the rewritten snapshot (conformToDeclared era-resolves
        // names but cannot see `since`; identity for never-evolved
        // groups — round-12 review finding)
        maskSince(g, conformToDeclared(g, snap))
          .unionByName(maskSince(g, conformToDeclared(g, b)))
      case (_, _) => conformToDeclared(g, offline(g.name)) // offline() masks
    }
    val latest0 = LatestPerKey.viaMaxBy(base, Seq(g.keyCol), g.eventTimeCol,
      Seq(EngineColumns.IngestSeq))
    bucketsOpt.orElse(bootstrap.map(k =>
      FeatureStore.bucketCountFor(k, targetKeysPerBucket))) match {
      case Some(b) => commitOnlineSnapshot(g, latest0, baseVersion, b)
      case None =>
        // non-ingest bootstrap (explicit rebuild, legacy snapshot): size
        // the bucket count from the actual key count (one spill-safe
        // persist + count; these refreshes are rare and this saves the
        // otherwise-certain O(store) rebucket on the next commit)
        val p = latest0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val keys = timedPhase(g.name, "bootstrap_sizing_count")(p.count())
          commitOnlineSnapshot(g, p, baseVersion,
            FeatureStore.bucketCountFor(keys, targetKeysPerBucket))
        } finally p.unpersist(false): Unit
    }
  }

  /** Write `latest` as the next online snapshot version and atomically
    * advance the LATEST pointer (shared by [[fullRefresh]] and
    * [[deleteRecords]]' legacy path). `baseVersion` is the version the
    * snapshot DERIVED from (None = no snapshot existed): the commit is a
    * compare-and-swap against it, so two concurrent writers can never
    * silently clobber each other — the loser throws, the store stays on
    * the winner's version (FeatureStoreSpec's two-writer race). */
  private def commitOnlineSnapshot(g: FeatureGroup, latest: DataFrame,
      baseVersion: Option[Long], buckets: Long): Unit = {
    val next = baseVersion.getOrElse(0L) + 1
    Files.createDirectories(onlineDir(g.name))
    // rewrite into a PRIVATE staging dir: a racing writer derives the same
    // v<next> name, and only the CAS winner may touch it (promotion happens
    // inside the commit's critical section)
    val finalDir = versionDirOf(g.name, next)
    val dir = OptimisticPointer.stagingFor(finalDir)
    // key-bucket partitioning so an uncached point lookup prunes to ONE
    // bucket directory (getRecord fall-through when the snapshot exceeds
    // maxServingCacheRows) instead of scanning every key
    // repartition ON the bucket before partitionBy: without it every task
    // writes into every bucket dir (tasks × buckets tiny files per snapshot
    // — measured 1.7× on the ingest e2e queries); clustered, the write is
    // one file per bucket, which is also what the pruned point-read wants
    // r13-opt adjudication: sizing this width from Dedup.writeWidth was
    // tried and REVERTED — `buckets` is already derived from the store's
    // key count (bucketCountFor), so the write stage is data-proportional
    // by construction, and the extra per-commit estimate walk measurably
    // regressed the deep-plan SQL lifecycles (q241 isolated minima −18%)
    timedPhase(g.name, "snapshot_write") {
      latest
        .withColumn(EngineColumns.KeyBucket,
          pmod(crc32(col(g.keyCol).cast("string")), lit(buckets)))
        .repartition(buckets.toInt, col(EngineColumns.KeyBucket))
        .write.mode("overwrite").partitionBy(EngineColumns.KeyBucket).parquet(dir.toString)
    }
    // bucket-count stats and the serving-KV render both re-read the staged
    // parquet and are independent — run them CONCURRENTLY (one fixed Spark
    // job latency instead of two; part of the per-commit tax cut behind
    // the q59 driver-tail regression)
    var counts: Map[Long, Long] = Map.empty
    graft.dedup.Dedup.inParallel(Seq(
      () => counts = timedPhase(g.name, "bucket_counts")(bucketCounts(dir)),
      () => timedPhase(g.name, "serving_kv")( // rides the same staged commit
        writeServingKv(g, dir, buckets))))
    writeVersionMeta(dir, buckets, counts, g)
    try timedPhase(g.name, "pointer_cas")(OptimisticPointer.casSwap(
      onlineDir(g.name), "LATEST",
      expected = baseVersion.map(_.toString), next = next.toString,
      stage = Some(dir -> finalDir)))
    finally if (Files.exists(dir)) { // loser cleans its own staging
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally walk.close()
    }
    servingCache.remove(g.name): Unit // next getRecord rebuilds from v<next>
    bucketCountCache.remove(g.name): Unit
    schemaMatchCache.keySet.removeIf(_._1 == g.name): Unit // bound per commit
  }

  /** Commit v<base+1> by rewriting ONLY the `touched` buckets (`newRows`
    * REPLACES their contents — it must already be latest-per-key) and
    * carrying every other bucket's parquet and serving-KV files forward by
    * hard link. On a cluster filesystem this link step is the metadata-only
    * "new version references old files" a manifest-based table format gets
    * for free; the local-FS analogue is a hard link — old versions stay
    * readable ([[onlineAt]] time travel) and [[gcOnline]] only unlinks
    * names, the shared inodes survive as long as any version references
    * them. Shared by the incremental [[refreshOnline]] and the incremental
    * delete path. */
  private def commitIncremental(g: FeatureGroup, baseVersion: Long,
      buckets: Long, baseCounts: Map[Long, Long], touched: Set[Long],
      newRows: DataFrame): Unit = {
    val next = baseVersion + 1
    val baseDir = versionDirOf(g.name, baseVersion)
    val finalDir = versionDirOf(g.name, next)
    val dir = OptimisticPointer.stagingFor(finalDir)
    timedPhase(g.name, "snapshot_write") {
      newRows
        .withColumn(EngineColumns.KeyBucket,
          pmod(crc32(col(g.keyCol).cast("string")), lit(buckets)))
        .repartition(math.max(touched.size, 1), col(EngineColumns.KeyBucket))
        .write.mode("overwrite").partitionBy(EngineColumns.KeyBucket).parquet(dir.toString)
    }
    // bucket stats and the KV render both re-read the staged parquet
    // (touched buckets only at this point) and are independent — run them
    // concurrently (the commitOnlineSnapshot rationale). The carry-forward
    // links still happen strictly AFTER both: either job listing a carried
    // bucket mid-link would double-count it (stats) or double-render it
    // (KV over a file the link then collides with).
    var newCounts: Map[Long, Long] = Map.empty
    graft.dedup.Dedup.inParallel(Seq(
      () => newCounts = timedPhase(g.name, "bucket_counts")(bucketCounts(dir)),
      // staging holds ONLY the touched buckets here; width to match
      () => timedPhase(g.name, "serving_kv")(
        writeServingKv(g, dir, buckets, Some(math.max(touched.size, 1))))))
    timedPhase(g.name, "link_untouched")(linkUntouched(baseDir, dir, touched))
    writeVersionMeta(dir, buckets, (baseCounts -- touched) ++ newCounts, g)
    try timedPhase(g.name, "pointer_cas")(OptimisticPointer.casSwap(
      onlineDir(g.name), "LATEST",
      expected = Some(baseVersion.toString), next = next.toString,
      stage = Some(dir -> finalDir)))
    finally if (Files.exists(dir)) { // loser cleans its own staging
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally walk.close()
    }
    servingCache.remove(g.name): Unit
    bucketCountCache.remove(g.name): Unit
    schemaMatchCache.keySet.removeIf(_._1 == g.name): Unit // bound per commit
  }

  /** Hard-link every UNTOUCHED bucket's parquet partition dir and
    * serving-KV file from the committed base version into the staged next
    * version (see [[commitIncremental]]). The null-key default partition,
    * when present, is always carried (the incremental path is only taken
    * for batches without null keys, so it is untouched by construction). */
  private def linkUntouched(baseDir: Path, staged: Path, touched: Set[Long]): Unit = {
    import scala.jdk.CollectionConverters._
    def bucketOfName(n: String, prefix: String): Option[Long] =
      if (!n.startsWith(prefix)) None
      else {
        val s = n.drop(prefix.length).takeWhile(c => c.isDigit || c == '-')
        if (s.nonEmpty && s.forall(c => c.isDigit || c == '-')) scala.util.Try(s.toLong).toOption
        else None
      }
    // hard link where the filesystem supports it (the O(1) metadata move);
    // COPY as the portability fallback (correct everywhere, O(bytes) — on
    // an object store the real implementation is a manifest entry, this
    // seam is where it plugs in)
    def linkOrCopy(src: Path, dst: Path): Unit =
      try Files.createLink(dst, src): Unit
      catch {
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING): Unit
      }
    def linkFilesInto(src: Path, dst: Path): Unit = {
      Files.createDirectories(dst)
      val fl = Files.list(src)
      try fl.iterator().asScala.filter(Files.isRegularFile(_)).foreach(f =>
        linkOrCopy(f, dst.resolve(f.getFileName.toString)))
      finally fl.close()
    }
    val ls = Files.list(baseDir)
    val entries = try ls.iterator().asScala.toList finally ls.close()
    entries.foreach { p =>
      val n = p.getFileName.toString
      if (Files.isDirectory(p) && n.startsWith(EngineColumns.KeyBucket + "=")) {
        val carry = bucketOfName(n, EngineColumns.KeyBucket + "=") match {
          case Some(b) => !touched.contains(b)
          case None    => true // null-key default partition: always carry
        }
        if (carry) linkFilesInto(p, staged.resolve(n))
      }
    }
    val baseServing = baseDir.resolve("_serving")
    if (Files.exists(baseServing)) {
      val stagedServing = staged.resolve("_serving")
      Files.createDirectories(stagedServing)
      val sl = Files.list(baseServing)
      try sl.iterator().asScala.foreach { f =>
        val n = f.getFileName.toString
        bucketOfName(n, "bucket=") match {
          case Some(b) if !touched.contains(b) && n.endsWith(".kv") =>
            linkOrCopy(f, stagedServing.resolve(n))
          case _ => ()
        }
      }
      finally sl.close()
    }
  }

  private def versionDirOf(name: String, v: Long): Path =
    onlineDir(name).resolve(s"v$v")

  /** True when the committed snapshot's columns match the declared schema
    * (+ ingest seq) — the incremental-commit gate: after [[addFeature]]
    * the carried-forward files would lack the new column while the
    * rewritten buckets had it, so evolution forces one full rewrite.
    * Answered from the version `_meta`'s recorded column set (one driver
    * file read — an incremental commit must not pay the O(buckets)
    * partition listing + footer read of a full-version parquet resolve
    * just to check the schema); snapshots from before the cols line fall
    * back to that parquet read once, and their next commit records it. */
  /** Verdict cache for the per-LOOKUP schema gate on the serving-KV path
    * (getRecord/batchGetRecords): a version's recorded state is immutable,
    * but the DECLARED side changes on metadata-only evolution, so the key
    * carries the declared fingerprint — a drop/re-add/rename/widen flips
    * the verdict at the next lookup with no invalidation hook. Entries are
    * evicted whenever a commit invalidates the group's serving caches and
    * on [[gcOnline]], so the map is bounded by live (version, epoch)
    * pairs, not the store's lifetime commit count. */
  private val schemaMatchCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, String), java.lang.Boolean]()

  /** Does version `v`'s layout encode exactly the CURRENT declared view?
    * True ⇒ its parquet columns, pre-rendered KV wire rows, and carried-
    * forward buckets are all authoritative (they were committed under this
    * very fingerprint, and commits materialize masking/era resolution).
    * False ⇒ some evolution happened since: serve through the row paths
    * (which mask and era-resolve at read time) and take the FULL refresh
    * on the next commit. Versions committed before the fingerprint line
    * compare by name set — which cannot see a same-name re-add or a type
    * widen — so they are additionally distrusted whenever any feature
    * carries evolution state the names cannot encode. */
  private def snapshotSchemaMatches(g: FeatureGroup, v: Long): Boolean = {
    val fp = FeatureStore.declaredFingerprint(g)
    val key = (g.name, v, fp)
    val cached = schemaMatchCache.get(key)
    if (cached != null) cached.booleanValue()
    else {
      val vd = versionDirOf(g.name, v)
      val verdict = readVersionFp(vd) match {
        case Some(storedFp) => storedFp == fp
        case None =>
          g.features.forall(f => f.since == 0L && f.renames.isEmpty) && {
            val declared = (g.featureNames :+ EngineColumns.IngestSeq).toSet
            readVersionCols(vd) match {
              case Some(cols) => cols == declared
              case None =>
                val cols = spark.read.parquet(vd.toString)
                  .columns.toSet - EngineColumns.KeyBucket
                cols == declared
            }
          }
      }
      schemaMatchCache.put(key, java.lang.Boolean.valueOf(verdict))
      verdict
    }
  }

  /** Any parquet DATA file under `dir`, honoring Spark's hidden-path
    * convention: `_`/`.`-prefixed entries are skipped unless the name
    * carries `=` (partition dirs like `_key_bucket=3` are data). Skipping
    * is load-bearing, not cosmetic: the stats and serving-KV jobs run
    * CONCURRENTLY per commit, and a plain Files.walk descending into
    * `_serving` while the KV job create/renames `bucket=*.kv.attempt-*`
    * files there threw UncheckedIOException(NoSuchFileException) —
    * transiently failing the commit (round-12 ADVICE). Never descending
    * into hidden subtrees removes the race; visitFileFailed tolerates a
    * same-dir rename as belt-and-braces. */
  private def hasParquet(dir: Path): Boolean = {
    var found = false
    Files.walkFileTree(dir, new java.nio.file.SimpleFileVisitor[Path] {
      private def hidden(p: Path): Boolean = {
        val n = p.getFileName.toString
        (n.startsWith("_") || n.startsWith(".")) && !n.contains("=")
      }
      override def preVisitDirectory(d: Path,
          attrs: java.nio.file.attribute.BasicFileAttributes): java.nio.file.FileVisitResult =
        if (d != dir && hidden(d)) java.nio.file.FileVisitResult.SKIP_SUBTREE
        else java.nio.file.FileVisitResult.CONTINUE
      override def visitFile(f: Path,
          attrs: java.nio.file.attribute.BasicFileAttributes): java.nio.file.FileVisitResult =
        if (f.toString.endsWith(".parquet") && !hidden(f)) {
          found = true; java.nio.file.FileVisitResult.TERMINATE
        } else java.nio.file.FileVisitResult.CONTINUE
      override def visitFileFailed(f: Path,
          e: java.io.IOException): java.nio.file.FileVisitResult =
        java.nio.file.FileVisitResult.CONTINUE // vanished mid-walk ≠ error here
    }): Unit
    found
  }

  /** Per-bucket key counts of a staged snapshot — reads only the partition
    * column, so parquet serves it from footer row counts, no data pages. */
  private def bucketCounts(dir: Path): Map[Long, Long] =
    if (!hasParquet(dir)) Map.empty
    else spark.read.parquet(dir.toString)
      .groupBy(col(EngineColumns.KeyBucket)).agg(count(lit(1)).as("n"))
      .collect().flatMap { r =>
        if (r.isNullAt(0)) None // null-key partition: not key-addressable
        else Some(r.get(0).asInstanceOf[Number].longValue -> r.getLong(1))
      }.toMap

  /** Per-version bucket meta `v<N>/_meta`: the bucket count the snapshot
    * was written with (the read side MUST hash with the same modulus) and
    * the per-bucket key counts incremental commits maintain the total
    * from. None for snapshots written before the meta existed — those
    * read as [[FeatureStore.OnlineKeyBuckets]]-bucketed and fall back to
    * full-rewrite maintenance. */
  private def readVersionMeta(vd: Path): Option[(Long, Map[Long, Long])] = {
    val p = vd.resolve("_meta")
    if (!Files.exists(p)) None
    else scala.util.Try {
      val lines = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .linesIterator.toSeq
      val buckets = lines.find(_.startsWith("buckets=")).get.drop(8).trim.toLong
      require(buckets >= 1, s"nonsense bucket count $buckets") // Try → None: untrusted layout
      val cs = lines.find(_.startsWith("counts=")).map(_.drop(7).trim).getOrElse("")
      val counts =
        if (cs.isEmpty) Map.empty[Long, Long]
        else cs.split(",").iterator.map { kv =>
          val Array(b, c) = kv.split(":")
          b.toLong -> c.toLong
        }.toMap
      (buckets, counts)
    }.toOption
  }

  private def writeVersionMeta(vd: Path, buckets: Long,
      counts: Map[Long, Long], g: FeatureGroup): Unit = {
    // cols = the snapshot's data columns at commit time (declared features
    // + ingest seq — names are [A-Za-z0-9_]+, comma-safe): the schema-
    // evolution gate reads THIS line instead of paying a full-version
    // parquet listing per incremental commit. fp = the FULL declared
    // fingerprint at commit time (types, since, renames) — column names
    // alone cannot see a drop+re-add of the same name or a type widen,
    // which is exactly when the pre-rendered KV layout and the incremental
    // carry-forward must NOT be trusted (round-12 review finding).
    val cols = g.featureNames :+ EngineColumns.IngestSeq
    val body = s"buckets=$buckets\n" +
      s"counts=${counts.toSeq.sorted.map { case (b, c) => s"$b:$c" }.mkString(",")}\n" +
      s"cols=${cols.sorted.mkString(",")}\n" +
      s"fp=${FeatureStore.declaredFingerprint(g)}\n"
    Files.write(vd.resolve("_meta"), body.getBytes(StandardCharsets.UTF_8)): Unit
  }

  /** The `fp=` line of a version meta — None for metas from before the
    * fingerprint (round 12) or any unreadable meta. */
  private def readVersionFp(vd: Path): Option[String] = {
    val p = vd.resolve("_meta")
    if (!Files.exists(p)) None
    else scala.util.Try {
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .linesIterator.find(_.startsWith("fp=")).map(_.drop(3).trim)
    }.toOption.flatten
  }

  /** The snapshot's recorded column set — None for metas from before the
    * cols line, or any unreadable meta (the [[readVersionMeta]] untrusted-
    * layout policy: degrade to the parquet-resolve fallback, never crash
    * the refresh). */
  private def readVersionCols(vd: Path): Option[Set[String]] = {
    val p = vd.resolve("_meta")
    if (!Files.exists(p)) None
    else scala.util.Try {
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .linesIterator.find(_.startsWith("cols="))
        .map(_.drop(5).split(",").iterator.map(_.trim).filter(_.nonEmpty).toSet)
    }.toOption.flatten
  }

  /** Bucket count of a committed version, cached per (group, version) —
    * one driver-side file read on version change, zero Spark jobs (the
    * lookup paths depend on that). Legacy snapshots WITHOUT a meta file
    * were written with the fixed default (Some); a meta file that EXISTS
    * but fails to parse means the bucket layout cannot be trusted at all
    * (None) — lookups must not hash with a guessed modulus (a wrong bucket
    * would answer a present key as authoritatively absent) and fall back
    * to an unpruned snapshot scan until the next full refresh rewrites the
    * meta. */
  private val bucketCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Option[Long])]()

  private def versionBuckets(name: String, v: Long): Option[Long] = {
    val c = bucketCountCache.get(name)
    if (c != null && c._1 == v) c._2
    else {
      val vd = versionDirOf(name, v)
      val b =
        if (!Files.exists(vd.resolve("_meta"))) Some(FeatureStore.OnlineKeyBuckets)
        else readVersionMeta(vd).map(_._1)
      bucketCountCache.put(name, (v, b))
      b
    }
  }

  private def currentVersion(name: String): Option[Long] = {
    val p = onlineDir(name).resolve("LATEST")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong) else None
  }

  private def currentSnapshotRaw(name: String): Option[DataFrame] =
    currentVersion(name).map(v => spark.read.parquet(onlineDir(name).resolve(s"v$v").toString))

  private def currentSnapshot(name: String): Option[DataFrame] =
    currentSnapshotRaw(name).map(_.drop(EngineColumns.KeyBucket))

  /** The snapshot RESTRICTED to the given key buckets, read by DIRECT
    * partition-directory paths — O(touched) file listing instead of the
    * O(buckets) full-version listing that `read.parquet(vDir).filter(...)`
    * pays before pruning (at 16k buckets and a minute-level cadence the
    * listing dominates an incremental commit). A touched bucket with no
    * directory (batch keys hashing into a previously empty bucket) simply
    * contributes nothing. */
  private def snapshotBuckets(g: FeatureGroup, version: Long,
      touched: Set[Long]): DataFrame = {
    val vd = versionDirOf(g.name, version)
    val dirs = touched.toSeq.sorted
      .map(b => vd.resolve(s"${EngineColumns.KeyBucket}=$b"))
      .filter(Files.exists(_))
    if (dirs.isEmpty) {
      val st = StructType(
        g.features.map(f => StructField(f.name, f.ftype.spark)) :+
          StructField(EngineColumns.IngestSeq, LongType))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
    } else
      spark.read.option("basePath", vd.toString)
        .parquet(dirs.map(_.toString): _*)
        .drop(EngineColumns.KeyBucket)
  }

  // ---- reads ----

  /** Full offline history (reference: Athena external table over the offline
    * S3 parquet, setup.sh:132-143). Read with the DECLARED schema, not the
    * files': after [[addFeature]] the older files lack the new column and
    * parquet fills it with nulls — the evolution read path, and also what
    * pins column order/types against file-level drift. */
  def offline(name: String): DataFrame = {
    val g = describeGroup(name)
    val raw0 =
      if (g.features.forall(_.renames.isEmpty)) {
        // fast path (never-renamed groups): one explicit declared schema,
        // no footer merging
        val st = StructType(
          g.features.map(f => StructField(f.name, f.ftype.spark)) :+
            StructField(EngineColumns.IngestSeq, LongType) :+
            StructField(EngineColumns.IngestDate, DateType))
        spark.read.schema(st).parquet(offlineDir(name))
      } else {
        // renamed groups: merge footers so alias-era columns surface, then
        // era-resolve each feature to its declared name ([[eraColumn]];
        // post-compaction layouts lose the alias columns and the adaptive
        // rule reads the materialized current column). mergeSchema's
        // footer pass is parallel and only paid until the next compaction
        // clears the aliases from the files.
        val merged = spark.read.option("mergeSchema", "true")
          .parquet(offlineDir(name))
        val avail = merged.columns.toSet
        merged.select(g.features.map(f => eraColumn(f, avail).as(f.name))
          :+ col(EngineColumns.IngestSeq).cast(LongType).as(EngineColumns.IngestSeq)
          :+ col(EngineColumns.IngestDate).cast(DateType).as(EngineColumns.IngestDate): _*)
      }
    val raw = maskSince(g, raw0)
    // tombstone filter ([[deleteRecords]]): hide a deleted key's history up
    // to its deletion sequence — later re-ingests (seq > deleted_seq)
    // legitimately resurface the key. Tombstones are tiny (explicit delete
    // calls), so this is one broadcast anti-join every offline consumer
    // (pointInTime, historicalQuery, refreshOnline rebuild, compaction)
    // inherits for free.
    tombstones(name) match {
      case Some(t) =>
        val tk = broadcast(t.groupBy(col("key"))
          .agg(max(col("deleted_seq")).as("__del_seq")))
        raw.join(tk,
          raw(g.keyCol).cast("string") === tk("key") &&
            raw(EngineColumns.IngestSeq) <= tk("__del_seq"), "left_anti")
      case None => raw
    }
  }

  // ---- deletion (SageMaker delete_record analogue; the GDPR path) ----

  private def tombstoneDir(name: String): Path = groupDir(name).resolve("tombstones")

  private def tombstones(name: String): Option[DataFrame] =
    if (Files.exists(tombstoneDir(name)))
      Some(spark.read.schema("key STRING, deleted_seq LONG")
        .parquet(tombstoneDir(name).toString))
    else None

  /** Delete records by key — the managed feature stores' `delete_record`
    * surface, set-oriented like [[ingest]]:
    *   - ONLINE: the keys leave the serving snapshot immediately (one
    *     broadcast anti-join against the current snapshot → new version +
    *     atomic pointer swap + cache invalidation — never a full-history
    *     recompute);
    *   - OFFLINE: a tombstone (key, deleted_seq) is appended; every offline
    *     reader filters history at or below the deletion sequence, so a
    *     LATER re-ingest of the key resurfaces it (the same monotone-seq
    *     rule every other write follows). The data is logically gone at
    *     once; [[compactOffline]] materializes the filter into the files —
    *     the PHYSICAL (right-to-be-forgotten) erase — and clears the
    *     tombstones it folded in. Old ONLINE versions retain the key until
    *     [[gcOnline]] collects them (time-travel views are immutable by
    *     design); a full GDPR purge is deleteRecords → compactOffline →
    *     gcOnline(keep = 1).
    *
    * @return the deletion sequence number
    */
  def deleteRecords(groupName: String, keys: Seq[Any]): Long = {
    require(keys.nonEmpty, "deleteRecords: empty key set")
    import scala.jdk.CollectionConverters._
    val keyDf = spark.createDataFrame(
      keys.map(k => Row(k.toString)).asJava,
      StructType(Seq(StructField("key", org.apache.spark.sql.types.StringType))))
    // an explicit key list is driver-sized by construction → broadcast the
    // anti-join and write the tombstones as one file
    deleteKeyFrame(groupName, keyDf, smallKeySet = true)
  }

  /** [[deleteRecords]] for a CLUSTER-SIZED key frame (first column = keys,
    * any type): the keys never visit the driver — the tombstone write and
    * every anti-join stay set-oriented, the [[expireStale]] sweep path
    * opened to callers (a CDC batch's delete set, a predicate-derived
    * erase list). Null keys are dropped (a null key is never addressable). */
  def deleteRecordsFrame(groupName: String, keys: DataFrame): Long = {
    val kc = keys.columns.headOption.getOrElse(
      throw new IllegalArgumentException("deleteRecordsFrame: no key column"))
    deleteKeyFrame(groupName,
      keys.select(col(kc).cast(org.apache.spark.sql.types.StringType).as("key"))
        .na.drop().distinct(),
      smallKeySet = false)
  }

  /** Cluster-side core of [[deleteRecords]]: `keyDf` is a one-column
    * (`key` string) frame that NEVER visits the driver — the sweep path
    * ([[expireStale]]) passes a predicate-derived frame that can be
    * arbitrarily large, so the tombstone write and the snapshot anti-join
    * stay set-oriented; only explicit driver-provided key lists
    * (`smallKeySet`) get the broadcast hint and single-file tombstones. */
  private def deleteKeyFrame(groupName: String, keyDf0: DataFrame,
      smallKeySet: Boolean): Long = {
    // seq bumped and persisted FIRST — the ingest crash-safety rule: a
    // crash mid-delete leaves at worst a skipped sequence number, never a
    // reused one; the bump is the same arbitrated RMW ingest uses, so a
    // delete racing an ingest can never claim the same seq
    val (g, seq) = withManifestLock(groupName) {
      val m = readManifest(groupName)
      writeManifest(m.group, m.nextSeq + 1, m.lastBatchId, m.lingering,
        m.widening, m.epoch + 1)
      (m.group, m.nextSeq)
    }
    val marks = keyDf0.select(col("key"),
      lit(seq).cast(LongType).as("deleted_seq"))
    // same serialized-append rule as ingest's offline append: concurrent
    // marker writes to one directory share the committer's `_temporary`
    // staging (silent marker loss = silent resurrection)
    Coordination.current.withWriterLock(groupDir(groupName), "tombstones.lock") {
      // holding the only marker-write lock, any `_temporary` present is a
      // CRASHED writer's staging debris — clear it here, because the
      // compaction sweep deliberately skips directories (it must not
      // destroy a LIVE writer's staging) and would otherwise never
      // collect it (round-12 review)
      Coordination.deleteRecursively(tombstoneDir(groupName).resolve("_temporary"))
      (if (smallKeySet) marks.coalesce(1) else marks)
        .write.mode("append").parquet(tombstoneDir(groupName).toString)
    }
    val baseVersion = currentVersion(groupName)
    currentSnapshot(groupName) match {
      case Some(snap) =>
        // read the just-written markers back rather than re-running keyDf0's
        // plan: the sweep's frame derives from this very snapshot, and the
        // parquet roundtrip both cuts that self-reference and guarantees the
        // anti-join filters EXACTLY the keys the tombstones record
        val keyDf = spark.read.parquet(tombstoneDir(groupName).toString)
          .filter(col("deleted_seq") === seq).select(col("key"))
        val hinted = if (smallKeySet) broadcast(keyDf) else keyDf
        // the incremental path carries RAW base-version rows forward, so it
        // must not run across an evolution boundary (same fingerprint gate
        // as refreshOnline): a delete landing between a drop/re-add/rename/
        // widen and the next commit would otherwise stamp the current
        // fingerprint onto a version whose files and KV rendering still
        // hold the pre-evolution view (round-12 review follow-up)
        val baseMeta =
          baseVersion.flatMap(v => readVersionMeta(versionDirOf(groupName, v)))
        baseMeta.filter(_ => snapshotSchemaMatches(g, baseVersion.get)) match {
          case Some((buckets, counts)) =>
            // INCREMENTAL delete: keys live only in their own buckets, so
            // anti-joining the snapshot RESTRICTED to the deleted keys'
            // buckets is lossless — untouched buckets carry forward by
            // link, O(deleted ∩ buckets) instead of O(store) per delete
            val touched = keyDf
              .select(pmod(crc32(col("key")), lit(buckets)).as("b"))
              .distinct().collect()
              .map(_.get(0).asInstanceOf[Number].longValue).toSet
            if (touched.isEmpty) servingCache.remove(groupName): Unit
            else {
              val snapTouched = snapshotBuckets(g, baseVersion.get, touched)
              commitIncremental(g, baseVersion.get, buckets, counts, touched,
                snapTouched.join(hinted,
                  snapTouched(g.keyCol).cast("string") === hinted("key"), "left_anti"))
            }
          case None =>
            // legacy meta OR evolution since the base version: full rewrite,
            // CONFORMED + MASKED so the new version's files, fingerprint
            // stamp, and KV rendering all present the declared view
            val conformed = maskSince(g, conformToDeclared(g, snap))
            // bucket count still derives from the base version's recorded
            // key counts (the refreshOnline None-branch rule): the
            // fingerprint gate above distrusts the version's LAYOUT, not
            // its sizing metadata. Falling to the 64-bucket floor here
            // would rewrite a large store into 64 buckets and force a
            // second O(store) rebucket at the next ingest (round-12
            // review finding)
            val buckets = baseMeta
              .map { case (_, counts) => FeatureStore.bucketCountFor(
                counts.values.sum, targetKeysPerBucket) }
              .getOrElse(FeatureStore.OnlineKeyBuckets)
            commitOnlineSnapshot(g,
              conformed.join(hinted,
                conformed(g.keyCol).cast("string") === hinted("key"), "left_anti"),
              baseVersion, buckets)
        }
      case None =>
        // no snapshot yet: online() derives from the (now filtered) offline
        // history — nothing materialized to rewrite, but drop any cache
        servingCache.remove(groupName): Unit
    }
    seq
  }

  /** Online latest-per-key view (reference: get_record point lookups,
    * real_time_inference.py:16-19). */
  def online(name: String): DataFrame = {
    val g = describeGroup(name)
    currentSnapshot(name) match {
      // conform + mask: a snapshot committed before a dropFeature /
      // addFeature still carries the OLD schema until the next commit
      // re-renders it — reads must show the DECLARED view immediately
      case Some(snap) => maskSince(g, conformToDeclared(g, snap))
      case None => // offline() is already declared-schema + masked
        LatestPerKey.viaMaxBy(offline(name), Seq(g.keyCol), g.eventTimeCol,
            Seq(EngineColumns.IngestSeq))
          .drop(EngineColumns.IngestDate)
    }
  }

  /** TIME TRAVEL over serving states: every [[refreshOnline]] writes a new
    * immutable `online/v<N>/` and flips the LATEST pointer, so each previous
    * snapshot remains readable exactly as it was served — audits ("what did
    * the model see at version N?"), A/B rollbacks, and training-serving skew
    * forensics. Superseded versions persist until [[gcOnline]]. */
  def onlineVersions(name: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(onlineDir(name))) return Seq.empty
    val ls = Files.list(onlineDir(name))
    try ls.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.drop(1).nonEmpty && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong).toSeq.sorted
    finally ls.close()
  }

  /** The online snapshot EXACTLY as served at `version` (see [[onlineVersions]]). */
  def onlineAt(name: String, version: Long): DataFrame = {
    val dir = onlineDir(name).resolve(s"v$version")
    require(Files.exists(dir), s"no online snapshot v$version for $name")
    spark.read.parquet(dir.toString).drop(EngineColumns.KeyBucket)
  }

  /** CHANGE DATA FEED between two served snapshot versions (see
    * [[onlineAt]]): which entity keys were added, removed, or changed — the
    * Delta CDF / Iceberg changelog semantic, derived from the immutable
    * version directories instead of a transaction log. One key-equi shuffle
    * join of two snapshots (each one row per key); change detection is
    * null-safe column-wise comparison over the DECLARED features (schema
    * evolution between the versions reads as null vs value = changed).
    *
    * @return (keyCol, change_type ∈ added|removed|changed, <features of the
    *         `toV` side, null for removed>)
    */
  def onlineDiff(name: String, fromV: Long, toV: Long): DataFrame = {
    val g = describeGroup(name)
    def conformed(df: DataFrame): DataFrame = df.select(g.features.map { f =>
      (if (df.columns.contains(f.name)) col(f.name).cast(f.ftype.spark)
       else lit(null).cast(f.ftype.spark)).as(f.name)
    }: _*)
    val a = conformed(onlineAt(name, fromV)).alias("a")
    val b = conformed(onlineAt(name, toV)).alias("b")
    val k = g.keyCol
    val sameRow = g.featureNames
      .map(f => col(s"a.$f") <=> col(s"b.$f"))
      .reduce(_ && _)
    a.join(b, col(s"a.$k") === col(s"b.$k"), "full_outer")
      .withColumn("change_type",
        when(col(s"a.$k").isNull, lit("added"))
          .when(col(s"b.$k").isNull, lit("removed"))
          .when(!sameRow, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(coalesce(col(s"b.$k"), col(s"a.$k")).as(k) +:
        col("change_type") +:
        g.featureNames.filterNot(_ == k).map(f => col(s"b.$f").as(f)): _*)
  }

  /** Drop superseded online snapshots, keeping the newest `keep` versions
    * (the retention knob for [[onlineAt]] time travel). Never drops LATEST. */
  def gcOnline(name: String, keep: Int = 2): Unit = {
    val vs = onlineVersions(name)
    val cur = currentVersion(name).getOrElse(return)
    vs.filter(v => v != cur && v <= cur - keep).foreach { v =>
      val walk = Files.walk(onlineDir(name).resolve(s"v$v"))
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
      finally walk.close()
      // a collected version's schema verdicts can never be probed again —
      // evict them so the cache bound really is live (version, fp) pairs
      // (the doc on [[schemaMatchCache]] promises this eviction)
      schemaMatchCache.keySet.removeIf(k => k._1 == name && k._2 == v): Unit
    }
  }

  /** Serving-path cache (SURVEY.md §3.3): the reference's `get_record` is a
    * millisecond KV hit (real_time_inference.py:16-19); launching a Spark job
    * per point lookup is the wrong cost model for that path. The online
    * snapshot is one row per entity key — the working set the reference holds
    * in DynamoDB — so the single-node analogue is a driver map, built ONCE
    * per snapshot version and invalidated when [[refreshOnline]] flips the
    * LATEST pointer. At cluster scale this becomes an external KV store fed
    * by the same snapshot; the version-keyed invalidation carries over.
    * Keys are string-normalized so a caller's Int key hits a stored Long. */
  private val servingCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Option[Map[String, Row]])]()

  /** None when no snapshot exists OR the snapshot exceeds
    * `maxServingCacheRows` (the over-cap verdict is cached per version too,
    * so it is decided by ONE bounded job, not re-probed per lookup). */
  private def servingSnapshot(name: String): Option[Map[String, Row]] =
    currentVersion(name).flatMap { v =>
      val cached = servingCache.get(name)
      if (cached != null && cached._1 == v) cached._2
      else {
        val g = describeGroup(name)
        // limit(cap+1): never collects more than cap+1 rows even when the
        // snapshot holds billions — the cap probe is itself bounded
        val rows = currentSnapshot(name).get.limit(maxServingCacheRows + 1).collect()
        val entry =
          if (rows.length > maxServingCacheRows) None
          else Some(rows.map(r => String.valueOf(r.get(r.fieldIndex(g.keyCol))) -> r).toMap)
        servingCache.put(name, (v, entry))
        entry
      }
    }

  /** Point lookup, stringly-typed API shim matching the reference's wire
    * format (`ValueAsString`, update_feature_store.py:65-73): returns
    * feature-name → string-value, None when the key is absent
    * (real_time_inference.py:20-22). Event time formatted ISO-8601 Zulu
    * (update_feature_store.py:36). Serves from the driver-side snapshot
    * cache — NO Spark job per lookup (asserted by FeatureStoreSpec); the
    * over-cap and no-snapshot paths no longer launch a job either: every
    * snapshot commit also persists a per-bucket KV file
    * (`v<N>/_serving/bucket=<crc32(key) mod buckets>.kv`, sorted, wire-
    * format values, sparse-indexed) that the driver reads DIRECTLY — one
    * open + binary search + ≤[[FeatureStore.KvIndexStride]]-entry block
    * scan, no Spark job and no full-bucket scan regardless of bucket size
    * (servingBench's `bucket_pruned` row). The job-per-lookup path remains
    * only for snapshots without a readable KV layout (legacy, or a
    * corrupted file — the reader DEGRADES to the job path rather than
    * failing the lookup) and for stores with no snapshot at all
    * (latest-per-key derived from offline history). */
  def getRecord(groupName: String, key: Any): Option[Map[String, String]] = {
    val g = describeGroup(groupName)
    val skey = String.valueOf(key)
    servingSnapshot(groupName) match {
      case Some(m) => m.get(skey).map(renderWireRow(g, _))
      case None =>
        currentVersion(groupName) match {
          case Some(v) =>
            versionBuckets(groupName, v) match {
              case Some(buckets) =>
                val bucket = FeatureStore.keyBucketOf(skey, buckets)
                // the KV layout's wire rows were rendered with the schema
                // AT COMMIT TIME — after a dropFeature/addFeature they are
                // stale until the next commit re-renders; serve evolved
                // groups through the row path (renderWireRow masks/projects
                // the declared view) until then
                val kvTrusted = snapshotSchemaMatches(g, v)
                (if (kvTrusted) servingKvScan(g, v, bucket, Set(skey)).map(_(skey))
                 else None) match {
                  case Some(res) => res // authoritative: KV layout rides the commit
                  case None => // no/stale/unreadable KV layout: bucket-pruned job path
                    // read VERSION v's dir, not a re-resolved LATEST: the
                    // bucket was hashed with v's modulus, and a rebucketing
                    // commit landing between the version read and this scan
                    // would make the pruned filter read the wrong bucket of
                    // the new layout — a present key answered as absent
                    spark.read.parquet(versionDirOf(groupName, v).toString)
                      .filter(col(EngineColumns.KeyBucket) === lit(bucket))
                      .filter(col(g.keyCol).cast("string") === lit(skey))
                      .drop(EngineColumns.KeyBucket)
                      .collect().headOption.map(renderWireRow(g, _))
                }
              case None => // corrupt bucket meta: no pruning can be trusted
                currentSnapshot(groupName).get
                  .filter(col(g.keyCol).cast("string") === lit(skey))
                  .collect().headOption.map(renderWireRow(g, _))
            }
          case None => // no snapshot yet: derive latest-per-key from history
            online(groupName).filter(col(g.keyCol).cast("string") === lit(skey))
              .collect().headOption.map(renderWireRow(g, _))
        }
    }
  }

  /** Render a snapshot row to the stringly wire format (feature-name →
    * string; ISO-8601 Zulu timestamps). A snapshot written before
    * addFeature has no field for the new column yet — serve null (the
    * caller's default applies, P4). */
  private[core] def renderWireRow(g: FeatureGroup, r: Row): Map[String, String] = {
    // HOT PATH (cache-hit getRecord budget is tens of µs): field lookups
    // go through StructType.fieldIndex — the schema's cached name→index
    // map — never a per-call fieldNames.toSet allocation or array scan.
    // The exception path only fires for fields absent from the row, i.e.
    // the rare evolution window between a metadata commit and the next
    // snapshot rebuild.
    val schema = r.schema
    def idxOf(n: String): Option[Int] =
      if (schema == null) None
      else try Some(schema.fieldIndex(n))
      catch { case _: IllegalArgumentException => None }
    // the row's ingest seq, for the re-add mask (FeatureDef.since); a row
    // without the column (shouldn't happen on snapshot rows) masks nothing
    val rowSeq: Long = idxOf(EngineColumns.IngestSeq)
      .filterNot(r.isNullAt).map(r.getLong).getOrElse(Long.MaxValue)
    g.features.map { f =>
      // era resolution, driver-side mirror of [[eraColumn]]: the name that
      // held this feature when the row was written, or — when a rewrite
      // materialized the era — the first NEWER name in the chain this row
      // layout carries (a rewrite renders to the name current at rewrite
      // time, possibly an intermediate alias)
      val srcIdx: Option[Int] =
        if (f.renames.isEmpty || rowSeq >= f.renames.head._2) idxOf(f.name)
        else {
          val i = f.renames.indices.find(j =>
            rowSeq >= f.renames.lift(j + 1).map(_._2).getOrElse(0L))
            .getOrElse(f.renames.size - 1)
          ((i to 0 by -1).map(j => f.renames(j)._1) :+ f.name)
            .iterator.map(idxOf).collectFirst { case Some(ix) => ix }
        }
      val raw = if (rowSeq >= f.since) srcIdx.map(r.get).orNull else null
      // a snapshot committed before a widenFeature still stores the old
      // numeric type until the rebuild — coerce so the wire rendering is
      // the declared type's from day zero ("10.0", not "10")
      val coerced = (raw, f.ftype) match {
        case (l: java.lang.Long, FType.Fractional) =>
          java.lang.Double.valueOf(l.doubleValue())
        case (i: java.lang.Integer, FType.Fractional) =>
          java.lang.Double.valueOf(i.doubleValue())
        case _ => raw
      }
      f.name -> FeatureStore.renderWireValue(coerced)
    }.toMap
  }

  /** Write the serving-tier KV layout under the (staged) snapshot dir: one
    * `_serving/bucket=<b>.kv` per NON-EMPTY key bucket, entries SORTED by
    * key in UTF-8 binary order, values already rendered to the wire format,
    * plus a SPARSE INDEX footer (every [[FeatureStore.KvIndexStride]]-th
    * entry's key, byte offset, and block length) — so an over-cap point
    * lookup is one driver-side open + binary search + bounded block scan,
    * never a Spark job and never a full-bucket scan regardless of bucket
    * size. The layout rides the same staged commit as the parquet (promoted
    * together, or not at all), and the underscore dir is invisible to
    * parquet readers. TASK-COMMIT SAFE: each bucket file is written under
    * an attempt-unique temp name and atomically RENAMED on bucket close —
    * a speculative or zombie task attempt can never interleave bytes into
    * a live file (racing attempts rename complete, identical files; the
    * rename is the commit). The writer itself is a pure STREAMING pass —
    * one row in memory at a time (re-clustered so one task owns each
    * bucket, sorted (bucket, key) by Spark's spill-capable sort); the only
    * per-bucket state is the sparse index, entries/stride tuples. */
  private def writeServingKv(g: FeatureGroup, versionDir: Path,
      buckets: Long, numTasks: Option[Int] = None): Unit = {
    val servingDir = versionDir.resolve("_serving")
    Files.createDirectories(servingDir)
    if (!hasParquet(versionDir)) return // empty snapshot: layout present, all buckets empty
    val names = g.featureNames
    val keyCol = g.keyCol
    val servingPath = servingDir.toString
    spark.read.parquet(versionDir.toString)
      .withColumn("__skey", col(keyCol).cast("string"))
      // the writer opens a new file per bucket TRANSITION, so task width is
      // a knob, not a correctness constraint: the incremental commit passes
      // its touched-bucket count (a 64-key batch must not pay a
      // 16k-empty-task pass at 16k buckets); `buckets` itself is key-count-
      // derived, so the full render is data-proportional already (r13-opt
      // adjudication — see commitOnlineSnapshot)
      .repartition(numTasks.getOrElse(buckets.toInt), col(EngineColumns.KeyBucket))
      .sortWithinPartitions(col(EngineColumns.KeyBucket), col("__skey"))
      .foreachPartition { (it: Iterator[Row]) =>
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId().toString)
          .getOrElse(java.util.UUID.randomUUID().toString.take(8))
        new FeatureStore.KvBucketWriter(servingPath, attempt, names).writeAll(it)
      }
  }

  /** One open of a bucket file answering a SET of keys (the batch face:
    * many keys of the same bucket cost one open). Returns None when the KV
    * layout does not exist for this version OR the file is unreadable
    * (short, bad magic, torn index — e.g. hardware corruption): the caller
    * DEGRADES to the bucket-pruned Spark job path instead of failing the
    * lookup. Otherwise a verdict for EVERY target key: each target costs
    * one binary search over the sparse index plus one ≤stride-entry block
    * scan. Fields added to the group after the snapshot was written serve
    * as null. */
  private def servingKvScan(g: FeatureGroup, version: Long, bucket: Long,
      targets: Set[String]): Option[Map[String, Option[Map[String, String]]]] = {
    val servingDir = versionDirOf(g.name, version).resolve("_serving")
    if (!Files.exists(servingDir)) return None
    val miss: Map[String, Option[Map[String, String]]] =
      targets.map(_ -> (None: Option[Map[String, String]])).toMap
    val f = servingDir.resolve(s"bucket=$bucket.kv")
    if (!Files.exists(f)) return Some(miss) // layout present, bucket empty
    try {
      val ch = Files.newByteChannel(f, java.nio.file.StandardOpenOption.READ)
      try {
        val size = ch.size()
        require(size >= 28, s"short serving KV file $f")
        // fixed tail: indexStart(8) + nBlocks(4) + magic(4)
        val tail = FeatureStore.readFullyAt(ch, size - 16, 16)
        val indexStart = tail.getLong
        val nBlocks = tail.getInt
        require(tail.getInt == FeatureStore.KvIndexMagic,
          s"bad serving KV index magic in $f")
        require(indexStart >= 0 && indexStart <= size - 16 && nBlocks >= 0,
          s"torn serving KV index in $f")
        def streamAt(pos: Long): java.io.DataInputStream = {
          ch.position(pos)
          new java.io.DataInputStream(new java.io.BufferedInputStream(
            java.nio.channels.Channels.newInputStream(ch)))
        }
        val hdr = streamAt(0L)
        require(hdr.readInt() == FeatureStore.KvMagic, s"bad serving KV magic in $f")
        val nFields = hdr.readInt()
        val fileNames = Array.fill(nFields)(FeatureStore.readKvStr(hdr))
        // sparse index: (first key, offset, entry count) per block
        val idx = streamAt(indexStart)
        val iKeys = new Array[String](nBlocks)
        val iOffs = new Array[Long](nBlocks)
        val iCnts = new Array[Int](nBlocks)
        var bi = 0
        while (bi < nBlocks) {
          iKeys(bi) = FeatureStore.readKvStr(idx)
          iOffs(bi) = idx.readLong()
          iCnts(bi) = idx.readInt()
          bi += 1
        }
        // rightmost block whose first key <= target (UTF-8 binary order —
        // the writer's sort order); -1 = target below the smallest key
        def blockFor(t: String): Int = {
          var lo = 0; var hi = nBlocks - 1; var res = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (FeatureStore.Utf8Ordering.compare(iKeys(mid), t) <= 0) { res = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          res
        }
        var found = miss
        targets.toSeq.flatMap(t => blockFor(t) match {
          case -1 => None; case b => Some(b -> t)
        }).groupBy(_._1).toSeq.sortBy(_._1).foreach { case (b, ts) =>
          val want = ts.map(_._2).toSet
          val maxT = want.max(FeatureStore.Utf8Ordering)
          val in = streamAt(iOffs(b))
          var i = 0
          var done = false
          while (i < iCnts(b) && !done) {
            val k = FeatureStore.readKvStr(in)
            if (want.contains(k)) {
              val vals = fileNames.map { n =>
                n -> (if (in.readBoolean()) FeatureStore.readKvStr(in) else null)
              }.toMap
              found = found.updated(k, Some(
                g.features.map(fd => fd.name -> vals.getOrElse(fd.name, null)).toMap))
            } else if (FeatureStore.Utf8Ordering.compare(k, maxT) > 0) {
              done = true // sorted: no target of this block can appear later
            } else {
              var j = 0
              while (j < nFields) { // skip this entry's values
                if (in.readBoolean()) FeatureStore.readKvStr(in): Unit
                j += 1
              }
            }
            i += 1
          }
        }
        Some(found)
      } finally ch.close()
    } catch {
      case scala.util.control.NonFatal(_) =>
        None // corrupt/torn file: degrade to the job path, never fail the lookup
    }
  }

  /** Multi-key point lookup — the managed feature stores' batch_get_record
    * face: one answer per requested key (stringly wire format, None for
    * absent keys). Cost model by path: cache hits are map lookups; the KV
    * path opens ONE bucket file per distinct bucket the keys hash to (not
    * one per key); legacy snapshots fall back to a SINGLE bucket-pruned
    * Spark job over all requested keys (never a job per key). Duplicate
    * keys collapse; answers are keyed by the key's string form. */
  def batchGetRecords(groupName: String,
      keys: Seq[Any]): Map[String, Option[Map[String, String]]] = {
    val g = describeGroup(groupName)
    val skeys = keys.map(String.valueOf(_)).distinct
    if (skeys.isEmpty) return Map.empty
    servingSnapshot(groupName) match {
      case Some(m) =>
        skeys.map(k => k -> m.get(k).map(renderWireRow(g, _))).toMap
      case None =>
        def jobPath(df: DataFrame): Map[String, Option[Map[String, String]]] = {
          val hit = df.filter(col(g.keyCol).cast("string").isInCollection(skeys))
            .collect()
            .map(r => String.valueOf(r.get(r.fieldIndex(g.keyCol))) -> r).toMap
          skeys.map(k => k -> hit.get(k).map(renderWireRow(g, _))).toMap
        }
        currentVersion(groupName) match {
          case Some(v) =>
            versionBuckets(groupName, v) match {
              case Some(buckets) =>
                val byBucket = skeys.groupBy(FeatureStore.keyBucketOf(_, buckets))
                // post-evolution the KV wire rows are stale renders — row
                // path until the next commit (see getRecord)
                val scanned =
                  if (snapshotSchemaMatches(g, v))
                    byBucket.map { case (b, ks) => servingKvScan(g, v, b, ks.toSet) }
                  else Iterable(Option.empty[Map[String, Option[Map[String, String]]]])
                if (scanned.forall(_.isDefined))
                  scanned.flatMap(_.get).toMap
                else // no/stale/unreadable KV layout: one pruned job — against
                  // VERSION v's dir (its modulus hashed the buckets; see
                  // getRecord's fallback for the rebucketing race)
                  jobPath(spark.read.parquet(versionDirOf(groupName, v).toString)
                    .filter(col(EngineColumns.KeyBucket)
                      .isInCollection(byBucket.keys.toSeq))
                    .drop(EngineColumns.KeyBucket))
              case None => // corrupt bucket meta: no pruning can be trusted
                jobPath(currentSnapshot(groupName).get)
            }
          case None => jobPath(online(groupName))
        }
    }
  }

  /** [[getRecord]] with a STALENESS GATE — the managed feature stores'
    * record-TTL semantic (serve-side form): a record whose event time is
    * older than `maxStaleness` behind the serving clock is answered with
    * None, exactly like an absent key, so a model never silently consumes a
    * feature that stopped updating (the staleness bug class TTLs exist
    * for). The gate reads the row the normal lookup already fetched — zero
    * extra jobs, cache path intact; a record with a NULL event time never
    * passes (unknown age = stale). The clock is the store's injectable
    * [[clock]], so specs pin it. */
  def getRecordFresh(groupName: String, key: Any,
      maxStaleness: java.time.Duration): Option[Map[String, String]] = {
    val g = describeGroup(groupName)
    getRecord(groupName, key).filter { rec =>
      Option(rec(g.eventTimeCol)).exists { iso =>
        val et = java.time.Instant.from(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'").withZone(java.time.ZoneOffset.UTC)
          .parse(iso))
        !et.plus(maxStaleness).isBefore(clock())
      }
    }
  }

  /** Batch face of [[getRecordFresh]]'s staleness gate: SWEEP every record
    * whose event time lags the store clock by more than `maxStaleness` out
    * of the serving view (the managed stores' record-TTL maintenance job —
    * the serve-side gate protects each lookup, the sweep reclaims the
    * snapshot). Composes [[deleteRecords]], so the sweep inherits its whole
    * contract: seq-aware tombstones (a later re-ingest of the key
    * resurfaces it — TTL expiry must never block a genuine update),
    * hidden history until [[compactOffline]], cache invalidation. A NULL
    * event time is swept (unknown age = stale, the [[getRecordFresh]]
    * rule). The stale key set stays a DataFrame end to end — the store
    * explicitly serves snapshots LARGER than the serving cache cap (bucket
    * -pruned reads), so a mostly-stale over-cap store must never funnel
    * its key set through the driver. Returns the swept keys' count. */
  def expireStale(groupName: String, maxStaleness: java.time.Duration): Long = {
    val g = describeGroup(groupName)
    val cutoff = java.sql.Timestamp.from(clock().minus(maxStaleness))
    val stale = online(groupName)
      .filter(col(g.eventTimeCol).isNull || col(g.eventTimeCol) < lit(cutoff))
      .select(col(g.keyCol).cast("string").as("key"))
    val n = stale.count()
    if (n == 0L) 0L
    else { deleteKeyFrame(groupName, stale, smallKeySet = false); n }
  }

  /** Row-level stringly-typed upsert mirroring the reference's wire API
    * (`put_record` with `ValueAsString` fields, update_feature_store.py:39-50):
    * values are cast from strings to the declared types (timestamps accept
    * ISO-8601 Zulu or `yyyy-MM-dd HH:mm:ss`). Set-oriented [[ingest]] is the
    * right call for anything bigger than one record — this shim exists for
    * API parity and pays a full ingest per row. */
  def putRecord(groupName: String, record: Map[String, String]): Long = {
    val g = describeGroup(groupName)
    val missing = g.featureNames.filterNot(record.contains)
    require(missing.isEmpty, s"putRecord missing declared features: $missing")
    import scala.jdk.CollectionConverters._
    val strSchema = org.apache.spark.sql.types.StructType(
      g.features.map(f => org.apache.spark.sql.types.StructField(f.name, org.apache.spark.sql.types.StringType)))
    val row = Row.fromSeq(g.features.map(f => record(f.name)))
    val df = spark.createDataFrame(Seq(row).asJava, strSchema)
      .select(g.features.map { f =>
        val c = col(f.name)
        (f.ftype match {
          case FType.FTimestamp => // try_*: ANSI to_timestamp throws on pattern mismatch
            coalesce(try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss'Z'")), try_to_timestamp(c))
          case other => c.cast(other.spark)
        }).as(f.name)
      }: _*)
    ingest(groupName, df)
  }

  /** Compact the offline store: rewrite each `_ingest_date` partition's
    * accumulated small files (one set per ingest batch — a file per
    * micro-batch per date under streaming ingest) into one file per date.
    * Scan parallelism and footer overhead degrade until compaction (README
    * "Running at cluster scale"; at 100 TB run this per-partition on recent
    * dates only).
    *
    * CRASH-SAFE: the rewrite lands in `offline/v<N+1>/`; the ONLY commit
    * point is the atomic move of the CURRENT pointer file (the same pattern
    * that versions the online snapshot). A crash before the flip leaves the
    * old version intact and a partial v<N+1> that the retry overwrites; a
    * crash after the flip leaves superseded version dirs that the next
    * compaction garbage-collects. Single-writer assumption still applies
    * (SURVEY.md §7 risk 6 — Delta/Iceberg would arbitrate writers; jars not
    * available in this environment).
    *
    * @return number of parquet data files after compaction
    */
  def compactOffline(groupName: String): Long = {
    require(groupExists(groupName), s"no such feature group: $groupName")
    // the whole plan→rewrite→CAS span holds the group's APPEND lock: an
    // in-flight ingest's append either lands before the rewrite's read
    // (its rows materialize into v<N+1>) or waits and then resolves the
    // NEW version dir — without this, an append admitted before the
    // compaction could land its files in a version dir the post-flip GC
    // deletes (silent row loss) or, across a widen, put old-typed files
    // inside the new-typed layout (round-12 review finding). The hold
    // spans a Spark job by design: compaction is maintenance, appends
    // queue behind it exactly as they do behind each other.
    val (cur, finalNextDir, lingeringAtPlan, tombstoneFilesAtPlan) =
        Coordination.current.withWriterLock(offlineRoot(groupName), "append.lock") {
      // capture (value, presence) in ONE read: the commit below is a
      // compare-and-swap against exactly this observation
      val curPointerAtPlan: Option[Long] =
        Coordination.readPointerFile(offlineRoot(groupName).resolve("CURRENT"))
          .map(_.toLong)
      val cur = curPointerAtPlan.getOrElse(1L)
      // lingering-column registry snapshot: the rewrite below reads the
      // DECLARED schema, so bytes of entries recorded at plan time are
      // physically absent from v<N+1> — those entries clear after the
      // flip. Any entry recorded AFTER this capture survives the fold
      // (later epoch — even an identical-looking re-record), which is
      // deliberately CONSERVATIVE: a drop landing between this read and
      // the rewrite's own manifest read keeps its entry although the
      // rewrite already erased its bytes; the stale guard just refuses a
      // conflicting claim until the next compaction clears it.
      val lingeringAtPlan = readManifest(groupName).lingering
      val finalNextDir = offlineRoot(groupName).resolve(s"v${cur + 1}")
      val nextDir = OptimisticPointer.stagingFor(finalNextDir)
      // tombstone FILES are snapshotted BEFORE the rewrite and only that list
      // is deleted after the flip: a deleteRecords landing mid-compaction
      // writes a new marker file that survives the sweep (its rows re-apply
      // against v<N+1> until the next compaction), instead of being destroyed
      // without ever materializing — which would silently resurrect the key.
      // FILES only: a deleteRecords marker write may be in flight (it
      // serializes against other marker writes, not against compaction),
      // and capturing its committer's `_temporary` DIRECTORY here would
      // make the post-flip sweep throw on a non-empty dir — failing the
      // compaction after CURRENT already moved — or destroy the live
      // job's staging (round-12 review)
      val tombstoneFilesAtPlan: List[Path] =
        if (Files.exists(tombstoneDir(groupName))) {
          import scala.jdk.CollectionConverters._
          val ls = Files.list(tombstoneDir(groupName))
          try ls.iterator().asScala.filterNot(Files.isDirectory(_)).toList
          finally ls.close()
        } else Nil
      val foldInput = offline(groupName) // declared-schema read: compaction also materializes post-evolution columns (incl. the widen cast via eraColumn)
      foldInput
        // estimate-derived width (r13-opt, Dedup.writeWidth): the clustered
        // rewrite keeps one exchange but a small store no longer launches
        // one writer commit cycle per core
        .repartition(graft.dedup.Dedup.writeWidth(foldInput),
          col(EngineColumns.IngestDate))
        .write.mode("overwrite") // a crashed prior attempt's partial dir is overwritten
        .partitionBy(EngineColumns.IngestDate).parquet(nextDir.toString)
      // commit: one compare-and-swap pointer move — a concurrent compaction
      // that already advanced CURRENT makes this one fail loudly instead of
      // silently superseding a version whose rows it never read
      try OptimisticPointer.casSwap(offlineRoot(groupName), "CURRENT",
        expected = curPointerAtPlan.map(_.toString), next = (cur + 1).toString,
        stage = Some(nextDir -> finalNextDir))
      finally if (Files.exists(nextDir)) { // loser cleans its own staging
        val walk = Files.walk(nextDir)
        try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
        finally walk.close()
      }
      (cur, finalNextDir, lingeringAtPlan, tombstoneFilesAtPlan)
    }
    // GC superseded versions (best-effort: a crash here just leaves orphans
    // for the next compaction to collect)
    import scala.jdk.CollectionConverters._
    val versions = Files.list(offlineRoot(groupName))
    val superseded =
      try versions.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("v") && n.drop(1).forall(_.isDigit) && n.drop(1).toLong <= cur
      }.toList
      finally versions.close() // Files.list holds the directory handle open
    superseded.foreach { v =>
      val walk = Files.walk(v)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
      finally walk.close()
    }
    // the rewrite above went through offline(), which filters tombstoned
    // history — the deleted rows are now PHYSICALLY absent from v<N+1>
    // (the GDPR erase), so the folded-in tombstones are cleared: only the
    // files snapshotted at plan time (any marker appended since survives
    // and re-applies until the next compaction). A crash between the flip
    // and this delete just leaves already-materialized markers to re-clear.
    tombstoneFilesAtPlan.foreach(p => Files.deleteIfExists(p): Unit)
    // same folding rule for the lingering-column registry: the declared-
    // schema rewrite erased the plan-time orphans' bytes, so their claim-
    // guard entries clear. Identity is the FULL triple incl. the recording
    // EPOCH: an entry re-recorded since plan time (even one value-identical
    // in name and type) carries a later epoch and survives — see
    // lingeringAtPlan's capture comment.
    if (lingeringAtPlan.nonEmpty) withManifestLock(groupName) {
      val mEnd = readManifest(groupName)
      val remaining = mEnd.lingering.filterNot(lingeringAtPlan.contains)
      if (remaining.size != mEnd.lingering.size)
        writeManifest(mEnd.group, mEnd.nextSeq, mEnd.lastBatchId,
          remaining, mEnd.widening, mEnd.epoch + 1)
    }
    if (Files.exists(tombstoneDir(groupName))) {
      val ls = Files.list(tombstoneDir(groupName))
      val empty = try !ls.iterator().hasNext finally ls.close()
      if (empty) Files.delete(tombstoneDir(groupName))
    }
    val files = Files.walk(finalNextDir)
    try files.filter(p => p.toString.endsWith(".parquet")).count()
    finally files.close()
  }

  /** Point-in-time training-set construction — the full form of the
    * feature-store "as-of join" the reference degenerates to a time-range
    * filter (SURVEY.md §2.6 J2, historical_features.py:28-32): for each
    * entity row (key, asOfTsCol) attach the latest feature record with
    * event_time <= asOfTs (ties → max ingest seq), optionally bounded by
    * `tolerance` staleness. One shuffle on the key (union-then-window), no
    * row explosion — the shape that survives 100 TB of history.
    *
    * @param entityDf  rows to enrich; must contain the group's key column and `asOfTsCol`
    * @param featureCols feature columns to attach (default: all non-key, non-time)
    * @param asOfSeq pin the history at an ingest seq ([[offlineAsOf]]) —
    *                the reproducible-training-frame form: the same pin
    *                rebuilds the same frame after any number of later ingests
    */
  def pointInTime(
      groupName: String,
      entityDf: DataFrame,
      asOfTsCol: String,
      featureCols: Seq[String] = Nil,
      tolerance: Option[String] = None,
      asOfSeq: Option[Long] = None): DataFrame = {
    val g = describeGroup(groupName)
    val attach = if (featureCols.nonEmpty) featureCols
      else g.featureNames.filterNot(n => n == g.keyCol || n == g.eventTimeCol)
    graft.operators.AsOfJoin.backward(
      entityDf, asOfSeq.fold(offline(groupName))(offlineAsOf(groupName, _)),
      leftKey = g.keyCol, rightKey = g.keyCol,
      leftTime = asOfTsCol, rightTime = g.eventTimeCol,
      rightTiebreak = EngineColumns.IngestSeq,
      rightValueCols = attach,
      tolerance = tolerance)
  }

  /** Multi-group point-in-time enrichment — the canonical training-set
    * construction: attach the as-of-latest features from SEVERAL groups to
    * one entity frame in a single call. Each group contributes one
    * union-then-window pass (one shuffle per group on its key); columns are
    * prefixed `<group>_asof_…` so same-named features never collide. The
    * reference's single-group demo generalizes here the way real feature
    * stores do (a training set joins user, item, context groups at once).
    *
    * @param groups (groupName, featureCols) — Nil attaches all non-key,
    *               non-time features of that group
    */
  def pointInTimeMulti(
      groups: Seq[(String, Seq[String])],
      entityDf: DataFrame,
      asOfTsCol: String,
      tolerance: Option[String] = None,
      asOfSeq: Option[Long] = None): DataFrame =
    groups.foldLeft(entityDf) { case (acc, (groupName, featureCols)) =>
      val g = describeGroup(groupName)
      val attach = if (featureCols.nonEmpty) featureCols
        else g.featureNames.filterNot(n => n == g.keyCol || n == g.eventTimeCol)
      graft.operators.AsOfJoin.backward(
        acc, asOfSeq.fold(offline(groupName))(offlineAsOf(groupName, _)),
        leftKey = g.keyCol, rightKey = g.keyCol,
        leftTime = asOfTsCol, rightTime = g.eventTimeCol,
        rightTiebreak = EngineColumns.IngestSeq,
        rightValueCols = attach,
        asofPrefix = s"${groupName}_asof_",
        tolerance = tolerance)
    }

  /** Historical time-range retrieval — the reference's Athena query
    * (historical_features.py:28-32): explicit projection + inclusive BETWEEN
    * on event time. Projection and predicate reach the parquet scan via
    * Catalyst (column pruning + predicate pushdown; the reference wrote both
    * by hand into SQL text). */
  def historicalQuery(groupName: String, columns: Seq[String], start: String, end: String): DataFrame =
    historicalRange(offline(groupName), describeGroup(groupName), columns, start, end)

  /** One copy of the range pipeline for the pinned ([[historicalQueryAsOf]])
    * and unpinned ([[historicalQuery]]) reads — they must never diverge on
    * the predicate details. */
  private def historicalRange(base: DataFrame, g: FeatureGroup,
      columns: Seq[String], start: String, end: String): DataFrame =
    base
      // derived PARTITION filter: _ingest_date = to_date(event_time), so the
      // event-time range implies a date range — this is what actually prunes
      // offline files (the row filter below only prunes row groups within
      // the files that survive). Shows up as PartitionFilters in the scan.
      .filter(col(EngineColumns.IngestDate).between(
        to_date(lit(start).cast(TimestampType)), to_date(lit(end).cast(TimestampType))))
      .filter(col(g.eventTimeCol).between(
        lit(start).cast(TimestampType), lit(end).cast(TimestampType)))
      .select(columns.map(col): _*)

  // ---- manifest (hand-rolled flat JSON; no extra deps) ----

  /** @param epoch total manifest writes for this group — monotone because
    *   every writer passes `m.epoch + 1` from the Manifest it read under
    *   the manifest lock. Lingering entries stamp the epoch of the write
    *   that recorded them — their IDENTITY for compaction's fold, strict
    *   even when two records of one name happen at the same ingest seq. */
  private final case class Manifest(group: FeatureGroup, nextSeq: Long, lastBatchId: Long,
      lingering: Seq[(String, FType, Long)] = Nil, widening: Option[String] = None,
      epoch: Long = 0L)

  // Flat JSON without an escape-aware parser — sound because FeatureGroup
  // restricts every name to [A-Za-z0-9_]+ (no quotes/backslashes possible).
  /** @param lingering column names whose bytes may remain in offline files
    *   without a declared owner — recorded by [[dropFeature]] (the feature
    *   + its aliases) and [[renameFeature]] (the vacated name) on groups
    *   WITH history, each with the type those bytes carry and the manifest
    *   EPOCH that recorded the entry. [[requireNoLingeringConflict]]
    *   refuses conflicting-type claims against it; an entry clears on a
    *   same-type re-claim or when [[compactOffline]] erases the bytes
    *   (matched by the full triple — the epoch is the entry's IDENTITY,
    *   so any re-record after the compaction's plan capture survives the
    *   fold, even one value-identical to a cleared entry).
    * @param widening name of a feature whose [[widenFeature]] flip landed
    *   but whose materializing rewrite has not — every OTHER mutator
    *   refuses while set (the crash-window guard); widenFeature itself
    *   sets it at the flip and clears it after materializing. */
  private def writeManifest(g: FeatureGroup, nextSeq: Long, lastBatchId: Long = -1L,
      lingering: Seq[(String, FType, Long)] = Nil, widening: Option[String] = None,
      // REQUIRED, no default: a caller that forgot it would silently
      // rewind the monotone epoch and break lingering-entry identity
      epoch: Long): Unit = {
    def q(s: String) = "\"" + s + "\""
    val feats = g.features
      .map { f =>
        val since = if (f.since > 0L) s""","since":${f.since}""" else ""
        // renames newest-first as "name:seq|name:seq" — names are charset-
        // restricted, so the flat encoding round-trips without escaping
        val was =
          if (f.renames.isEmpty) ""
          else s""","was":${q(f.renames.map { case (n, s) => s"$n:$s" }.mkString("|"))}"""
        s"""{"name":${q(f.name)},"type":${q(FType.name(f.ftype))}$since$was}"""
      }
      .mkString("[", ",", "]")
    val lingeringJson =
      if (lingering.isEmpty) ""
      else s""","lingering":${q(lingering.map { case (n, t, s) =>
        s"$n:${FType.name(t)}:$s" }.mkString("|"))}"""
    val wideningJson = widening.map(w => s""","widening":${q(w)}""").getOrElse("")
    // `epoch` is caller-supplied as m.epoch + 1 from the Manifest the
    // caller read under the manifest lock — ONE computation of "the epoch
    // this write gets", shared with the lingering-entry stamps recorded in
    // the same write (a second file-read-and-parse here could drift from
    // them; round-12 review)
    val json =
      s"""{"name":${q(g.name)},"keyCol":${q(g.keyCol)},"eventTimeCol":${q(g.eventTimeCol)},
         |"nextSeq":$nextSeq,"lastBatchId":$lastBatchId,"epoch":$epoch$lingeringJson$wideningJson,"features":$feats}""".stripMargin
    val tmp = groupDir(g.name).resolve("manifest.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(g.name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def readManifest(name: String): Manifest = {
    require(groupExists(name), s"no such feature group: $name")
    val json = new String(Files.readAllBytes(manifestPath(name)), StandardCharsets.UTF_8)
    def field(k: String): String = {
      val m = ("\"" + k + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(json)
      m.map(_.group(1)).getOrElse(sys.error(s"manifest missing $k"))
    }
    def num(k: String, default: Long): Long =
      ("\"" + k + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(default)
    // `since` and `was` are optional — manifests written before the
    // drop/re-add/rename evolution story (round 12) carry only name+type
    val featRe = ("\\{\"name\":\"([^\"]*)\",\"type\":\"([^\"]*)\"" +
      "(?:,\"since\":(\\d+))?(?:,\"was\":\"([^\"]*)\")?\\}").r
    val feats = featRe.findAllMatchIn(json).map { m =>
      val renames = Option(m.group(4)).filter(_.nonEmpty).map(_.split("\\|").toSeq
        .map { e => val Array(n, s) = e.split(":", 2); (n, s.toLong) })
        .getOrElse(Nil)
      FeatureDef(m.group(1), FType.fromName(m.group(2)),
        Option(m.group(3)).map(_.toLong).getOrElse(0L), renames)
    }.toSeq
    def opt(k: String): Option[String] =
      ("\"" + k + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(json).map(_.group(1))
    val lingering = opt("lingering").filter(_.nonEmpty).map(_.split("\\|").toSeq
      .map { e =>
        e.split(":", 3) match {
          case Array(n, t, s) => (n, FType.fromName(t), s.toLong)
          case Array(n, t)    => (n, FType.fromName(t), 0L) // pre-seq encoding
          case _ => sys.error(s"manifest lingering entry malformed: $e")
        }
      })
      .getOrElse(Nil)
    Manifest(FeatureGroup(field("name"), field("keyCol"), field("eventTimeCol"), feats),
      num("nextSeq", 0L), num("lastBatchId", -1L), lingering, opt("widening"),
      num("epoch", 0L))
  }
}

object FeatureStore {
  /** MINIMUM (and legacy default) bucket count of the online snapshot's
    * key-hash partitioning. Each VERSION records its own bucket count in
    * `v<N>/_meta` — commits derive it from the previous version's key
    * count (see `targetKeysPerBucket`), so per-bucket size stays bounded
    * as the store grows; the read side computes a key's bucket driver-side
    * with the same modulus (CRC32 is bit-identical between
    * java.util.zip.CRC32 and Spark's `crc32`). */
  val OnlineKeyBuckets = 64L

  /** Bucket-count growth cap: 2^16 directories ≈ 15 K keys/bucket even at
    * 10⁹ keys — past this, bucket FILE size is the dial, not count. */
  val MaxOnlineKeyBuckets = 1L << 16

  /** Default for `targetKeysPerBucket`: ~64 Ki keys per bucket keeps a
    * bucket's KV file in the single-digit-MB range at typical row widths. */
  val DefaultTargetKeysPerBucket = 1L << 16

  /** Serving KV file magic ("GKV2" — v2 added the sparse index footer). */
  private[core] val KvMagic = 0x474B5632
  /** Sparse-index trailer magic ("GKIX"). */
  private[core] val KvIndexMagic = 0x474B4958
  /** Entries per sparse-index block — the lookup's worst-case block scan. */
  private[core] val KvIndexStride = 64

  /** Smallest power-of-two bucket count (≥ the floor, ≤ the cap) keeping
    * keys-per-bucket at or under the target. */
  private[core] def bucketCountFor(totalKeys: Long, targetKeysPerBucket: Long): Long = {
    var n = OnlineKeyBuckets
    while (n < MaxOnlineKeyBuckets && totalKeys > targetKeysPerBucket * n) n <<= 1
    n
  }

  /** Driver-side mirror of the snapshot writer's bucket expression
    * `pmod(crc32(key_as_string), buckets)` — `buckets` MUST be the count
    * the target version was written with (its `_meta`). */
  private[core] def keyBucketOf(key: String, buckets: Long): Long = {
    val c = new java.util.zip.CRC32()
    c.update(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Math.floorMod(c.getValue, buckets)
  }

  /** Read exactly `n` bytes at `pos` (flipped, ready to get). */
  private[core] def readFullyAt(ch: java.nio.channels.SeekableByteChannel,
      pos: Long, n: Int): java.nio.ByteBuffer = {
    val bb = java.nio.ByteBuffer.allocate(n)
    ch.position(pos)
    while (bb.hasRemaining)
      if (ch.read(bb) < 0) throw new java.io.EOFException(s"EOF at $pos+$n")
    bb.flip()
    bb
  }

  /** Streaming writer of one partition's bucket KV files (one instance per
    * task, constructed inside the foreachPartition closure — captures no
    * driver state). Tracks its own byte position (the sparse index needs
    * entry offsets without per-entry flushes), back-patches the entry
    * count on close, and PUBLISHES each finished file by atomic rename
    * from an attempt-unique temp name — the task-commit isolation Spark's
    * FileOutputCommitter would otherwise provide. */
  private[core] final class KvBucketWriter(servingPath: String, attempt: String,
      names: Seq[String]) {
    private var ch: java.nio.channels.SeekableByteChannel = _
    private var out: java.io.DataOutputStream = _
    private var pos = 0L
    private var countPos = 0L
    private var count = 0
    private var curBucket = Long.MinValue
    private var tmp: java.nio.file.Path = _
    private var fin: java.nio.file.Path = _
    private val idxKeys = scala.collection.mutable.ArrayBuffer.empty[String]
    private val idxOffs = scala.collection.mutable.ArrayBuffer.empty[Long]
    private val idxCnts = scala.collection.mutable.ArrayBuffer.empty[Int]

    private def wInt(v: Int): Unit = { out.writeInt(v); pos += 4 }
    private def wLong(v: Long): Unit = { out.writeLong(v); pos += 8 }
    private def wBool(v: Boolean): Unit = { out.writeBoolean(v); pos += 1 }
    private def wStr(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); pos += 4 + b.length
    }

    private def open(bucket: Long): Unit = {
      curBucket = bucket
      count = 0; pos = 0L
      idxKeys.clear(); idxOffs.clear(); idxCnts.clear()
      fin = java.nio.file.Paths.get(servingPath, s"bucket=$bucket.kv")
      tmp = java.nio.file.Paths.get(servingPath, s"bucket=$bucket.kv.attempt-$attempt")
      ch = java.nio.file.Files.newByteChannel(tmp,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        java.nio.channels.Channels.newOutputStream(ch)))
      wInt(KvMagic)
      wInt(names.size)
      names.foreach(wStr)
      countPos = pos
      wInt(0) // nEntries placeholder, back-patched on bucket close
    }

    private def close(): Unit = if (out != null) {
      val indexStart = pos
      var i = 0
      while (i < idxKeys.length) {
        wStr(idxKeys(i)); wLong(idxOffs(i)); wInt(idxCnts(i)); i += 1
      }
      wLong(indexStart); wInt(idxKeys.length); wInt(KvIndexMagic)
      out.flush()
      // back-patch the entry count (the stream never buffered the bucket's
      // rows to count them up front)
      val bb = java.nio.ByteBuffer.allocate(4).putInt(count)
      bb.flip()
      ch.position(countPos)
      ch.write(bb): Unit
      ch.close()
      out = null; ch = null
      // the atomic rename IS the commit: a racing attempt renames its own
      // complete, identical file — never interleaved bytes
      java.nio.file.Files.move(tmp, fin,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }

    def writeAll(it: Iterator[Row]): Unit =
      try {
        it.foreach { r =>
          // null keys bucket to null (crc32(null) is null) — they land in a
          // designated -1 file; no key-addressed lookup can reach them anyway
          val b = Option(r.get(r.fieldIndex(EngineColumns.KeyBucket)))
            .map(_.asInstanceOf[Number].longValue).getOrElse(-1L)
          if (b != curBucket || out == null) { close(); open(b) }
          val skey = String.valueOf(r.get(r.fieldIndex("__skey")))
          if (count % KvIndexStride == 0) {
            idxKeys += skey; idxOffs += pos; idxCnts += 0
          }
          idxCnts(idxCnts.length - 1) += 1
          wStr(skey)
          names.foreach { n =>
            val raw = if (r.schema != null && r.schema.fieldNames.contains(n))
              r.get(r.fieldIndex(n)) else null
            val v = renderWireValue(raw)
            if (v == null) wBool(false)
            else { wBool(true); wStr(v) }
          }
          count += 1
        }
        close()
      } catch {
        case e: Throwable => // a failed attempt leaves only its temp file
          if (ch != null) { try ch.close() catch { case _: Throwable => () } }
          throw e
      }
  }

  /** The stringly wire rendering (shared by the cache path, the KV writer,
    * and the legacy job path — one definition, so they can never drift):
    * null → null, timestamps → ISO-8601 Zulu, everything else → toString. */
  /** FULL declared-schema fingerprint — changes on EVERY evolution,
    * including the ones column names cannot see (a re-add that only bumps
    * `since`, a widen that only changes the type). Names/types are
    * charset-restricted, so the flat encoding is unambiguous. */
  private[core] def declaredFingerprint(g: FeatureGroup): String =
    g.features.map(f => s"${f.name}:${FType.name(f.ftype)}:${f.since}:" +
      f.renames.map { case (n, s) => s"$n@$s" }.mkString("|")).mkString(";")

  /** The legal [[FeatureStore.widenFeature]] directions — information-
    * preserving casts only (a narrow would silently destroy data). */
  private[core] def isWidening(from: FType, to: FType): Boolean = (from, to) match {
    case (FType.Integral, FType.Fractional) => true
    case (FType.Integral, FType.FString) => true
    case (FType.Fractional, FType.FString) => true
    case _ => false
  }

  private[core] def renderWireValue(raw: Any): String = raw match {
    case null                  => null
    case t: java.sql.Timestamp => java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'").withZone(java.time.ZoneOffset.UTC)
      .format(t.toInstant)
    case other                 => other.toString
  }

  /** UTF-8 byte-wise string order — what Spark's UTF8String sort (and
    * therefore the serving KV files' entry order) uses; Java's native
    * UTF-16 compareTo diverges for supplementary characters. */
  private[core] val Utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xFF) - (y(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  private[core] def readKvStr(in: java.io.DataInputStream): String = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }
}
