package graft.dedup

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.functions.{CosineSimilarity, HashedShingles, SortedIntersectSize}

/** Deduplication suite for LLM training-data pipelines (extension surface,
  * BASELINE.json north star). Five methods, all shaped for 100 TB:
  * candidate generation is always bucket-hashing (one groupBy shuffle on a
  * bucket key, never an O(n²) cross join); exact verification runs only on
  * candidate pairs.
  *
  * Session hygiene: every method materializes its staging index eagerly,
  * computes the verified pairs, then RELEASES the staging blocks before
  * returning — a long-lived session running many queries (Verify/Bench run
  * 50+ on one SparkSession) must not accumulate staged indexes in the block
  * manager (round-2 lesson: leaked checkpoints degraded later queries ~9×).
  * The returned pairs frame stays materialized (it is small — verified
  * near-dup pairs only) and composes freely downstream.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on content digest. One shuffle with map-side
    * partial aggregation. Output: one row per distinct content with the
    * canonical (min) id and the duplicate count. */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("text_hash"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Expand each capped bucket's sorted id list into ordered candidate pairs
    * IN PLACE (per-bucket pair-array explode) instead of the classic bucket
    * self-join: the self-join shuffles the whole index twice and joins on the
    * bucket key; this form is ONE groupBy shuffle followed by pure map-side
    * expansion, output bounded by Σ min(|bucket|, cap)² under the skew cap.
    * The list is sorted so pairs come out ordered (id_a < id_b) for free.
    * `s` is projected to its own attribute first — Catalyst does no CSE, so
    * referencing `array_sort(ids)` inside the lambda would re-sort per
    * element. */
  private def pairsFromBuckets(buckets: DataFrame, minMatch: Int = 1): DataFrame = {
    // r13-opt: the nested transform+flatten+explode chain is now ONE
    // streaming generator ([[graft.functions.SortedPairs]]) — same pairs,
    // same order, no O(|bucket|²) intermediate arrays (bit-identity pinned
    // in SortedPairsSpec)
    val expanded = buckets
      .select(array_sort(col("ids")).as("s"))
      .select(graft.functions.SortedPairs(col("s")).as(Seq("id_a", "id_b")))
    // minMatch > 1: require the pair to co-occur in >= minMatch buckets —
    // standard candidate pruning. True near-dups share MANY low-df buckets
    // (a jaccard-0.5 pair of n-element sets shares ~n/3), while the long
    // tail of accidental single-bucket pairs dominates verification cost
    // (measured at sf0.1: minMatch 3 cuts candidates 94% with dup recall
    // untouched). Same shuffle either way: distinct == groupBy here.
    if (minMatch <= 1) expanded.distinct()
    else expanded.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__m"))
      .filter(col("__m") >= minMatch)
      .select(col("id_a"), col("id_b"))
  }

  /** Oracle fixture hook: when `sink` is set, the candidate pairs are dumped
    * to parquet and read BACK from the dump, so the exact candidate set the
    * external oracle verifies is byte-identical to the one this pipeline
    * continues with. Shared with [[graft.similarity.Similarity]]. */
  private[graft] def sinkCandidates(cand: DataFrame, sink: Option[String]): DataFrame =
    sink match {
      case Some(path) =>
        cand.coalesce(1).write.mode("overwrite").parquet(path)
        cand.sparkSession.read.parquet(path)
      case None => cand
    }

  /** Materialize `out` WITH ITS LINEAGE CUT (eager local checkpoint), then
    * release the staging blocks behind it. The lineage cut is load-bearing:
    * a `persist()+count()` result is silently INVALIDATED when an upstream
    * dependency is unpersisted (non-cascading cache invalidation re-plans
    * the dependent entry), and every downstream action would re-run the
    * whole pipeline — in the incremental path against an index that has
    * ALREADY been appended to (observed: self-pairs from docs counted as
    * both old and new). A checkpointed result is a closed RDD: nothing
    * upstream can invalidate or recompute it. The checkpoint holds only the
    * verified pairs (small); callers running many queries on one session
    * reset state between them (Bench) or accept the small residue. */
  private def eager(out: DataFrame, release: () => Unit): DataFrame = {
    val p = out.localCheckpoint(eager = true)
    release()
    p
  }

  /** Scalable MARKS for hamming-space near-dup over 64-bit signatures —
    * the duplicate-heavy-corpus shape [[hammingNearDupPairs]]'s member-level
    * expansion cannot take: a corpus where thousands of items share one
    * signature (replicated images, boilerplate) pays Σ min(bucket, cap)²
    * pair expansion there, quadratic in cluster size. This form collapses
    * identical signatures FIRST (one groupBy to (sig, min-id rep)), bands
    * over DISTINCT signatures only (candidate cost bounded by signature
    * diversity, not corpus size; exact duplicates can never blow a
    * bucket), verifies sig pairs with `bit_count(xor)` directly (the sig
    * IS the value — no join-back), and marks members by the group rule:
    * doc x is a duplicate iff some smaller id sits in its own sig group
    * or in a discovered neighbor group, i.e. x > least(own rep, min
    * neighbor rep). Exact duplicates are therefore ALWAYS marked (the cap
    * can only drop cross-group discovery in diversity-heavy buckets — the
    * documented trade, now strictly narrower than the member-level cap).
    * Input `(doc_id, sh)`; output `(doc_id, sh, is_duplicate)`. */
  def hammingNearDupMarks(
      hashed: DataFrame,
      bands: Int = 4,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands (got $maxHamming >= $bands)")
    // null signatures (undecodable assets) are carried through as
    // is_duplicate=false, never grouped: two images that both failed to
    // decode are not duplicates of each other, and the non-null-safe joins
    // below would otherwise silently DROP them — a lost asset is worse
    // than a flagged one.
    val all = hashed.select(col("doc_id"), col("sh"))
    val h = all.where(col("sh").isNotNull)
    val nullSig = all.where(col("sh").isNull)
      .select(col("doc_id"), col("sh"), lit(false).as("is_duplicate"))
    val groups = h.groupBy("sh").agg(min(col("doc_id")).as("rep")).persist()
    groups.count(): Unit

    val buckets = groups
      .select(col("sh"), explode(simhashBands(col("sh"), bands)).as("b"))
      .groupBy(col("b")).agg(collect_list(col("sh")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket)) // diversity cap
    // pairsFromBuckets emits ordered (id_a, id_b) — here the "ids" ARE the
    // signatures, so verification needs no hash join-back
    val sigPairs = pairsFromBuckets(buckets)
      .filter(hamming64(col("id_a"), col("id_b")) <= maxHamming)
    val neighborMin = sigPairs.select(col("id_a").as("sh"), col("id_b").as("nsh"))
      .unionAll(sigPairs.select(col("id_b").as("sh"), col("id_a").as("nsh")))
      .join(groups.select(col("sh").as("nsh"), col("rep").as("nrep")), Seq("nsh"))
      .groupBy("sh").agg(min(col("nrep")).as("nmin"))

    val out = h.join(groups, Seq("sh"))
      .join(neighborMin, Seq("sh"), "left")
      .select(col("doc_id"), col("sh"),
        (col("doc_id") > least(col("rep"), coalesce(col("nmin"), col("rep"))))
          .as("is_duplicate"))
      .unionAll(nullSig)
    eager(out, () => { groups.unpersist(false): Unit })
  }

  /** Exact-Jaccard verification over PRE-HASHED element sets (`array<long>`),
    * shaped so the expensive set intersection runs ONCE per candidate:
    *
    *  - sizes only: |A∪B| = |A|+|B|−|A∩B| (sets are distinct by
    *    construction), so no union ARRAY is ever materialized;
    *  - threshold first, in integer algebra: i/(tot−i) ≥ t ⟺ i·(1+t) ≥ t·tot.
    *    Catalyst does no CSE across Project/Filter, so a filter on a
    *    projected jaccard would re-evaluate the intersection per operator;
    *    in this shape the filter's intersection covers ALL candidates once
    *    and the projected jaccard is only re-evaluated for the few
    *    survivors. The algebra is exact: both sides are integers in double
    *    form (exact to 2^53), and a true jaccard cannot sit within the
    *    round-6 window of `threshold` for set sizes < 10^6, so this equals
    *    filtering on round(i/u, 6) ≥ t.
    *
    * Hashing note: jaccard over 64-bit element hashes equals jaccard over
    * the raw elements up to hash collisions (~|set|²/2⁶⁵ per pair — below
    * any realistic corpus noise floor; the DuckDB oracles verify the
    * raw-string computation against this and agree at every tested sf).
    * Round-2's string-array intersect+union form measured 280µs per pair at
    * sf0.1 — the long-hash + size-algebra + filter-first form is what makes
    * exhaustive verification affordable. */
  private def verifyJaccard(
      candidates: DataFrame,
      sets: DataFrame, // (doc_id, hs: array<long>)
      threshold: Double,
      rational: Option[(Int, Int)] = None): DataFrame = {
    // extra candidate columns (e.g. incremental's new-batch tags) pass through
    val extra = candidates.columns.filterNot(Set("id_a", "id_b")).toSeq.map(col)
    val scored = candidates
      .join(sets.select(col("doc_id").as("id_a"), col("hs").as("h_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("hs").as("h_b")), Seq("id_b"))
      .select(Seq(col("id_a"), col("id_b")) ++ extra ++ Seq(
        // native merge walk (SortedIntersectSize): sets are sorted once at
        // BUILD time, so the per-PAIR cost is O(n+m) with no hash set and
        // no intersection array — this expression runs once per candidate
        SortedIntersectSize(col("h_a"), col("h_b")).cast("long").as("inter"),
        (size(col("h_a")) + size(col("h_b"))).cast("long").as("tot")): _*)
    // callers with an exact RATIONAL threshold tn/td (prefixFilterJaccard)
    // filter in pure long algebra — J = i/(tot−i) ≥ tn/td ⟺ (tn+td)·i ≥
    // tn·tot — so an exact-boundary pair (td·i == tn·(tot−i)) can never be
    // dropped by a ~0.25-ulp double rounding that an integer-exact oracle
    // would keep. Double-threshold callers keep the double form (their
    // thresholds aren't rationals of the set sizes, so no boundary exists)
    val kept = rational match {
      case Some((tn, td)) =>
        scored.filter(col("inter") * (tn.toLong + td.toLong) >= col("tot") * tn.toLong)
      case None =>
        scored.filter(col("inter").cast("double") * (1.0 + threshold) >=
          lit(threshold) * col("tot").cast("double"))
    }
    kept.select(Seq(col("id_a"), col("id_b")) ++ extra :+
      round(col("inter").cast("double") /
        (col("tot") - col("inter")).cast("double"), 6).as("jaccard"): _*)
  }

  /** The minhash signature frame (doc_id, hs, band_keys): shingles are
    * string-hashed ONCE (`hs`); the k minhash functions re-hash the 64-bit
    * values instead of re-reading every string k times, and the same `hs`
    * set drives the exact-Jaccard verification — no strings are stored. */
  private def minhashSignatures(
      df: DataFrame, id: String, text: String,
      shingleK: Int, numHashes: Int, bands: Int): DataFrame =
    df.select(col(id).as("doc_id"), wsTokens(col(text)).as("__toks"))
      .select(col("doc_id"),
        // sorted+distinct: the contract SortedIntersectSize needs; sorting
        // is paid once per document, the merge walk saves once per pair.
        // Fused single-pass shingle hashing (HashedShingles, bit-identical)
        HashedShingles.hashedWordShingles(col("__toks"), shingleK,
          HashedShingles.KindXx64, 31L, distinct = true, sorted = true).as("hs"))
      .withColumn("sig", minhashSignatureFromHashes(col("hs"), numHashes))
      .select(col("doc_id"), col("hs"),
        lshBandKeys(col("sig"), bands, numHashes / bands).as("band_keys"))

  /** MinHash + LSH near-dup candidate pairs with exact-Jaccard verification.
    *
    * shingle → k-minhash signature → `bands` band keys → bucket groupBy →
    * in-place pair expansion (cost ∝ Σ min(bucket, cap)²) → verify exact
    * Jaccard on the shingle sets of candidates only.
    *
    * Hot buckets (boilerplate shingles) are the skew risk at 100 TB —
    * mitigated by dropping buckets larger than `maxBucket` (standard
    * practice: such buckets are near-certain duplicates of templated content
    * and are better handled by exact dedup). Buckets above the cap never
    * expand; the residual risk is the collect_list buffer of a mega-hot
    * bucket before the size filter — at extreme skew pre-filter the index
    * with a count aggregation first.
    *
    * @param indexPath when set, the signature index is persisted as a parquet
    *   table and scanned back (FileScan) instead of living in the block
    *   manager — the 100 TB mode: every production LSH pipeline materializes
    *   signatures once and reuses them across runs.
    * @param candidateSink oracle fixture: dump candidate pairs (pre-
    *   verification) to this path; see [[sinkCandidates]].
    */
  def minhashLsh(
      df: DataFrame,
      id: String,
      text: String,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      indexPath: Option[String] = None,
      candidateSink: Option[String] = None): DataFrame = {

    val spark = df.sparkSession
    // the signature index is MATERIALIZED before the bucket fan-out: the
    // k-hash signature expression tree is enormous, and duplicating it across
    // plan branches made Catalyst re-optimize and re-codegen it repeatedly
    // (planning dominated execution ~50:1 — measured round 2).
    val sig0 = minhashSignatures(df, id, text, shingleK, numHashes, bands)
    val (withSig, release) = indexPath match {
      case Some(p) =>
        writeIndexBatch(sig0, p, "full", wholeIndex = true)
        (readIndex(spark, p), () => ())
      case None =>
        val ps = sig0.persist()
        ps.count(): Unit
        (ps, () => { ps.unpersist(false): Unit })
    }

    // candidate pairs carry ONLY ids through expansion + dedup; the hashed
    // shingle sets are joined back afterwards (shuffling the sets through the
    // pair-dedup would move |pairs| × |set| data — the verify join moves
    // |docs| × |set| instead, orders of magnitude less at scale)
    val buckets = withSig
      .select(col("doc_id"), posexplode(col("band_keys")).as(Seq("band", "bkey")))
      .groupBy(col("band"), col("bkey"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket)) // skew guard

    val candidates = sinkCandidates(pairsFromBuckets(buckets), candidateSink)

    val out = verifyJaccard(candidates, withSig.select(col("doc_id"), col("hs")), threshold)
    eager(out, release)
  }

  /** The signature index is a parquet table PARTITIONED BY the batch that
    * wrote each row (`batch=<id>/` subdirs). Each writer overwrites ONLY its
    * own partition (dynamic partition overwrite), so re-running a batch —
    * crash-retry, replayed orchestration — rewrites the same bytes instead
    * of double-folding signatures, mirroring `FeatureStore.ingest`'s batchId
    * guard. Readers prune the partition column away (and, in the
    * incremental path, prune OUT the running batch's own partition, so a
    * replay sees exactly the pre-batch index). */
  /** Replay-idempotent batch write shared by every persisted index family
    * (signature, vector, IVFADC codes/vectors/tombstones): rows land in
    * `batch=<id>` under the resolved layout. `partitionCols` adds further
    * layout columns after `batch` (the IVFADC codes table partitions by
    * `cell` for probe-time pruning). */
  private[graft] def writeIndexBatch(sig: DataFrame, indexPath: String, batchId: String,
      wholeIndex: Boolean = false, partitionCols: Seq[String] = Nil): Unit = {
    // validate BEFORE the lock: withIndexWriter creates the index root, and
    // a rejected first write must not leave a lock-file-only marker dir
    // that Files.exists-gated readers (readTombstones) mistake for a table
    require(batchId.matches("[A-Za-z0-9_.-]+"),
      s"batchId '$batchId' must be path-safe ([A-Za-z0-9_.-]+)")
    withIndexWriter(indexPath) {
    // the layout is resolved INSIDE the writer lock: a compaction can no
    // longer flip the pointer between this resolve and the write, which
    // would strand the batch's bytes in a version dir the compaction's
    // cleanup then deletes (single-table indexes lock their own root here;
    // multi-table sequences hold the family-level lock around the whole
    // write+commit — reentrant, so this inner lock is free)
    val stamped = sig.withColumn("batch", lit(batchId))
    // CLUSTER on the layout's partition columns before partitionBy: without
    // it every upstream task writes a file into every partition dir —
    // tasks × buckets small files per index write (measured: the sf10 LM
    // lifecycle spent 12× the one-shot compute writing and then re-listing
    // ~32k bigram files). Clustered, the write is one file per partition
    // value; the values are hash buckets (bb/tb) or capped cells, so the
    // per-task skew is bounded by construction. The same fix as the online
    // snapshot's repartition-before-partitionBy (FeatureStore).
    //
    // r12-opt adjudication: REBALANCE-before-write (guide §6) was tried
    // here and in compactFamily — it cut write-stage TASK time ~3x (the
    // 32-task writer open/commit cycles collapse to advisory-sized
    // stages) but measured NEUTRAL at 32 cores and a 5-15% REGRESSION at
    // 8 cores on q180/q202/q227 (isolated minima, both trees): the added
    // shuffle + AQE barrier per write costs more wall than the writer
    // inits it saves, and coalescing a CPU-bound parquet encode to one
    // task serializes it. Reverted to the clustered repartition.
    //
    // r13-opt: the clustered repartition now carries an EXPLICIT width
    // derived from the optimizer's size estimate ([[sizedForWrite]]) —
    // same single exchange, no AQE replan, but a stats-table write no
    // longer launches one parquet writer commit cycle per core.
    sizedForWrite(stamped, partitionCols)
      .write
      .partitionBy("batch" +: partitionCols: _*)
      // whole-index rebuild clears every partition; per-batch append clears
      // only batch=<id> (replay-idempotent)
      .option("partitionOverwriteMode", if (wholeIndex) "static" else "dynamic")
      .mode("overwrite")
      .parquet(resolveIndexDir(indexPath))
    }
  }

  /** Write-stage width for an index-table write, derived from the
    * optimizer's size estimate AT WRITE TIME — guide §6 coalesce-on-write
    * without REBALANCE's extra shuffle + AQE barrier (the r12 adjudication
    * above). One writer task per `graft.write.targetPartitionBytes`
    * (default 128 MB — the guide's output-file sizing band), clamped to
    * [1, max(defaultParallelism, shuffle.partitions)]: a 1-row stats table
    * writes with ONE task instead of one per core, while a corpus-sized
    * table keeps full width. Estimates only ever err LARGE here (filter
    * selectivity defaults keep child size; parquet scans report true file
    * bytes), which errs toward MORE parallelism — the safe side.
    *
    * Stats come from the ANALYZED plan, not the optimized one: forcing
    * `optimizedPlan` here ran the whole optimizer a SECOND time per write
    * (the write command re-optimizes its child), which measurably regressed
    * the deep-plan FeatureStore lifecycles (q236/q241 isolated minima
    * −16/−25%). The size visitor walks any logical plan; the analyzed
    * estimate only differs by pre-pushdown shape, i.e. errs larger. */
  private[graft] def writeWidth(df: DataFrame): Int = {
    val spark = df.sparkSession
    val target = math.max(1L, spark.conf.getOption("graft.write.targetPartitionBytes")
      .map(_.trim.toLong).getOrElse(128L << 20))
    val cap = math.max(math.max(1, spark.sparkContext.defaultParallelism),
      spark.sessionState.conf.numShufflePartitions)
    val est = df.queryExecution.analyzed.stats.sizeInBytes
    ((est + target - 1) / target).max(1).min(cap).toInt
  }

  /** Cluster + size a frame for a `partitionBy` index write.
    *
    *  - partition-column writes keep their clustering exchange (the
    *    tasks × buckets small-file rationale above) but at the
    *    estimate-derived [[writeWidth]] instead of the session default;
    *  - flat writes are left on their upstream partitioning — EXCEPT when
    *    the estimate says the whole table is tiny
    *    (`graft.write.smallTableBytes`, default 16 MB: stats rows, term-df
    *    tables, doc-id lists), where a one-task repartition trades a
    *    provably-tiny exchange for core-count-minus-one writer commit
    *    cycles. A heavy map-side producer (signature hashing) stays wide:
    *    its estimate rides the scan's real file bytes past the gate, and
    *    repartition — unlike coalesce — never serializes upstream compute
    *    anyway. */
  private[graft] def sizedForWrite(df: DataFrame, partitionCols: Seq[String]): DataFrame = {
    if (partitionCols.nonEmpty) df.repartition(writeWidth(df), partitionCols.map(col): _*)
    else {
      val small = math.max(0L, df.sparkSession.conf
        .getOption("graft.write.smallTableBytes").map(_.trim.toLong)
        .getOrElse(16L << 20))
      if (df.queryExecution.analyzed.stats.sizeInBytes <= small)
        df.repartition(1)
      else df
    }
  }

  /** Read the signature index without the layout's partition column. */
  private def readIndex(spark: SparkSession, indexPath: String,
      excludeBatch: Option[String] = None): DataFrame = {
    val raw = spark.read.parquet(resolveIndexDir(indexPath))
    val pruned = excludeBatch.fold(raw)(b => raw.filter(col("batch") =!= lit(b)))
    pruned.select(col("doc_id"), col("hs"), col("band_keys"))
  }

  /** Physical dir of a (possibly compacted) signature index: a compacted
    * index lives in `<path>/_v<N>` named by the `<path>/CURRENT` pointer; an
    * uncompacted one is the flat path itself (backward compatible — every
    * pre-compaction index keeps working unchanged). The underscore prefix is
    * load-bearing: Spark's hidden-path filter makes flat-layout readers skip
    * `_v*` dirs, so a compaction that crashed between writing the version
    * dir and swapping the pointer leaves readers completely unaffected (a
    * bare `v1` among the `batch=*` dirs would corrupt partition discovery). */
  /** Recursively remove a directory if present — the whole-index-rebuild
    * hygiene for marker dirs: a rebuild writes a NEW index generation, and
    * tombstones from the previous generation must not survive it (they
    * would suppress legitimate deletes of re-ingested keys and wrongly
    * anti-join current docs at serve time). */
  private[graft] def clearDir(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
      finally walk.close()
    }
  }

  private[graft] def resolveIndexDir(indexPath: String): String = {
    // FAMILY-versioned table: `<family>/FAMILY` names the version EVERY
    // table of a multi-table family serves at — one pointer, one commit
    // ([[compactFamily]]), so readers can never observe the family's
    // tables at mixed versions. Marker tables version with the family too
    // (round 11); a table not yet versioned at the named generation falls
    // through to its flat layout ([[resolveIndexDirPinned]]).
    val p = java.nio.file.Paths.get(indexPath)
    resolveIndexDirPinned(indexPath,
      Option(p.getParent).flatMap(par => readFamilyPointer(par.toString)))
  }

  private[graft] def readFamilyPointer(familyPath: String): Option[String] = {
    val f = java.nio.file.Paths.get(familyPath, "FAMILY")
    if (!java.nio.file.Files.exists(f)) None
    else Some(new String(java.nio.file.Files.readAllBytes(f),
      java.nio.charset.StandardCharsets.UTF_8).trim)
  }

  /** [[resolveIndexDir]] with the family version PINNED by the caller —
    * the snapshot-read primitive: a multi-table read resolves every table
    * at the same generation it captured once, instead of re-reading the
    * pointer per table (a compaction committing between two of a serve's
    * table reads would otherwise hand it mixed generations; version
    * retention keeps the pinned generation's files alive one cycle, so
    * the pinned read COMPLETES instead of failing).
    *
    * A PINNED version dir that is MISSING is one of two things and they
    * must not be conflated (VERDICT r10 advice): (a) the table predates
    * versioning at that generation — its rows still live in the flat
    * `batch=*` layout, which retention keeps one cycle, so falling back
    * to the flat path serves the pinned generation's data; (b) the pinned
    * version was VACUUMED out from under an in-flight serve (an operator
    * [[vacuumIndex]] racing a lock-free reader). Case (b) used to fall
    * through silently to CURRENT — handing a multi-table serve MIXED
    * generations, the exact anomaly [[FamilySnapshot]] exists to prevent —
    * and now fails loudly instead. The discriminator: a table with
    * surviving flat `batch=*` dirs is (a); a table with only `_v*`
    * generations newer than the pin is (b). */
  private[graft] def resolveIndexDirPinned(indexPath: String,
      famVersion: Option[String]): String = {
    val p = java.nio.file.Paths.get(indexPath)
    famVersion.map(p.resolve).filter(java.nio.file.Files.exists(_)) match {
      case Some(d) => d.toString
      case None =>
        if (famVersion.isDefined && !hasFlatBatchDirs(p) && maxVersionIn(p) > 0L)
          throw new IllegalStateException(
            s"pinned version ${famVersion.get} of $indexPath no longer exists " +
              "but newer generations do — it was vacuumed while this serve " +
              "had it pinned. Re-plan the serve against the current version " +
              "(retention keeps superseded generations one compaction cycle; " +
              "an explicit vacuumIndex during a serve re-opens that window).")
        val cur = p.resolve("CURRENT")
        if (java.nio.file.Files.exists(cur))
          p.resolve(new String(java.nio.file.Files.readAllBytes(cur),
            java.nio.charset.StandardCharsets.UTF_8).trim).toString
        else indexPath
    }
  }

  /** Does `dir` hold any pre-versioning flat `batch=<id>` partition dirs? */
  private def hasFlatBatchDirs(dir: java.nio.file.Path): Boolean = {
    if (!java.nio.file.Files.exists(dir)) return false
    val ls = java.nio.file.Files.list(dir)
    try ls.iterator().asScala.exists(_.getFileName.toString.startsWith("batch="))
    finally ls.close()
  }

  /** Does the RESOLVED layout dir hold any data? An EMPTY generation is a
    * first-class state for marker tables — a purge folds every pending
    * marker away and commits a version dir with no `batch=*` partitions
    * (possibly no files at all), which `spark.read.parquet` would reject
    * with a schema-inference error. Readers of maybe-empty tables gate on
    * this instead of `Files.exists` ([[readMarkerTable]]). */
  private[graft] def hasBatchData(resolvedDir: String): Boolean =
    hasFlatBatchDirs(java.nio.file.Paths.get(resolvedDir))

  /** Read one maybe-empty family table under the shared snapshot, or None
    * when the table holds no data at the snapshot's generation — the one
    * read path for MARKER tables (pending-delete tombstones), which are
    * versioned and retained exactly like data tables (round 11: a serve
    * pinned at generation N reads generation N's OWN marker view, closing
    * the documented purge-race erasure window). */
  private[graft] def readMarkerTable(spark: SparkSession, familyPath: String,
      table: String, excludeBatch: Option[String] = None,
      snapshot: Option[FamilySnapshot] = None): Option[DataFrame] = {
    val snap = snapshot.getOrElse(familySnapshot(familyPath))
    val dir = resolveIndexDirPinned(s"$familyPath/$table", snap.version)
    if (!hasBatchData(dir)) None
    else Some(readVisibleTable(spark, familyPath, table, excludeBatch, Some(snap)))
  }

  /** One ATOMIC capture of a family's read state: the VISIBLE batch ids
    * and the FAMILY version, taken once at the start of a multi-table
    * read ([[readVisibleTable]]'s `snapshot` parameter). Read order is
    * load-bearing — VISIBLE first, FAMILY second: both writer orders
    * (append = tables → VISIBLE; compaction = FAMILY CAS → VISIBLE
    * retire) then yield a consistent view for any interleaving (an
    * uncommitted append stays invisible; a mid-compaction reader lands on
    * the NEW generation whose base already folds the retired ids — the
    * extra manifest ids filter as no-ops). Capturing FAMILY first could
    * instead pair the OLD generation with the RETIRED manifest and
    * silently drop the folded batches' rows.
    *
    * MARKER TABLES ARE IN THE SNAPSHOT (round 11 — closes the round-10
    * residual window): tombstone dirs are versioned family tables like any
    * other — every [[compactFamily]] commit stages them a generation dir
    * (EMPTY when nothing is pending, [[hasBatchData]] gates the read), a
    * purge folds their markers away inside the SAME family CAS that erases
    * the data rows, and retention keeps the superseded generation — WITH
    * its marker view — one full cycle. A serve pinned at generation N
    * therefore always evaluates N's own pending-delete markers, even when
    * a purge commits N+1 mid-plan; the old in-place marker sweep (which
    * could hand a pinned serve a pre-purge data view without its pending
    * deletions) is gone. */
  private[graft] final case class FamilySnapshot(visible: Option[Set[String]],
      version: Option[String])

  private[graft] def familySnapshot(familyPath: String): FamilySnapshot = {
    val vis = visibleBatches(familyPath) // FIRST — see scaladoc
    FamilySnapshot(vis, readFamilyPointer(familyPath))
  }

  /** Batch-visibility manifest of a multi-table family: `<family>/VISIBLE`
    * lists the batch ids whose partitions have landed in ALL the family's
    * tables. An append writes its per-table `batch=<id>` partitions first
    * and then commits the id with ONE atomic manifest rewrite — readers
    * going through [[readVisibleTable]] see the batch in every table at
    * once or in none (the torn-append window of multi-table families:
    * postings at batch N with term-df still at N−1). The manifest is
    * created by the family's BUILD; an index from before it existed has no
    * file and reads unfiltered (legacy — the old documented window), which
    * also keeps pre-manifest batches visible. `batch=base` (build/compact
    * output) is always visible. */
  private[graft] def visibleBatches(familyPath: String): Option[Set[String]] = {
    val p = java.nio.file.Paths.get(familyPath, "VISIBLE")
    if (!java.nio.file.Files.exists(p)) None
    else Some(new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSet)
  }

  // manifest updates are read-modify-write: serialize them through the
  // [[graft.core.Coordination]] seam (default: same-process monitor per
  // path + cross-process file lock) so a delete committing mid-compaction
  // can never be lost
  private def withVisibleLock[A](familyPath: String)(body: => A): A =
    graft.core.Coordination.current.withWriterLock(
      java.nio.file.Paths.get(familyPath), "VISIBLE.lock")(body)

  /** Serialize the WRITERS of one persisted index root — append/delete
    * batches and compactions. Without this, an append that resolved the
    * pre-compaction layout can write its partitions into a version dir the
    * compaction then flips away from and deletes: the batch id stays in the
    * manifest while its bytes are gone (a BM25 delete racing a compaction
    * would permanently over-count n_docs — the fold cannot see partials
    * that land after it read). The lock is the [[withVisibleLock]]
    * discipline writ large: a same-process monitor (REENTRANT — a compound
    * op may nest table-level writes under its family-level lock) plus a
    * cross-process file lock (`_writer.lock`, underscore-hidden from
    * Spark's listings). Readers never take it — reads stay lock-free
    * (quiet-reader as before). Acquisition goes through the
    * [[graft.core.Coordination]] seam: on a multi-driver cluster the
    * backend is a catalog lease, swapped in with `Coordination.use`
    * without touching this call site. */
  private[graft] def withIndexWriter[A](indexPath: String)(body: => A): A =
    graft.core.Coordination.current.withWriterLock(
      java.nio.file.Paths.get(indexPath), "_writer.lock")(body)

  private def writeVisibleFile(familyPath: String, ids: Set[String]): Unit = {
    val root = java.nio.file.Paths.get(familyPath)
    val tmp = root.resolve("VISIBLE.tmp")
    java.nio.file.Files.write(tmp, ids.toSeq.sorted.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, root.resolve("VISIBLE"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** (Re)write the manifest to exactly `ids` — the family's BUILD uses it
    * to start the visible set. */
  private[graft] def resetVisibleBatches(familyPath: String,
      ids: Set[String] = Set.empty): Unit =
    withVisibleLock(familyPath)(writeVisibleFile(familyPath, ids))

  /** Commit `batchId` as visible — the LAST step of a multi-table append
    * (all per-table partitions already written; a crash before this line
    * leaves the whole batch invisible and a same-id retry overwrites it).
    * No-op on a legacy index without a manifest. Idempotent. */
  private[graft] def commitVisibleBatch(familyPath: String, batchId: String): Unit =
    withVisibleLock(familyPath) {
      visibleBatches(familyPath).foreach(cur =>
        writeVisibleFile(familyPath, cur + batchId))
    }

  /** Read one family table with the batch-visibility filter applied (and,
    * optionally, the replay discipline's own-batch exclusion). The filter
    * is a static partition predicate — invisible batches' files are pruned
    * from the listing, never scanned. */
  private[graft] def readVisibleTable(spark: SparkSession, familyPath: String,
      table: String, excludeBatch: Option[String] = None,
      snapshot: Option[FamilySnapshot] = None): DataFrame = {
    // `snapshot`: pass ONE [[familySnapshot]] across all of a multi-table
    // read's calls so every table resolves at the same generation under
    // the same manifest (without it, each call re-captures — fine for a
    // single-table read or any read under the writer lock, racy for a
    // lock-free multi-table serve overlapping a commit)
    val snap = snapshot.getOrElse(familySnapshot(familyPath))
    val df = spark.read.parquet(
      resolveIndexDirPinned(s"$familyPath/$table", snap.version))
    val vis = snap.visible match {
      case Some(ids) => df.filter(col("batch").isInCollection("base" +: ids.toSeq))
      case None => df
    }
    excludeBatch.fold(vis)(b => vis.filter(col("batch") =!= lit(b)))
  }

  /** Compact EVERY table of a multi-table index family under ONE commit:
    * the per-table folds stage in parallel (wall time of the widest table,
    * the [[inParallel]] win), then a SINGLE compare-and-swap of the
    * family's `FAMILY` pointer promotes all staged version dirs inside one
    * critical section. Readers resolve every table through that one
    * pointer ([[resolveIndexDir]]), so a reader overlapping the compaction
    * can never see, e.g., postings at version N with term-df at N−1 — the
    * cross-table snapshot-isolation gap of committing per-table CURRENT
    * pointers in parallel (VERDICT r9 missing #3). A crash before the swap
    * leaves every table serving its old version; a racing compaction loses
    * the CAS loudly. MARKER tables (pending-delete tombstones) are listed
    * like any other table — a plain compaction folds them with `identity`
    * (markers survive into the new generation's base), a purge folds them
    * with the same anti-join that erases the data rows (both commit under
    * the ONE CAS, so no reader can see purged data with pending markers or
    * vice versa). A listed table whose source holds NO data commits an
    * EMPTY generation dir ([[hasBatchData]] gates the read) — the invariant
    * every pinned read relies on: from its first compaction onward, a
    * family's generation N carries generation N's marker view. Legacy
    * per-table pointers are retired by the first family commit.
    *
    * WRITER SERIALIZATION: the whole compaction holds the family's
    * [[withIndexWriter]] lock, and every append/delete holds it across its
    * table writes + visibility commit — so no batch can land partials in a
    * layout this fold has already read past (the lost-update the lock
    * exists for: an append writing into the old version dir after the fold
    * captured its input would survive in the manifest but lose its bytes
    * to the post-flip cleanup). A racing writer simply blocks and then
    * proceeds against the compacted generation.
    *
    * VISIBILITY ACCOUNTING (families with a batch manifest): the fold reads
    * only visible batches, and afterwards the manifest is updated to
    * `current − captured` (folded ids retire; under writer serialization
    * current == captured — the subtraction is kept as crash defense).
    * Marker batches fold and retire with everything else now that marker
    * tables are ordinary listed tables.
    *
    * @param tables (name, fold transform, extra partition cols after batch)
    */
  private[graft] def compactFamily(spark: SparkSession, familyPath: String,
      tables: Seq[(String, DataFrame => DataFrame, Seq[String])]): Unit =
      withIndexWriter(familyPath) {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(familyPath)
    val famPtr = root.resolve("FAMILY")
    val expected =
      if (Files.exists(famPtr))
        Some(new String(Files.readAllBytes(famPtr),
          java.nio.charset.StandardCharsets.UTF_8).trim)
      else None
    // the next version must clear BOTH counters: the family's own, and any
    // legacy per-table `_v<K>` dirs from the pre-FAMILY scheme. Deriving it
    // from the family counter alone had two failure modes: (a) the first
    // family commit of a legacy index could derive _v1 while a table was
    // SERVING from its own _v1 — casSwap's promotion then destroyed the
    // serving layout in place (no retention cycle at all); (b) legacy dirs
    // numbered >= the family counter were never swept, so a GDPR purge +
    // vacuum left pre-purge bytes on disk indefinitely. Starting past the
    // max of every counter makes legacy dirs ordinary old versions: kept
    // one cycle, then vacuumed like everything else.
    // per-table pre-commit version counters: they feed BOTH the next-version
    // derivation and the retention rule below (a table FIRST versioned by
    // this commit keeps its flat batch=* layout one cycle for pinned
    // readers, even when the family counter is already past 2 — the
    // marker-table migration case)
    val prevMaxByTable: Map[String, Long] = tables.map { case (name, _, _) =>
      name -> maxVersionIn(Paths.get(familyPath, name))
    }.toMap
    val maxLegacy = prevMaxByTable.values.foldLeft(0L)(math.max)
    val next = s"_v${math.max(
      expected.map(_.stripPrefix("_v").toLong).getOrElse(0L), maxLegacy) + 1}"
    // fold only VISIBLE batches (when the family keeps a manifest): a torn
    // append's half-landed partitions are physically dropped by the fold —
    // the compaction doubles as the self-heal for crashed appends
    val visible = visibleBatches(familyPath)
    def visibleOnly(df: DataFrame): DataFrame = visible match {
      case Some(ids) => df.filter(col("batch").isInCollection("base" +: ids.toSeq))
      case None => df
    }
    val staged = tables.map { case (name, transform, extraCols) =>
      val oldDir = resolveIndexDir(s"$familyPath/$name")
      val finalDir = Paths.get(familyPath, name, next)
      (name, transform, extraCols, oldDir,
        graft.core.OptimisticPointer.stagingFor(finalDir), finalDir)
    }
    inParallel(staged.map { case (_, transform, extraCols, oldDir, stagingDir, _) =>
      () => {
        // a data-less source (marker table with nothing pending, or a table
        // never written) still commits a generation: an EMPTY staging dir —
        // spark.read.parquet would reject it, and readers gate on
        // hasBatchData instead. This is what lets EVERY generation carry
        // its own marker view (possibly "none pending").
        if (!hasBatchData(oldDir)) {
          Files.createDirectories(stagingDir): Unit
        } else {
          val folded = transform(visibleOnly(spark.read.parquet(oldDir)).drop("batch"))
            .withColumn("batch", lit("base"))
          // cluster on the layout's partition columns — the writeIndexBatch
          // rationale: unclustered, a compaction re-explodes the file count
          // it exists to shrink (tasks × buckets small files); width sized
          // from the fold's estimate (r13-opt, see sizedForWrite)
          sizedForWrite(folded, extraCols)
            .write.partitionBy("batch" +: extraCols: _*).mode("overwrite")
            .parquet(stagingDir.toString)
        }
      }
    })
    // MIGRATION BACKFILL (round-12 ADVICE): a table FIRST versioned by this
    // commit (prevMax 0) in a family whose counter is already past 0 gets
    // an EMPTY dir at the SUPERSEDED generation too — without it, a serve
    // pinned at `expected` races this flip into the vacuumed-pin detector
    // (_vN absent, no flat batch dirs, _v{N+1} present ⇒ misclassified as
    // vacuumed and failed loudly) when the right answer is "no markers at
    // generation N". Only when NO flat batch dirs exist: with flat dirs
    // present they ARE the pinned generation's data and the fallback must
    // keep resolving to them, not to a fresh empty dir.
    expected.foreach { exp =>
      staged.foreach { case (name, _, _, _, _, _) =>
        val tableDir = Paths.get(familyPath, name)
        if (prevMaxByTable.getOrElse(name, 0L) == 0L && !hasFlatBatchDirs(tableDir))
          Files.createDirectories(tableDir.resolve(exp)): Unit
      }
    }
    try graft.core.OptimisticPointer.casSwap(root, "FAMILY", expected, next,
      stages = staged.map(s => s._5 -> s._6))
    finally staged.foreach(s => clearDir(s._5.toString)) // loser cleans staging
    // retire the folded ids (marker batches folded with everything else;
    // kept as a subtraction rather than a blank for crash defense)
    if (visible.isDefined) withVisibleLock(familyPath) {
      val captured = visible.get
      val current = visibleBatches(familyPath).getOrElse(Set.empty)
      writeVisibleFile(familyPath, current -- captured)
    }
    // retention sweep per table (post-flip): keep each table's
    // immediately superseded layout for in-flight lock-free readers,
    // VACUUM everything older ([[sweepSupersededVersions]]); retire any
    // legacy per-table pointer (the family pointer owns resolution from
    // here on — deleting the pointer FILE strands no reader, they hold
    // resolved dir paths, which retention preserves one cycle). A table
    // FIRST versioned by this commit (prevMax 0 — e.g. a marker table of a
    // family whose counter is already high) keeps its flat batch=* dirs
    // one cycle regardless of the family counter: they ARE its
    // immediately superseded layout, and pinned readers of the previous
    // generation resolve to them.
    val committed = next.stripPrefix("_v").toLong
    staged.foreach { case (name, _, _, _, _, _) =>
      val flat = Paths.get(familyPath, name)
      if (prevMaxByTable.getOrElse(name, 0L) >= 1L)
        sweepSupersededVersions(flat, committed)
      else {
        // first-versioned table: the migration backfill above may have
        // created an EMPTY dir at the superseded generation `expected`,
        // which can sit MORE than retentionCycles below `committed` when
        // legacy per-table version dirs pushed the counter (the next-
        // version derivation takes the max of every counter). Widen the
        // keep so this commit's own sweep cannot delete the dir it just
        // created for pinned readers (round-12 review finding).
        val keepFloor = expected.map(e => committed - e.stripPrefix("_v").toLong)
          .getOrElse(0L).toInt
        sweepSuperseded(flat, committed, dedupVersionOf, _ => false,
          keep = math.max(retentionCycles, keepFloor))
      }
      Files.deleteIfExists(flat.resolve("CURRENT")): Unit
    }
  }

  /** Compact a batch-partitioned index: fold every `batch=<id>` partition
    * into ONE `batch=base` partition under a NEW version dir, then
    * atomically swap the `CURRENT` pointer — the [[graft.core.FeatureStore]]
    * `compactOffline` pattern. A year of daily batches is 365 partition
    * dirs of small files; candidate generation reads them all every run, so
    * at production scale the index wants periodic compaction exactly like
    * the offline store. [[compactMinhashIndex]] compacts the signature
    * index; [[compactSemanticIndex]] the vector index ([[buildSemanticIndex]]
    * layout — centroids are a single overwrite-in-place table and need none).
    *
    * Crash-safe: a failure before the pointer swap leaves CURRENT (and
    * every reader/writer) on the old layout; a retry starts over on a fresh
    * version dir. Like any compaction, it is single-writer maintenance: run
    * it when no batch is mid-flight, and note it ENDS the replay window for
    * the folded batches (their rows now live in `base`, so a very late
    * replay of an old batchId would re-add rows — the same contract as
    * compacting the offline store away from its per-batch files). */
  def compactMinhashIndex(spark: SparkSession, indexPath: String): Unit =
    compactBatchedDir(spark, indexPath)

  /** See [[compactMinhashIndex]] — same fold for the semantic index's
    * per-batch vector partitions. */
  def compactSemanticIndex(spark: SparkSession, indexPath: String): Unit =
    // lock the FAMILY root, not just the vectors subtable: the incremental
    // dedup's full-span lock is on the family path, and the two must
    // mutually exclude (the nested subtable lock acquires in the same
    // family→table order as the incremental's writeIndexBatch — no cycle)
    withIndexWriter(indexPath)(compactBatchedDir(spark, s"$indexPath/vectors"))

  /** Run independent index-maintenance tasks CONCURRENTLY — a multi-table
    * index (BM25's postings/termdf/stats/doclens, the LM's five counts)
    * pays one fixed Spark-job latency per table when written or compacted
    * serially, and the tables are disjoint directories over already-staged
    * (persisted) inputs, so the only thing serialization buys is wall
    * time. Spark schedules concurrent actions fine (FIFO within the pool);
    * exceptions propagate to the caller. */
  private[graft] def inParallel(tasks: Seq[() => Unit]): Unit = {
    // DEGRADE TO SEQUENTIAL under the analyzer's catalog monitor: a SQL
    // statement face (feature_store_merge) executes lifecycle ops INSIDE
    // analysis, where Spark holds the SessionCatalog lock — a worker
    // thread building a Dataset then needs that same lock for its own
    // analysis and the join deadlocks (observed: commitIncremental's
    // bucketCounts parked under ResolveFunctions). Parallelism here is a
    // latency optimization, never a semantic; sequential is always correct.
    val underCatalogLock = org.apache.spark.sql.SparkSession.getActiveSession
      .exists(s => Thread.holdsLock(s.sessionState.catalog))
    if (tasks.size <= 1 || underCatalogLock) { tasks.foreach(_()); return }
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(tasks.size, 8))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence(tasks.map(t => Future(t()))), Duration.Inf): Unit
    finally pool.shutdown()
  }

  /** VERSION RETENTION for lock-free readers: after committing version N,
    * keep N−1 (the immediately superseded layout) and VACUUM everything
    * older — `_v<k>` dirs with k < N−1, plus the pre-versioning flat
    * `batch=*` dirs once N ≥ 2. Writers serialize on [[withIndexWriter]],
    * but READERS deliberately take no lock; deleting the superseded
    * version at commit time made a reader that resolved it mid-scan fail
    * on vanished files. Keep-one bounds that window to a full compaction
    * CYCLE (the Delta/Iceberg VACUUM-after-retention contract): only a
    * reader still scanning after TWO compactions of the same index can
    * observe deleted files. Disk cost: one extra copy of one index,
    * reclaimed at the next compaction. */
  private def sweepSupersededVersions(root: java.nio.file.Path,
      committed: Long): Unit =
    sweepSuperseded(root, committed, dedupVersionOf, _.startsWith("batch="))

  /** Version number of a `_v<K>` dir name (the dedup-index scheme). */
  private def dedupVersionOf(n: String): Option[Long] =
    if (n.startsWith("_v") && n.drop(2).nonEmpty && n.drop(2).forall(_.isDigit))
      Some(n.drop(2).toLong)
    else None

  /** RETENTION POLICY: how many superseded generations each versioned
    * layout keeps for in-flight lock-free readers before the commit-time
    * sweep reclaims them. 1 (the default) bounds a reader's window to one
    * full compaction cycle — the Delta/Iceberg VACUUM-after-retention
    * contract; raise it when long-running readers (multi-hour training
    * jobs over a pinned snapshot) must survive several maintenance cycles.
    * Seeds from `GRAFT_RETENTION_CYCLES` (defensively parsed — an
    * unparseable value falls back to the default, it must not fail every
    * commit), overridable at runtime with [[setRetentionCycles]].
    * The EXPLICIT vacuums ([[vacuumIndex]], [[vacuumFamily]],
    * [[graft.sources.ZoneMap.vacuum]]) always sweep to keep-0 — erasure
    * timeliness is the operator's call, not the policy's. */
  @volatile private var retentionCyclesVar: Int =
    sys.env.get("GRAFT_RETENTION_CYCLES")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ >= 1).getOrElse(1)

  def retentionCycles: Int = retentionCyclesVar

  def setRetentionCycles(n: Int): Unit = {
    require(n >= 1, s"retention must keep >= 1 superseded generation, got $n")
    retentionCyclesVar = n
  }

  /** The retention rule, layout-agnostic (shared with
    * [[graft.sources.ZoneMap]], whose versions are `v<N>` and whose
    * pre-versioning layout is named dirs instead of `batch=*`): delete
    * every version older than `committed − keep`, and the flat legacy
    * layout once `committed ≥ 1 + keep` (it is then more than `keep`
    * generations old). `keep` defaults to the configured
    * [[retentionCycles]]; explicit vacuums pass 0. ONE implementation — a
    * future change to the retention rule must not silently diverge
    * between the index and table-format layouts. */
  private[graft] def sweepSuperseded(root: java.nio.file.Path, committed: Long,
      versionOf: String => Option[Long], isFlatLegacy: String => Boolean,
      keep: Int = retentionCycles): Unit = {
    import java.nio.file.Files
    if (!Files.exists(root)) return
    val ls = Files.list(root)
    val entries = try ls.iterator().asScala.toList finally ls.close()
    entries.foreach { p =>
      val n = p.getFileName.toString
      val staleVersion = versionOf(n).exists(_ < committed - keep)
      val staleFlat = committed >= 1 + keep && isFlatLegacy(n)
      if (staleVersion || staleFlat) clearDir(p.toString)
    }
  }

  /** Highest `_v<K>` version dir present under `root` (0 when none) — the
    * legacy-counter probe [[compactFamily]] clears when deriving the next
    * family version. */
  private def maxVersionIn(root: java.nio.file.Path): Long = {
    import java.nio.file.Files
    if (!Files.exists(root)) return 0L
    val ls = Files.list(root)
    try ls.iterator().asScala
      .flatMap(p => dedupVersionOf(p.getFileName.toString)).foldLeft(0L)(math.max)
    finally ls.close()
  }

  /** Drop every SUPERSEDED layout of one index table NOW, keeping only the
    * current version — the explicit final step of a GDPR erase under
    * version retention: a purge's rewrite physically erases the SERVING
    * layout immediately, but the retained previous version (kept one cycle
    * for lock-free readers) still holds the erased rows' bytes until the
    * next maintenance cycle or this call. The
    * [[graft.core.FeatureStore.gcOnline]] precedent: erasure timeliness is
    * an explicit operator decision, because sweeping early re-opens the
    * reader window retention exists to close. Works on a flat, CURRENT-
    * pointer, or FAMILY-pointer table path; for a multi-table family,
    * call it per table. */
  def vacuumIndex(indexPath: String): Unit = {
    // a FAMILY-governed table must vacuum under the FAMILY lock (the
    // family→table acquisition order everywhere): locking only the table
    // would let a concurrent compactFamily advance the pointer between
    // this resolve and the sweep — the vacuum would silently keep the
    // version it was asked to remove
    val parent = Option(java.nio.file.Paths.get(indexPath).getParent)
      .filter(p => java.nio.file.Files.exists(p.resolve("FAMILY")))
    def body(): Unit = withIndexWriter(indexPath) {
      // crashed-compaction staging debris lives INSIDE the table dir
      // (`_staging__vN_*`) where the `_v<k>`/`batch=*` sweep never matched
      // it (round-12 ADVICE: purged-generation bytes survived the erasure
      // SLA's final step). The writer lock excludes a live compaction, so
      // any staging dir present here is debris by definition.
      val ixp = java.nio.file.Paths.get(indexPath)
      if (java.nio.file.Files.isDirectory(ixp)) {
        val ls = java.nio.file.Files.list(ixp)
        val stale = try ls.iterator().asScala
          .filter(_.getFileName.toString.startsWith("_staging_")).toList
          finally ls.close()
        stale.foreach(p => clearDir(p.toString))
      }
      val cur = resolveIndexDir(indexPath)
      if (cur != indexPath) {
        dedupVersionOf(java.nio.file.Paths.get(cur).getFileName.toString)
          .foreach { committed =>
            // keep = 0: delete every _v<k> with k < committed and the
            // pre-versioning flat batch dirs — an explicit vacuum always
            // sweeps to the current generation, whatever retentionCycles is
            sweepSuperseded(java.nio.file.Paths.get(indexPath), committed,
              dedupVersionOf, _.startsWith("batch="), keep = 0)
          }
      }
    }
    parent match {
      case Some(fam) => withIndexWriter(fam.toString)(body())
      case None => body()
    }
  }

  /** Vacuum EVERY table of a multi-table family NOW — the one-call final
    * step of the family-level erasure SLA (purge → vacuumFamily ⇒ the
    * deleted rows' bytes are gone from disk, including the retained
    * superseded generations and any crashed compaction's staging debris).
    * Takes the family lock for the whole sweep, so a concurrent
    * compaction cannot advance pointers between a table's resolve and its
    * sweep (the [[vacuumIndex]] rationale, family-wide). */
  def vacuumFamily(familyPath: String): Unit = withIndexWriter(familyPath) {
    val root = java.nio.file.Paths.get(familyPath)
    val ls = java.nio.file.Files.list(root)
    val dirs = try ls.iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_)).toList finally ls.close()
    dirs.foreach { d =>
      if (d.getFileName.toString.startsWith("_staging_"))
        clearDir(d.toString) // crashed-loser debris
      else vacuumIndex(d.toString)
    }
  }

  private[graft] def compactBatchedDir(spark: SparkSession, indexPath: String,
      transform: DataFrame => DataFrame = identity,
      extraPartitionCols: Seq[String] = Nil): Unit = withIndexWriter(indexPath) {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Paths.get(indexPath)
    val oldDir = resolveIndexDir(indexPath)
    val oldVersion =
      if (oldDir == indexPath) 0L
      else Paths.get(oldDir).getFileName.toString.stripPrefix("_v").toLong
    val next = oldVersion + 1
    // one shuffle-free rewrite: rows are read and rewritten as-is (schema-
    // generic — whatever the index stores besides the partition column),
    // through the caller's optional transform (e.g. a tombstone anti-join
    // that makes the compaction a physical purge).
    // A retry after a pre-swap crash starts a fresh staging dir; a
    // crashed attempt's _v<next> debris is replaced at promotion time.
    // Rewrite into a PRIVATE staging dir (a racing compaction derives the
    // same _v<next> name; only the CAS winner may touch it)
    val finalDir = root.resolve(s"_v$next")
    val stagingDir = graft.core.OptimisticPointer.stagingFor(finalDir)
    transform(spark.read.parquet(oldDir).drop("batch"))
      .withColumn("batch", lit("base"))
      .write.partitionBy("batch" +: extraPartitionCols: _*).mode("overwrite")
      .parquet(stagingDir.toString)
    // compare-and-swap commit: a concurrent compaction that already moved
    // CURRENT makes this one fail loudly instead of silently superseding a
    // version whose rows this rewrite never read
    try graft.core.OptimisticPointer.casSwap(root, "CURRENT",
      expected = if (oldDir == indexPath) None else Some(s"_v$oldVersion"),
      next = s"_v$next", stage = Some(stagingDir -> finalDir))
    finally if (Files.exists(stagingDir)) { // loser cleans its own staging
      val walk = Files.walk(stagingDir)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
    // retention sweep: keep the immediately superseded layout for
    // in-flight lock-free readers, VACUUM everything older
    // ([[sweepSupersededVersions]])
    sweepSupersededVersions(root, next)
  }

  /** Build (overwrite) a minhash signature index WITHOUT running any dedup —
    * the bootstrap for [[minhashLshIncremental]] when the existing corpus is
    * already clean (running full [[minhashLsh]] just for its index side
    * effect would pay candidate generation + verification for a discarded
    * result). */
  def buildMinhashIndex(
      df: DataFrame,
      id: String,
      text: String,
      indexPath: String,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      batchId: String = "base"): Unit =
    writeIndexBatch(minhashSignatures(df, id, text, shingleK, numHashes, bands),
      indexPath, batchId, wholeIndex = true)

  /** Incremental MinHash dedup — the production daily-batch flow: dedup a
    * NEW batch against (and into) a persisted signature index. Candidates
    * come from bucket collisions within the new batch and between new and
    * indexed docs — never index×index (the indexed corpus is already
    * settled), so per-batch cost scales with the BATCH, not the corpus.
    * Verified pairs are ORIENTED for incremental semantics: a new doc
    * duplicating an indexed doc is always the `drop_id` (the index is
    * canonical regardless of id order); among two new docs the larger id
    * drops. After the pairs are materialized, the new signatures are
    * folded into the index (partition `batch=<batchId>`), so the next batch
    * dedups against this one too.
    *
    * REPLAY-SAFE: `batchId` names the index partition this batch owns. The
    * index read excludes that partition (a replayed batch must not see its
    * own prior signatures — they would flip within-batch keep/drop
    * orientation) and the fold-in overwrites only that partition, so running
    * the same batch twice produces identical pairs, marks, and index
    * contents.
    *
    * @return (keep_id, drop_id, jaccard)
    */
  def minhashLshIncremental(
      newDf: DataFrame,
      id: String,
      text: String,
      indexPath: String,
      batchId: String,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      candidateSink: Option[String] = None): DataFrame = {
    val spark = newDf.sparkSession
    // stage the batch-local signatures OUTSIDE the lock — they read nothing
    // from the index, and a second writer's whole turn should not wait on
    // this batch's heaviest index-independent compute
    val newSig = minhashSignatures(newDf, id, text, shingleK, numHashes, bands).persist()
    newSig.count(): Unit
    withIndexWriter(indexPath) {
    // full-span writer lock from here: candidate generation reads the
    // resolved index files, which a concurrent compaction's cleanup would
    // delete mid-job (the containmentIncremental rationale; result
    // checkpointed before return)
    val oldSig = readIndex(spark, indexPath, excludeBatch = Some(batchId))

    val all = oldSig.withColumn("is_new", lit(false))
      .unionByName(newSig.withColumn("is_new", lit(true)))
    val buckets = all
      .select(struct(col("doc_id"), col("is_new")).as("m"),
        posexplode(col("band_keys")).as(Seq("band", "bkey")))
      .groupBy(col("band"), col("bkey"))
      .agg(collect_list(col("m")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket)) // skew guard

    val candidates = sinkCandidates(taggedPairsFromBuckets(buckets), candidateSink)

    val out = verifyJaccard(candidates, all.select(col("doc_id"), col("hs")), threshold)
      .select(
        when(col("new_a") && !col("new_b"), col("id_b")).otherwise(col("id_a")).as("keep_id"),
        when(col("new_a") && !col("new_b"), col("id_a")).otherwise(col("id_b")).as("drop_id"),
        col("jaccard"))
    // lineage cut BEFORE the fold-in: a re-executable plan would re-read the
    // index after this batch is folded in and see its own docs as "indexed"
    val p = out.localCheckpoint(eager = true)
    writeIndexBatch(newSig, indexPath, batchId)
    newSig.unpersist(false): Unit
    p
    }
  }

  /** Bootstrap a 64-bit signature index (perceptual image hashes,
    * simhashes) WITHOUT running any dedup — the hamming-space
    * [[buildMinhashIndex]]. Rows: `(doc_id, sh)` under `batch=` partitions
    * with the shared CURRENT-pointer versioning. */
  def buildHashIndex(hashed: DataFrame, indexPath: String,
      batchId: String = "base"): Unit =
    writeIndexBatch(hashed.select(col("doc_id"), col("sh")), indexPath,
      batchId, wholeIndex = true)

  private def readHashIndex(spark: SparkSession, indexPath: String,
      excludeBatch: Option[String]): DataFrame = {
    val raw = spark.read.parquet(resolveIndexDir(indexPath))
    excludeBatch.fold(raw)(b => raw.filter(col("batch") =!= lit(b)))
      .select(col("doc_id"), col("sh"))
  }

  /** Incremental hamming-space dedup over a persisted 64-bit signature
    * index — [[minhashLshIncremental]]'s contract for perceptual image
    * hashes, in the SIGNATURE-COLLAPSED form ([[hammingNearDupMarks]]'
    * scale argument, which the first member-level cut of this flow failed
    * at sf1: a new batch near a replica-heavy index cluster expanded
    * against every member — measured 12× on 10× data; this form is bounded
    * by signature diversity). Discovery runs over DISTINCT signatures of
    * new ∪ index, tagged per side; orientation is index-canonical at the
    * group level: a new doc drops iff its sig is in (or within `maxHamming`
    * of) the INDEX, or a smaller-id new doc shares/neighbors its sig —
    * i.e. `in_index(s) ∨ idx_near(s) ∨ x > least(rep(s), nmin(s))`.
    * Exact replicas of index content can never be cap-dropped. The batch's
    * hashes fold into `batch=<batchId>` afterwards; replay-safe via
    * own-partition exclusion + overwrite, like the minhash flow.
    *
    * @param candidateSink oracle fixture: dumps TWO side tables —
    *   `<sink>/sigs` (the tagged signature universe: sh, rep, has_new,
    *   in_index) and `<sink>/pairs` (banded sig-pair candidates
    *   PRE-verification with both sides' tags) — so an external oracle
    *   re-derives hamming, the drop rule, and the marks independently of
    *   the batching.
    * @return (doc_id, sh, is_duplicate) for the NEW docs */
  def hammingIncrementalMarks(
      newHashes: DataFrame, // (doc_id, sh)
      indexPath: String,
      batchId: String,
      bands: Int = 4,
      maxHamming: Int = 3,
      maxBucket: Int = 1000,
      candidateSink: Option[String] = None): DataFrame = withIndexWriter(indexPath) {
    // full-span writer lock — the minhashLshIncremental rationale
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands (got $maxHamming >= $bands)")
    val spark = newHashes.sparkSession
    val oldSig = readHashIndex(spark, indexPath, excludeBatch = Some(batchId))
    // null signatures pass through as is_duplicate=false (hammingNearDupMarks'
    // rule): they'd be silently dropped by the non-null-safe sig joins below,
    // and never belong in the signature index.
    val newAll = newHashes.select(col("doc_id"), col("sh"))
    val newNullSig = newAll.where(col("sh").isNull)
      .select(col("doc_id"), col("sh"), lit(false).as("is_duplicate"))
    val newSig0 = newAll.where(col("sh").isNotNull).persist()
    newSig0.count(): Unit
    // third oracle side table: WHICH docs this batch processed (file-split
    // batching is nondeterministic, so the doc→batch map must be a fixture)
    val newSig = sinkCandidates(newSig0, candidateSink.map(p => s"$p/docs"))

    // one row per DISTINCT signature across both sides, side-tagged; an
    // index sig carries rep = Long.MaxValue so `least` ignores it
    val u0 = newSig.groupBy("sh").agg(min(col("doc_id")).as("rep"))
      .select(col("sh"), col("rep"), lit(true).as("has_new"), lit(false).as("in_index"))
      .unionByName(oldSig.select(col("sh")).distinct()
        .select(col("sh"), lit(Long.MaxValue).as("rep"),
          lit(false).as("has_new"), lit(true).as("in_index")))
      .groupBy("sh").agg(min(col("rep")).as("rep"),
        max(col("has_new")).as("has_new"), max(col("in_index")).as("in_index"))
    val u = sinkCandidates(u0, candidateSink.map(p => s"$p/sigs")).persist()
    u.count(): Unit

    val buckets = u
      .select(col("sh"), explode(simhashBands(col("sh"), bands)).as("b"))
      .groupBy(col("b")).agg(collect_list(col("sh")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket)) // diversity cap
    val sp0 = pairsFromBuckets(buckets)
      .join(u.select(col("sh").as("id_a"), col("has_new").as("new_a"),
        col("in_index").as("idx_a"), col("rep").as("rep_a")), Seq("id_a"))
      .join(u.select(col("sh").as("id_b"), col("has_new").as("new_b"),
        col("in_index").as("idx_b"), col("rep").as("rep_b")), Seq("id_b"))
      .filter(col("new_a") || col("new_b"))
    val sp = sinkCandidates(sp0, candidateSink.map(p => s"$p/pairs"))
      .filter(hamming64(col("id_a"), col("id_b")) <= maxHamming)

    // per new sig: did ANY neighbor sit in the index; min rep among NEW neighbors
    val nbr = sp.select(col("id_a").as("sh"), col("idx_b").as("n_idx"),
        when(col("new_b"), col("rep_b")).as("n_rep"))
      .unionAll(sp.select(col("id_b").as("sh"), col("idx_a").as("n_idx"),
        when(col("new_a"), col("rep_a")).as("n_rep")))
      .groupBy("sh").agg(max(col("n_idx")).as("idx_near"), min(col("n_rep")).as("nmin"))

    val out = newSig
      .join(u.select(col("sh"), col("rep"), col("in_index")), Seq("sh"))
      .join(nbr, Seq("sh"), "left")
      .select(col("doc_id"), col("sh"),
        (col("in_index") || coalesce(col("idx_near"), lit(false)) ||
          col("doc_id") > least(col("rep"), coalesce(col("nmin"), col("rep"))))
          .as("is_duplicate"))
      .unionAll(newNullSig)
    // lineage cut BEFORE the fold-in (the minhashLshIncremental rationale)
    val p = out.localCheckpoint(eager = true)
    writeIndexBatch(newSig, indexPath, batchId)
    newSig0.unpersist(false): Unit
    u.unpersist(false): Unit
    p
  }

  /** Tagged pair expansion for the incremental flows: `buckets.ids` holds
    * struct(doc_id, is_new) members; structs sort by (doc_id, is_new) so
    * pairs come out id-ordered. Pairs with no new member are dropped (the
    * indexed corpus is already settled — never index×index), and id_a==id_b
    * self-pairs are dropped as defense in depth: the partition-exclusion
    * read already hides a replayed batch's own prior index rows, but an
    * operator folding the same DOCS under a fresh batchId would otherwise
    * collide every doc with its own entry and mark the whole batch
    * duplicate. */
  private def taggedPairsFromBuckets(buckets: DataFrame): DataFrame =
    buckets
      .select(array_sort(col("ids")).as("s"))
      .select(graft.functions.SortedPairs(col("s")).as(Seq("__a", "__b")))
      .select(col("__a.doc_id").as("id_a"), col("__b.doc_id").as("id_b"),
        col("__a.is_new").as("new_a"), col("__b.is_new").as("new_b"))
      .filter(col("new_a") || col("new_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()

  /** Per-new-doc keep/drop marks from [[minhashLshIncremental]] pairs.
    * Drop-id set broadcast for the same reason as [[marksFromPairs]]. */
  def incrementalMarks(newDocs: DataFrame, id: String, pairs: DataFrame): DataFrame =
    newDocs.select(col(id).as("doc_id"))
      .join(broadcast(pairs.select(col("drop_id").as("doc_id")).distinct()
        .withColumn("is_duplicate", lit(true))), Seq("doc_id"), "left")
      .withColumn("is_duplicate", coalesce(col("is_duplicate"), lit(false)))

  /** SimHash near-dup pairs: 64-bit simhash, banded into `bands` segments —
    * any pair within hamming distance < `bands` shares at least one exact
    * band (pigeonhole), so the bucket expansion finds all of them PROVIDED
    * that shared band's bucket is within `maxBucket`. The cap is the skew
    * guard every banded-LSH pass needs at scale: a >maxBucket bucket means
    * thousands of near-identical banded values (templated content), which
    * exact dedup should collapse FIRST — pairs inside dropped buckets are
    * not emitted, the trade documented rather than hidden.
    *
    * @param candidateSink oracle fixture: dump candidates WITH both simhash
    *   values (pre-hamming-filter), so the oracle re-derives the hamming
    *   distance, the filter, and the marks independently. */
  def simhash(
      df: DataFrame,
      id: String,
      text: String,
      bands: Int = 4,
      maxHamming: Int = 3,
      maxBucket: Int = 1000,
      candidateSink: Option[String] = None): DataFrame = {

    // token hashes materialized first — inside simhash's per-bit vote lambda
    // the string hash would otherwise be recomputed once per bit (64×)
    val withHash = df.select(col(id).as("doc_id"), wsTokens(lower(col(text))).as("toks"))
      .withColumn("th", simhashTokenHashes(col("toks")))
      .select(col("doc_id"), simhash64FromHashes(col("th")).as("sh"))
    hammingNearDupPairs(withHash, bands, maxHamming, maxBucket, candidateSink)
  }

  /** Banded-hamming near-dup pair generation over ANY 64-bit signature
    * column — the [[simhash]] core factored out so other hamming-space
    * signatures (e.g. [[graft.multimodal.Multimodal.dHash63]] perceptual
    * image hashes) reuse the identical scale shape: one groupBy shuffle of
    * narrow (band, id) rows, in-place pair expansion under the skew cap,
    * exact `bit_count(xor)` verification on candidates only. Input:
    * `(doc_id, sh: long)`. Returns verified `(id_a, id_b, hamming)` pairs
    * with id_a < id_b. */
  def hammingNearDupPairs(
      hashed: DataFrame,
      bands: Int = 4,
      maxHamming: Int = 3,
      maxBucket: Int = 1000,
      candidateSink: Option[String] = None): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands (got $maxHamming >= $bands)")
    val withHash = hashed.select(col("doc_id"), col("sh")).persist()
    withHash.count(): Unit

    val buckets = withHash
      .select(col("doc_id"), explode(simhashBands(col("sh"), bands)).as("b"))
      .groupBy(col("b")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket)) // skew guard

    val cand0 = pairsFromBuckets(buckets)
      .join(withHash.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withHash.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    val candidates = sinkCandidates(cand0, candidateSink)

    val out = candidates
      .select(col("id_a"), col("id_b"), hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    eager(out, () => { withHash.unpersist(false): Unit })
  }

  /** Character n-gram Jaccard near-dup pairs. Candidate generation via
    * sampled-ngram inverted index (only every `sampleMod`-th ngram by hash —
    * keeps the index linear in corpus size), verification on full ngram sets. */
  def ngramJaccard(
      df: DataFrame,
      id: String,
      text: String,
      n: Int = 8,
      threshold: Double = 0.5,
      sampleMod: Int = 8,
      maxBucket: Int = 1000,
      minMatch: Int = 1): DataFrame = {

    // grams string-hashed ONCE into `hs`: the inverted index explodes the
    // hashes directly and the exact-Jaccard verification intersects the same
    // long arrays — no string set ever shuffles or persists. Ids-only through
    // the bucket expansion + dedup (same rationale as minhashLsh).
    val grams = df.select(col(id).as("doc_id"), lower(col(text)).as("__lt"))
      .select(col("doc_id"),
        // sorted+distinct: SortedIntersectSize contract (see minhash build);
        // fused single-pass hashing (HashedShingles, bit-identical)
        HashedShingles.hashedCharNgrams(col("__lt"), n,
          HashedShingles.KindXx64, 17L, distinct = true, sorted = true).as("hs"))
      .persist()
    grams.count(): Unit

    val buckets = grams
      .select(col("doc_id"), explode(col("hs")).as("gh"))
      .filter(pmod(col("gh"), lit(sampleMod.toLong)) === 0)
      .groupBy(col("gh")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket)) // document-frequency cap / skew guard

    val candidates = pairsFromBuckets(buckets, minMatch)

    val out = verifyJaccard(candidates, grams, threshold)
    eager(out, () => { grams.unpersist(false): Unit })
  }

  /** Set-similarity join by PREFIX FILTERING (AllPairs/PPJoin — Bayardo
    * et al. WWW'07, Xiao et al. WWW'08): the LOSSLESS alternative to the
    * sampled inverted index in [[ngramJaccard]]. Order every doc's gram
    * set by a global total order (document frequency ascending, gram
    * ascending — rarest first) and index only the first
    * p = |x| − ceil(t·|x|) + 1 grams: any pair with Jaccard ≥ t must
    * share its MINIMAL common gram, which pigeonhole forces into both
    * prefixes — so the prefix-only inverted index finds every qualifying
    * pair, no sampling recall risk. Two further lossless prunes run
    * before verification:
    *   - length filter: J ≥ t ⇒ td·min(|a|,|b|) ≥ tn·max(|a|,|b|);
    *   - PPJoin position filter: all common grams sort after the minimal
    *     one, so overlap ≤ 1 + min(|a|−i, |b|−j) at the first collision
    *     positions (i, j) — require that to reach the needed overlap
    *     ceil(tn·(|a|+|b|)/(tn+td)).
    * The threshold is a RATIONAL tn/td so every prune AND the final
    * verification compare in exact integer algebra, mirrored exactly by
    * the oracle (boundary pairs with td·inter == tn·(tot−inter) are kept
    * identically on both engines — no fp rounding in the decision).
    * "Lossless" is exact up to token-hash merges: see the 60-bit token
    * note below (~n²/2⁶¹ residual recall risk, oracle-mirrored).
    *
    * At scale: rarest-first ordering makes prefix buckets intrinsically
    * small (the df-hot grams sit outside every prefix), `maxBucket` still
    * guards adversarial floods, and candidates are ids+positions only.
    * Grams travel as strings here so an external engine can replay the
    * (df, gram) order bit-for-bit; swap the order key to
    * `xxhash64Seeded(df, gram)` in production to shuffle 8-byte longs
    * instead — any total order preserves the guarantee.
    *
    * Candidate-tail lever (`prefixDfFloor`, opt-in, LOSSY): drop candidate
    * buckets whose gram's GLOBAL document frequency exceeds the floor.
    * Recall caveat, stated exactly: a qualifying pair is missed iff EVERY
    * prefix gram the two docs share has df > floor — i.e. the pair shares
    * not one sufficiently-rare gram. Measured on the shipped sf0.1 corpus
    * (MeasureQ127, BASELINE.md): floor=50 keeps all 256/256 verified pairs
    * but cuts candidates only 1.1× (199k→189k — the tail here is MANY
    * mid-df buckets, not a few template ones); floor=20 cuts 2.3×
    * (199k→85k) at 253/256 recall. Same measurement's larger finding:
    * candidate count is NOT this operator's wall-clock driver at these
    * scales — verification is an integer merge walk (~µs/pair), so ±50%
    * candidates moves wall time inside noise, and the fixed stages
    * (per-gram md5 token derivation, df aggregation, prefix sort) dominate.
    * The floor is therefore a SHUFFLE-VOLUME guard for corpora whose
    * bucket-pair tail genuinely explodes, not a latency tune. The PPJoin+
    * SUFFIX filter (Xiao et al. 2008) — the lossless candidate cutter — is
    * deliberately absent: it needs random access to both docs' suffix
    * windows at pair time, and shipping those into the candidate rows
    * costs more payload than the verification arrays it would save, while
    * a single-median quantile bound (which WOULD fit in the rows) provably
    * cannot separate candidates whose token ranges coincide — exactly the
    * shape of this corpus's false candidates.
    *
    * @param candidateSink oracle/measurement fixture: dump candidate id
    *   pairs (post-prune, pre-verify) and read them back (q13 contract)
    * @return verified pairs (id_a, id_b, jaccard ≥ tn/td)
    */
  def prefixFilterJaccard(
      df: DataFrame,
      id: String,
      text: String,
      n: Int = 8,
      thresholdNum: Int = 4,
      thresholdDen: Int = 5,
      maxBucket: Int = 200,
      prefixDfFloor: Option[Long] = None,
      candidateSink: Option[String] = None): DataFrame = {
    require(0 < thresholdNum && thresholdNum <= thresholdDen, "need 0 < tn/td <= 1")
    val (tn, td) = (lit(thresholdNum.toLong), lit(thresholdDen.toLong))

    // token = 60-bit md5 prefix of the gram (15 hex chars — the widest
    // md5 prefix that still fits a signed BIGINT on every engine):
    // ENGINE-PORTABLE (an external oracle replays the identical ids), and
    // 8-byte longs — not gram strings — are what every downstream shuffle
    // moves. A hash-merge of two grams is NOT recall-neutral: merging two
    // grams common to both docs shrinks the hashed intersection relative
    // to the hashed union, so a pair at true J ≥ t can in principle be
    // pruned before the 64-bit verification ever sees it. At 60 bits that
    // residual recall risk is ~n²/2⁶¹ per corpus — below any realistic
    // noise floor (and mirrored identically by the oracle, which replays
    // the same 60-bit ids).
    // fused single-pass ngram hashing (HashedShingles, bit-identical to the
    // transform/array_distinct/array_sort composition it replaced — r12-opt:
    // the substring-array materialization was the pipeline's largest fixed
    // stage, 2.4 s of the 3.4 s token pass at sf0.1)
    val gr = df.select(col(id).as("doc_id"), lower(col(text)).as("__lt"))
      .select(col("doc_id"),
        HashedShingles.hashedCharNgrams(col("__lt"), n,
          HashedShingles.KindMd5Prefix60, 0L, distinct = true, sorted = false).as("toks"),
        HashedShingles.hashedCharNgrams(col("__lt"), n,
          HashedShingles.KindXx64, 17L, distinct = true, sorted = true).as("hs"))
      .persist()
    gr.count(): Unit
    val sets = gr.select(col("doc_id"), col("hs"))

    val toks = gr.select(col("doc_id"), size(col("toks")).as("sz"),
      explode(col("toks")).as("tok"))
    // document frequency per token: the global order key. Size-gated
    // broadcast (sizeGatedDfs): AQE's 10 MB runtime threshold flips this
    // to sort-merge exactly when the corpus grows, shuffling the full
    // exploded occurrence stream; past the 256 MB cap the exchange is the
    // honest plan (the 100 TB case).
    val dfs = toks.groupBy("tok").agg(count(lit(1)).as("df")).persist()
    val dfsG = sizeGatedDfs(dfs)
    // per-doc (df, tok)-sorted prefix, sliced IN PLACE (one doc-keyed
    // shuffle; no row_number window pass), then positions via posexplode
    val prefix = toks.join(dfsG, "tok")
      .groupBy("doc_id", "sz")
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ord"))
      // prefix length p = sz − ceil(tn·sz/td) + 1; integer `div`, not
      // double `/`: the double quotient's truncation is only exact to 2⁵³
      // and this ceil must match the oracle's integer `//` bit-for-bit
      .select(col("doc_id"), col("sz"),
        posexplode(slice(transform(col("ord"), s => s.getField("tok")), lit(1),
          expr(s"CAST(sz - ($thresholdNum * sz + $thresholdDen - 1)" +
            s" div $thresholdDen + 1 AS INT)"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("sz"), (col("pos") + 1).as("rn"), col("tok"))

    val bucketsAll = prefix
      .groupBy("tok")
      .agg(collect_list(struct(col("doc_id"), col("sz"), col("rn"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket)) // skew guard
    // df-floor: one narrow left-semi against the (tok, df) table already in
    // hand — entire template buckets vanish before any pair is expanded
    val buckets = prefixDfFloor match {
      case Some(f) =>
        bucketsAll.join(dfsG.filter(col("df") <= f).select("tok"), Seq("tok"), "left_semi")
      case None => bucketsAll
    }

    // pair expansion in place (structs sort by doc_id first); BOTH lossless
    // prunes run per collision BEFORE the pair distinct, so the heavy
    // distinct only sees survivors. Per-collision position pruning is
    // lossless because a qualifying pair's minimal common token collides
    // at the pair's smallest (rn_a, rn_b) — the row with the LARGEST
    // position bound — and that bound must clear the required overlap.
    val candidates = buckets
      .select(array_sort(col("ids")).as("s"))
      .select(graft.functions.SortedPairs(col("s")).as(Seq("__a", "__b")))
      .select(
        col("__a.doc_id").as("id_a"), col("__b.doc_id").as("id_b"),
        col("__a.sz").as("sz_a"), col("__b.sz").as("sz_b"),
        col("__a.rn").as("rn_a"), col("__b.rn").as("rn_b"))
      // length filter: J ≥ tn/td ⇒ td·min ≥ tn·max
      .filter(td * least(col("sz_a"), col("sz_b")) >=
        tn * greatest(col("sz_a"), col("sz_b")))
      // position filter: overlap ≤ 1 + min(sz_a − rn_a, sz_b − rn_b) must
      // reach ceil(tn·(sz_a+sz_b)/(tn+td)) — integer `div` for the same
      // exact-ceil reason as the prefix slice
      .filter(lit(1) + least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b")) >=
        expr(s"($thresholdNum * (sz_a + sz_b) + ${thresholdNum + thresholdDen} - 1)" +
          s" div ${thresholdNum + thresholdDen}"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    val out = verifyJaccard(sinkCandidates(candidates, candidateSink), sets,
      thresholdNum.toDouble / thresholdDen,
      rational = Some((thresholdNum, thresholdDen)))
    eager(out, () => { gr.unpersist(false): Unit; dfs.unpersist(false): Unit })
  }

  /** CONTAINMENT (quote-inclusion) join: ordered pairs (container a,
    * contained b) with C(b⊆a) = |A∩B| / |B| ≥ tn/td over word-`k`-shingle
    * sets — the asymmetric relation Jaccard dedup is BLIND to (a long doc
    * quoting a short one wholesale has tiny Jaccard but containment 1.0;
    * Lee et al. '22's motivating case for substring-level dedup, and the
    * containment-join problem of Zhu et al.'s LSH Ensemble, VLDB'16 —
    * done here EXACTLY, prefix-filtered instead of approximated).
    *
    * The asymmetry changes the prefix algebra ([[prefixFilterJaccard]]'s
    * symmetric form doesn't apply): the required overlap α = ceil(tn·|B|/td)
    * depends on B ALONE, so pigeonhole prunes only the CONTAINED side —
    * B emits its first |B| − α + 1 tokens in the global (df asc, token asc)
    * order, while the container side must index ALL its tokens (a container
    * has no size-derived prefix bound: any |A| ≥ α qualifies). Lossless
    * prunes per collision, in exact integer algebra:
    *   - length: |A∩B| ≤ |A| needs td·|A| ≥ tn·|B|;
    *   - position (PPJoin adapted): at the minimal common token's collision
    *     (rn_a, rn_b), overlap ≤ 1 + min(|A|−rn_a, |B|−rn_b) must reach α.
    * Verification is the exact [[SortedIntersectSize]] merge walk; the
    * decision td·inter ≥ tn·|B| is pure long algebra (boundary pairs kept
    * identically by the integer-exact oracle).
    *
    * At scale: candidate volume is driven by the CONTAINER-side posting
    * lists (all tokens, not prefixes), so `maxPostings` is the load-bearing
    * skew guard — a token with more than `maxPostings` container entries is
    * template chrome whose bucket is dropped whole (documented recall knob,
    * the [[simhash]] maxBucket trade: a pair is missed iff EVERY prefix
    * token of the contained doc is that hot). Everything that shuffles is
    * 8-byte token ids + positions; text never enters an exchange.
    *
    * @param minSize contained docs need ≥ this many distinct shingles (a
    *   1-shingle doc is "contained" everywhere its shingle occurs — true
    *   but useless; the floor keeps the relation meaningful)
    * @param candidateSink oracle/measurement fixture (q13 contract)
    * @return (container_id, contained_id, inter, sz_contained, containment)
    */
  def containmentJoin(
      df: DataFrame,
      id: String,
      text: String,
      k: Int = 3,
      thresholdNum: Int = 9,
      thresholdDen: Int = 10,
      minSize: Int = 5,
      maxPostings: Int = 200,
      candidateSink: Option[String] = None): DataFrame = {
    val (out, release) = containmentJoinStaged(df, id, text, k, thresholdNum,
      thresholdDen, minSize, maxPostings, candidateSink)
    eager(out, release)
  }

  /** [[containmentJoin]] WITHOUT the lineage cut — the plan-auditable form
    * (the q76/q78 Staged contract: the public method checkpoints, which
    * collapses the executed plan to an RDD scan). Caller must invoke the
    * release thunk when done. */
  private[graft] def containmentJoinStaged(
      df: DataFrame, id: String, text: String, k: Int = 3,
      thresholdNum: Int = 9, thresholdDen: Int = 10, minSize: Int = 5,
      maxPostings: Int = 200,
      candidateSink: Option[String] = None): (DataFrame, () => Unit) = {
    require(0 < thresholdNum && thresholdNum <= thresholdDen, "need 0 < tn/td <= 1")
    val (tn, td) = (thresholdNum.toLong, thresholdDen.toLong)

    val gr = containmentSets(df, id, text, k).persist()
    gr.count(): Unit
    val sets = gr.select(col("doc_id"), col("hs"))

    val toks = gr.select(col("doc_id"), size(col("toks")).as("sz"),
      explode(col("toks")).as("tok"))
    val dfs = toks.groupBy("tok").agg(count(lit(1)).as("df")).persist()
    val ranked = containmentRanked(gr, sizeGatedDfs(dfs))
      .withColumn("is_pref", containmentPrefixPred(thresholdNum, thresholdDen, minSize))
      .withColumn("is_new", lit(true)) // one-shot: everything is "new"

    val candidates = containmentCandidates(ranked, thresholdNum, thresholdDen,
        maxPostings, requireNew = false)
      .select(col("id_a"), col("id_b"))

    val verified = containmentVerify(
      sinkCandidates(candidates, candidateSink), sets, tn, td)
    (verified, () => { gr.unpersist(false): Unit; dfs.unpersist(false): Unit })
  }

  /** Shared shingle frame of the containment family: `(doc_id, toks, hs)` —
    * 60-bit md5 token ids (engine-portable) for candidate generation, a
    * sorted 64-bit xxhash space for verification (the prefixFilterJaccard
    * contract, same ~n²/2⁶¹ hash-merge caveat, oracle-mirrored). */
  private def containmentSets(df: DataFrame, id: String, text: String,
      k: Int): DataFrame =
    df.select(col(id).as("doc_id"), lower(col(text)).as("__lt"))
      .filter(length(trim(col("__lt"))) > 0)
      // fused single-pass shingle hashing (HashedShingles): equal to the old
      // distinct-strings-then-hash form because distinct∘hash∘distinct ≡
      // distinct∘hash element-for-element (first-occurrence order both ways)
      .select(col("doc_id"), wsTokens(col("__lt")).as("__toks"))
      .select(col("doc_id"),
        HashedShingles.hashedWordShingles(col("__toks"), k,
          HashedShingles.KindMd5Prefix60, 0L, distinct = true, sorted = false).as("toks"),
        HashedShingles.hashedWordShingles(col("__toks"), k,
          HashedShingles.KindXx64, 17L, distinct = true, sorted = true).as("hs"))

  /** Broadcast cap for the (tok, df) order-key table of the prefix-filter
    * family, env-overridable (the [[graft.similarity.Similarity]]
    * `sizeGatedVecs` pattern). Defensive parse, and LAZY like
    * [[CodebookLiteralMaxBytes]]: an operator typo must fail loudly at
    * first use with a message naming the env var — an eager val would
    * surface it as an opaque ExceptionInInitializerError taking down all
    * of Dedup. */
  private[graft] lazy val DfsBroadcastMaxBytes: Long =
    sys.env.get("SPARK_GRAFT_DFS_BROADCAST_MAX_BYTES") match {
      case Some(s) => s.trim.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"SPARK_GRAFT_DFS_BROADCAST_MAX_BYTES must be a plain byte count, got '$s'"))
      case None => 256L << 20
    }

  /** Size-gate the df-annotation join's (tok, df) side. The occurrence
    * stream is O(corpus tokens) rows while the df table is O(vocabulary) —
    * sublinear in the corpus by Heaps' law — so letting Catalyst pick by
    * its 10 MB default flips the annotation join to sort-merge exactly when
    * the corpus grows, shuffling AND sorting the full exploded occurrence
    * stream (measured on the sf10 decade: q208's 20× wall on 10× data).
    * Broadcast up to the cap (~4.8M tokens at the 256 MB default); past it
    * — a vocabulary that genuinely outgrows executor memory — the exchange
    * is the honest plan. Callers persist `dfs` first so the gating count
    * doubles as the materialization. */
  private def sizeGatedDfs(dfs: DataFrame): DataFrame = {
    val bytes = dfs.count() * 56L // two longs + UnsafeRow/map overhead
    if (bytes <= DfsBroadcastMaxBytes) broadcast(dfs) else dfs
  }

  /** Per-doc (df, tok)-sorted positions, sliced in place (one doc-keyed
    * shuffle, no window pass). `dfs` is left-joined with df = 0 for tokens
    * it has never seen — the incremental path probes a FROZEN order, and an
    * unseen token is by definition the rarest thing possible. */
  private def containmentRanked(gr: DataFrame, dfs: DataFrame): DataFrame =
    gr.select(col("doc_id"), size(col("toks")).as("sz"),
        explode(col("toks")).as("tok"))
      .join(dfs, Seq("tok"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .groupBy("doc_id", "sz")
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ord"))
      .select(col("doc_id"), col("sz"),
        posexplode(transform(col("ord"), s => s.getField("tok"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("sz"), (col("pos") + 1).as("rn"), col("tok"))

  /** Contained-side prefix predicate: rn ≤ sz − α + 1, α = ceil(tn·sz/td)
    * via integer div (must match the oracle's `//` bit-for-bit). The
    * pigeonhole guarantee holds under ANY fixed token order (overlap ≥ α
    * means at most sz − α tokens are missed, so every (sz − α + 1)-subset
    * holds a common one) — df-ascending is purely the bucket-size
    * optimization, which is what makes FROZEN index orders lossless. */
  private def containmentPrefixPred(tn: Int, td: Int, minSize: Int): Column =
    col("sz") >= minSize &&
      col("rn") <= col("sz") - expr(s"($tn * sz + ${td - 1}) div $td") + 1

  /** Token-bucketed contained-prefix × container expansion with the
    * lossless length and position prunes applied per collision, before the
    * pair distinct. Input: `(doc_id, sz, rn, tok, is_pref, is_new)`.
    * Returns `(id_a container, id_b contained, new_a, new_b)`. */
  private def containmentCandidates(ranked: DataFrame, tn: Int, td: Int,
      maxPostings: Int, requireNew: Boolean): DataFrame = {
    // one bucket row per token: the full posting list (container side) and
    // the prefix sublist (contained side); collect_list skips the nulls the
    // unfired `when` leaves, so the prefix list is exactly the marked rows
    val buckets = ranked
      .groupBy("tok")
      .agg(collect_list(struct(col("doc_id"), col("sz"), col("rn"),
          col("is_new"))).as("all_ids"),
        collect_list(when(col("is_pref"), struct(col("doc_id"), col("sz"),
          col("rn"), col("is_new")))).as("pref_ids"))
      .filter(size(col("pref_ids")) >= 1 && size(col("all_ids")) >= 2 &&
        size(col("all_ids")) <= maxPostings) // skew guard (recall knob)

    buckets
      // r13-opt: streaming cross-pair generator (prefix member × posting
      // list) instead of the nested transform+flatten+explode chain — same
      // pairs in the same outer-major order, no O(pref·postings)
      // intermediate arrays (bit-identity pinned in SortedPairsSpec)
      .select(graft.functions.CrossPairs(col("pref_ids"), col("all_ids"))
        .as(Seq("__b", "__a")))
      .select(
        col("__a.doc_id").as("id_a"), col("__b.doc_id").as("id_b"),
        col("__a.sz").as("sz_a"), col("__b.sz").as("sz_b"),
        col("__a.rn").as("rn_a"), col("__b.rn").as("rn_b"),
        col("__a.is_new").as("new_a"), col("__b.is_new").as("new_b"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(if (requireNew) col("new_a") || col("new_b") else lit(true))
      // length filter: the container must be at least the required overlap
      .filter(lit(td.toLong) * col("sz_a") >= lit(tn.toLong) * col("sz_b"))
      // position filter: remaining capacity at this collision must reach α
      .filter(lit(1) + least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b")) >=
        expr(s"($tn * sz_b + ${td - 1}) div $td"))
      .select(col("id_a"), col("id_b"), col("new_a"), col("new_b"))
      .distinct()
  }

  /** Exact verification: SortedIntersectSize over the xxhash sets, pure
    * long-algebra decision. Extra candidate columns pass through. */
  private def containmentVerify(candidates: DataFrame, sets: DataFrame,
      tn: Long, td: Long): DataFrame = {
    val extra = candidates.columns.filterNot(Set("id_a", "id_b")).toSeq.map(col)
    candidates
      .join(sets.select(col("doc_id").as("id_a"), col("hs").as("h_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("hs").as("h_b")), Seq("id_b"))
      .select(Seq(col("id_a"), col("id_b")) ++ extra ++ Seq(
        SortedIntersectSize(col("h_a"), col("h_b")).cast("long").as("inter"),
        size(col("h_b")).cast("long").as("sz_contained")): _*)
      .filter(col("inter") * td >= col("sz_contained") * tn)
      .select(Seq(col("id_a").as("container_id"), col("id_b").as("contained_id")) ++
        extra ++ Seq(col("inter"), col("sz_contained"),
        round(col("inter").cast("double") / col("sz_contained").cast("double"), 6)
          .as("containment")): _*)
  }

  /** Bootstrap a persisted CONTAINMENT index without running any join: the
    * base corpus's token positions (under its own frozen (df, tok) order),
    * verification sets, and the frozen df table itself —
    * [[containmentIncremental]] probes new batches against all three.
    *
    *   tok/   (doc_id, sz, rn, tok)  — positions under the FROZEN order
    *   sets/  (doc_id, hs)           — sorted xxhash verification sets
    *   dfs/   (tok, df)              — the order key, frozen at build
    *
    * Freezing the order is CORRECT, not approximate: the prefix pigeonhole
    * holds under any fixed total order (see [[containmentPrefixPred]]);
    * df drift only degrades bucket sizes. Rebuild to refresh — the
    * frozen-centroid caveat of [[buildSemanticIndex]], same operational
    * answer. Thresholds are NOT baked into the index: prefixes derive from
    * stored (rn, sz) at query time, so one index serves any tn/td/minSize. */
  def buildContainmentIndex(df: DataFrame, id: String, text: String,
      indexPath: String, k: Int = 3): Unit = {
    val gr = containmentSets(df, id, text, k).persist()
    gr.count(): Unit
    val dfs = gr.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .persist()
    dfs.count(): Unit
    val ranked = containmentRanked(gr, sizeGatedDfs(dfs))
    withIndexWriter(indexPath) {
      inParallel(Seq(
        () => writeIndexBatch(ranked.select(col("doc_id"), col("sz"), col("rn"),
          col("tok")), s"$indexPath/tok", "base", wholeIndex = true),
        () => writeIndexBatch(gr.select(col("doc_id"), col("hs")),
          s"$indexPath/sets", "base", wholeIndex = true),
        () => writeIndexBatch(dfs, s"$indexPath/dfs", "base", wholeIndex = true)))
      // (re)start the batch-visibility manifest: an incremental batch's tok
      // and sets partitions become readable atomically, at commitVisibleBatch
      resetVisibleBatches(indexPath)
    }
    dfs.unpersist(false): Unit
    gr.unpersist(false): Unit
  }

  /** Incremental CONTAINMENT — the daily-batch quote detector, mirroring
    * [[minhashLshIncremental]]: the new batch is ranked under the FROZEN
    * index order (unseen tokens get df = 0 — the rarest thing possible),
    * candidates are every contained-prefix × container collision with AT
    * LEAST ONE NEW side (never index×index — the indexed corpus is
    * settled), verification is exact, and the batch folds into
    * `tok/batch=` + `sets/batch=` partitions (replay-safe via the
    * partition-exclusion read + dynamic partition overwrite). Both
    * directions surface in one pass: indexed content resurfacing inside a
    * new composite (new_container = true, the new doc quotes the corpus)
    * AND a new fragment that indexed content already subsumes
    * (new_contained = true — "this is a slice of something we have").
    *
    * @return (container_id, contained_id, new_container, new_contained,
    *         inter, sz_contained, containment)
    */
  def containmentIncremental(
      newDf: DataFrame,
      id: String,
      text: String,
      indexPath: String,
      batchId: String,
      k: Int = 3,
      thresholdNum: Int = 9,
      thresholdDen: Int = 10,
      minSize: Int = 5,
      maxPostings: Int = 200,
      candidateSink: Option[String] = None): DataFrame = withIndexWriter(indexPath) {
    // full-span writer lock (reads included): candidates and verification
    // read the resolved index layout's files, which a concurrent
    // compaction's post-flip cleanup would delete mid-job; the result is
    // checkpointed before return, so the lock covers every index read
    require(0 < thresholdNum && thresholdNum <= thresholdDen, "need 0 < tn/td <= 1")
    val spark = newDf.sparkSession
    val (tn, td) = (thresholdNum.toLong, thresholdDen.toLong)

    val frozenDfs = readVisibleTable(spark, indexPath, "dfs")
      .select(col("tok"), col("df"))
    val oldTok = readVisibleTable(spark, indexPath, "tok", Some(batchId))
      .select(col("doc_id"), col("sz"), col("rn"), col("tok"))
    val oldSets = readVisibleTable(spark, indexPath, "sets", Some(batchId))
      .select(col("doc_id"), col("hs"))

    val newGr = containmentSets(newDf, id, text, k).persist()
    newGr.count(): Unit
    // frozen order key: size-gated broadcast (parquet count ≈ free); a
    // steady-state batch is small while the index vocabulary keeps growing
    val newRanked = containmentRanked(newGr, sizeGatedDfs(frozenDfs)).persist()
    newRanked.count(): Unit

    // every candidate collides on a token the NEW batch carries (both
    // directions need one new side at the same token), so the index scan
    // prunes to the new batch's vocabulary first — per-batch cost follows
    // the BATCH, not the accumulated index (the minhash-incremental
    // "new×(new∪index) only" principle). Lossless: a pruned token's bucket
    // could only pair old×old, which requireNew drops anyway.
    val newToks = newRanked.select(col("tok")).distinct()
    val all = oldTok.join(newToks, Seq("tok"), "left_semi")
      .withColumn("is_new", lit(false))
      .unionByName(newRanked.withColumn("is_new", lit(true)))
      .withColumn("is_pref", containmentPrefixPred(thresholdNum, thresholdDen, minSize))
    val candidates = containmentCandidates(all, thresholdNum, thresholdDen,
      maxPostings, requireNew = true)

    val sets = oldSets.unionByName(newGr.select(col("doc_id"), col("hs")))
    val verified = containmentVerify(
        sinkCandidates(candidates, candidateSink), sets, tn, td)
      .withColumnRenamed("new_a", "new_container")
      .withColumnRenamed("new_b", "new_contained")
      .select(col("container_id"), col("contained_id"),
        col("new_container"), col("new_contained"),
        col("inter"), col("sz_contained"), col("containment"))

    // lineage cut BEFORE the fold-in (the minhashLshIncremental rationale)
    val p = verified.localCheckpoint(eager = true)
    inParallel(Seq(
      () => writeIndexBatch(newRanked.select(col("doc_id"), col("sz"),
        col("rn"), col("tok")), s"$indexPath/tok", batchId),
      () => writeIndexBatch(newGr.select(col("doc_id"), col("hs")),
        s"$indexPath/sets", batchId)))
    // atomic visibility: a batch's postings and its hash sets fold in
    // together — a torn fold can no longer surface collisions whose
    // verification sets are missing (the whole function holds the family
    // writer lock)
    commitVisibleBatch(indexPath, batchId)
    newRanked.unpersist(false): Unit
    newGr.unpersist(false): Unit
    p
  }

  /** Fold the containment index's per-batch partitions into one `base`
    * generation under a new version dir, all three tables committed by ONE
    * family CAS ([[compactFamily]] — tok/sets/dfs can never serve at mixed
    * versions). The frozen dfs table compacts too (it is single-batch, but
    * a rebuilt index may have re-written it). */
  def compactContainmentIndex(spark: SparkSession, indexPath: String): Unit =
    compactFamily(spark, indexPath, Seq(
      ("tok", (df: DataFrame) => df, Nil),
      ("sets", (df: DataFrame) => df, Nil),
      ("dfs", (df: DataFrame) => df, Nil)))

  /** Embedding near-dup pairs: random-hyperplane LSH buckets, then exact
    * cosine (native codegen [[CosineSimilarity]]) within buckets.
    * Null/empty vectors carry no cosine signal and are dropped up front.
    * `maxBucket` drops oversized buckets (same documented recall/skew trade
    * as [[simhash]]: a flooded bucket is near-identical content better
    * collapsed by exact dedup first).
    *
    * @param candidateSink oracle fixture: dump candidate id pairs (pre-cosine
    *   filter); the oracle recomputes the cosine from the stored vectors. */
  def embeddingCosine(
      df: DataFrame,
      id: String,
      vec: String,
      threshold: Double = 0.95,
      lshBits: Int = 12,
      maxBucket: Int = 1000,
      candidateSink: Option[String] = None): DataFrame = {

    val keyed = df.filter(col(vec).isNotNull && size(col(vec)) > 0)
      .select(col(id).as("vec_id"), col(vec).as("v"))
      .withColumn("bucket", hyperplaneLshKey(col("v"), lshBits))
      .persist()
    keyed.count(): Unit

    val buckets = keyed.select(col("vec_id").as("doc_id"), col("bucket"))
      .groupBy(col("bucket")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket)) // skew guard

    val candidates = sinkCandidates(pairsFromBuckets(buckets), candidateSink)

    val out = candidates
      .join(keyed.select(col("vec_id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(keyed.select(col("vec_id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(CosineSimilarity(col("v_a"), col("v_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
    eager(out, () => { keyed.unpersist(false): Unit })
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540 —
    * public method): cluster the embedding space with a sample-fit KMeans
    * coarse quantizer, generate candidate pairs WITHIN clusters only, then
    * verify with exact cosine (native codegen [[CosineSimilarity]]) and mark
    * non-canonical members. Versus [[embeddingCosine]]'s random-hyperplane
    * buckets, clusters follow the data distribution — semantic near-dups
    * that straddle a hyperplane still share a cell — at the price of the
    * quantizer fit, which samples like `Similarity.ivfTopK` so fit cost
    * stays constant as the corpus grows; assignment is one broadcast-model
    * pass. Candidates ∝ Σ min(cellSize, maxCluster)² with `maxCluster` the
    * skew guard (an over-dense cell is boilerplate better collapsed by
    * exact dedup first — same documented trade as [[simhash]]).
    *
    * KMeans assignment is engine-specific, so the oracle contract is the
    * q16/q18 one: candidate id pairs dump to a side table and DuckDB
    * re-derives the cosine verification + marks from the stored vectors.
    *
    * CLUSTER COUNT SCALES WITH n (round-6 scaling-curve fix): with k fixed,
    * cells grow ∝ n and candidates ∝ Σcell² ≈ n²/k — quadratic (measured:
    * 10× corpus → ~100× candidates before the fix). k =
    * max(nClusters, ⌈n/targetCell⌉) holds E[cell] ≈ targetCell so
    * candidates ∝ n·targetCell — linear in n, the SemDeDup paper's own
    * k ∝ n regime. Past `twoLevelCutover` cells the quantizer switches to
    * the two-level form ([[fitTwoLevelCentroids]]): fit cost drops from
    * O(n·k) to O(n·√k̄) per iteration and the k cap rises 4096 → 16384,
    * extending the linear-candidate regime to ~4·10⁶·targetCell rows
    * behind the same (doc_id, cell) assignment interface — the oracle
    * contract is untouched because candidates are verified, not trusted.
    * Beyond that cap, a third level (same construction) is the lever. */
  def semanticDedup(
      df: DataFrame,
      id: String,
      vec: String,
      threshold: Double = 0.9,
      nClusters: Int = 16,
      targetCell: Int = 250,
      seed: Long = 42L,
      fitSampleFraction: Double = 1.0,
      fitMaxIter: Int = 20,
      maxCluster: Int = 10000,
      twoLevelCutover: Int = 1024,
      candidateSink: Option[String] = None): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val keyed = df.filter(col(vec).isNotNull && size(col(vec)) > 0)
      .select(col(id).as("vec_id"), col(vec).as("v"))
      .withColumn("features", array_to_vector(col("v").cast("array<double>")))
      .persist()
    val n = keyed.count()

    // cap: 4096 single-level (flat fit cost ∝ n·k·iter), 16384 two-level
    // (fit cost ∝ n·(√k̄)·iter — the cutover is what RAISES the ceiling)
    val kCap = if (n / math.max(1, targetCell) + 1 > twoLevelCutover) 16384L else 4096L
    val k = math.max(nClusters, math.min(n / math.max(1, targetCell) + 1, kCap).toInt)
    val fitSet = if (fitSampleFraction < 1.0) keyed.sample(fitSampleFraction, seed) else keyed

    val assigned: DataFrame = if (k > twoLevelCutover) {
      // two-level regime: √k top cells fit by MLlib on the sample, all the
      // sub-codebooks trained together by distributed Lloyd (one map-only
      // assignment + one combinable aggregation per iteration — never a
      // per-cell driver-synchronized fit), then ONE map-only hierarchical
      // assignment pass over the corpus: O(n·(k₁+k₂)) distance evals vs the
      // flat path's O(n·k)
      val q = fitTwoLevelCentroids(
        fitSet.select(col("v").cast("array<double>").as("v")), k, seed, fitMaxIter)
      val leafBytes = q.leaves.iterator.map(ls =>
        ls.iterator.map(_._2.size.toLong * 8L).sum).sum
      if (leafBytes > CodebookLiteralMaxBytes) {
        import df.sparkSession.implicits._
        val leavesDf = q.leaves.zipWithIndex
          .flatMap { case (ls, t) => ls.map { case (cell, cen) => (cell, t, cen) } }
          .toDF("cell", "top", "centroid")
        assignTwoLevelViaJoin(keyed.select(col("vec_id").as("doc_id"), col("v")),
          q.tops, leavesDf)
          .select(col("doc_id"), col("cell"))
      } else keyed.select(col("vec_id").as("doc_id"),
        assignTwoLevel(col("v").cast("array<double>"), q).as("cell"))
    } else {
      val model = new KMeans().setK(k).setSeed(seed).setMaxIter(fitMaxIter)
        .setFeaturesCol("features").fit(fitSet)
      model.transform(keyed)
        .select(col("vec_id").as("doc_id"), col("prediction").as("cell"))
    }

    val buckets = assigned
      .groupBy(col("cell")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxCluster)) // skew guard

    val candidates = sinkCandidates(pairsFromBuckets(buckets), candidateSink)

    val out = candidates
      .join(keyed.select(col("vec_id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(keyed.select(col("vec_id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(CosineSimilarity(col("v_a"), col("v_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
    eager(out, () => { keyed.unpersist(false): Unit })
  }

  /** Two-level coarse quantizer: `tops(t)` is top-centroid t; `leaves(t)`
    * is top cell t's sub-codebook as (flat leaf cell id, centroid) pairs.
    * Plain driver-side arrays (≤ k·dim doubles — bounded by the codebook,
    * never the data), so assignment is a pure literal expression and the
    * serving path needs no MLlib model object. */
  private[graft] case class TwoLevelQuantizer(
      tops: IndexedSeq[Seq[Double]],
      leaves: IndexedSeq[Seq[(Int, Seq[Double])]])

  /** Map-only nearest-centroid index over a driver-side codebook — one
    * codegen'd [[graft.functions.NearestCentroid]] scan per row (argmin by
    * squared L2, ties to the lower idx; the codebook rides along as a task
    * reference object, never per-row). */
  private[graft] def nearestIdx(v: Column, centroids: Seq[Seq[Double]]): Column =
    graft.functions.NearestCentroid(v, centroids)

  /** Max bytes of codebook material embedded in the PLAN (expression
    * reference objects / nested literals). Literal embedding is the fastest
    * assignment shape — zero joins, zero exchanges — but the task binary
    * and plan-serialization cost grow with k·dim; under the k ∝ n regime a
    * billion-vector corpus implies a codebook the plan itself cannot carry.
    * Past this many bytes, assignment falls back to a JOIN against the
    * centroid frame (same argmin, same tie-break, bit-identical — specs
    * assert it) whose cost lives in the data plane instead of the plan.
    * Env-overridable for operational tuning. Parsed defensively — and
    * LAZILY, so a malformed value fails at the first assignment-path use
    * with a message naming the env var, never as an opaque
    * ExceptionInInitializerError taking down unrelated Dedup queries. */
  private[graft] lazy val CodebookLiteralMaxBytes: Long =
    sys.env.get("SPARK_GRAFT_CODEBOOK_LITERAL_MAX_BYTES") match {
      case Some(s) => s.trim.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"SPARK_GRAFT_CODEBOOK_LITERAL_MAX_BYTES must be a plain byte count " +
          s"(e.g. 33554432), got '$s'"))
      case None => 32L << 20
    }

  /** Estimated codebook bytes of a centroid frame: k · dim · 8 — one tiny
    * aggregate over a ≤k-row frame, never a collect. */
  private[graft] def codebookBytes(centroids: DataFrame): Long = {
    val r = centroids.agg(count(lit(1)).as("k"),
      max(size(col("centroid"))).as("dim")).first()
    if (r.isNullAt(1)) 0L else r.getLong(0) * r.getInt(1).toLong * 8L
  }

  /** Squared L2 between a double-array column and a centroid column —
    * SAME arithmetic tree as [[graft.functions.NearestCentroid]]'s inner
    * loop (left-to-right `d += diff·diff` over the zip order), so the join
    * fallback's distances are bit-identical to the literal path's. */
  private[graft] def squaredL2Col(v: Column, cen: Column): Column =
    aggregate(zip_with(v, cen, (a, b) => { val d = a - b; d * d }),
      lit(0.0), (s, x) => s + x)

  /** Flat-codebook assignment as a JOIN against the centroid FRAME — the
    * over-[[CodebookLiteralMaxBytes]] fallback: the codebook never touches
    * the driver or the plan; every row meets every centroid through a
    * broadcast (executor-memory-bounded — the same bytes a literal path
    * would have shipped in every task binary) and the argmin folds in a
    * combinable `min(struct(d2, cell))` whose (d2 asc, cell asc) ordering
    * replicates NearestCentroid's ties-to-lower-index over the ascending
    * cell ids exactly. */
  private[graft] def assignCellsViaJoin(keyed: DataFrame,
      centroids: DataFrame): DataFrame = {
    val cen = broadcast(centroids.select(col("cell").cast("int").as("__cell"),
      col("centroid").cast("array<double>").as("__cen")))
    keyed.select(col("doc_id"), col("v"))
      .crossJoin(cen)
      .withColumn("__d2", squaredL2Col(col("v").cast("array<double>"), col("__cen")))
      .groupBy(col("doc_id"))
      .agg(min(struct(col("__d2").as("d2"), col("__cell").as("cell"))).as("__m"),
        first(col("v")).as("v"))
      .select(col("doc_id"), col("__m.cell").as("cell"), col("v"))
  }

  /** Two-level assignment with the LEAF level as a join — the over-cap
    * fallback for the k ∝ n regime: tops stay a literal argmin (√k̄ —
    * bounded), each row then meets ONLY its own top's sub-codebook through
    * an equi-join on `top` (shuffle volume n·k̄₂ narrow rows, never n·k),
    * and the leaf argmin folds combinably. Tie-break parity: leaves are
    * numbered ascending within each top (fit and loadTwoLevel both sort),
    * so `min(struct(d2, cell))` equals the literal path's ties-to-lower-
    * local-index. */
  private[graft] def assignTwoLevelViaJoin(keyed: DataFrame,
      tops: IndexedSeq[Seq[Double]], leaves: DataFrame): DataFrame = {
    val leaf = leaves.select(col("top").cast("int").as("__top"),
      col("cell").cast("int").as("__cell"),
      col("centroid").cast("array<double>").as("__cen"))
    keyed.select(col("doc_id"), col("v"))
      .withColumn("__top", nearestIdx(col("v").cast("array<double>"), tops))
      .join(leaf, Seq("__top"))
      .withColumn("__d2", squaredL2Col(col("v").cast("array<double>"), col("__cen")))
      .groupBy(col("doc_id"))
      .agg(min(struct(col("__d2").as("d2"), col("__cell").as("cell"))).as("__m"),
        first(col("v")).as("v"))
      .select(col("doc_id"), col("__m.cell").as("cell"), col("v"))
  }

  /** The top-level codebook of a persisted two-level index — √k̄ rows, the
    * collect that stays bounded when the leaf level no longer is. */
  private[graft] def loadTops(spark: SparkSession, indexPath: String): IndexedSeq[Seq[Double]] =
    spark.read.parquet(s"$indexPath/topcentroids")
      .orderBy("top").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid"))).toIndexedSeq

  /** Map-only sub-cell argmin for a row already carrying its `top`: the
    * grouped [[graft.functions.NearestCentroid]] form scans only this row's
    * sub-codebook, then a tiny nested literal maps the LOCAL winner back to
    * its flat leaf cell id. The expression tree stays O(1) as k grows — k
    * lives in the reference object's DATA, not in fused branches. */
  private def nearestLeafCell(v: Column, top: Column,
      leaves: IndexedSeq[Seq[(Int, Seq[Double])]]): Column = {
    val mats: Array[Array[Array[Double]]] =
      leaves.map(_.map(_._2.toArray).toArray).toArray
    val ids: Seq[Seq[Int]] = leaves.map(_.map(_._1))
    element_at(element_at(typedLit(ids), top + 1),
      graft.functions.NearestCentroid(v, top, mats) + 1)
  }

  /** One map-only hierarchical assignment: nearest top (k₁ evals) then
    * nearest leaf within it (k₂ evals) — zero joins, zero shuffles. */
  private[graft] def assignTwoLevel(v: Column, q: TwoLevelQuantizer): Column =
    nearestLeafCell(v, nearestIdx(v, q.tops), q.leaves)

  /** Fit the two-level codebook — pure distributed Lloyd at BOTH levels,
    * no MLlib (kmeans||'s multi-job init measured ~2 s of fixed overhead
    * for no quality gain at a level whose residual the sub level refines
    * anyway). Per iteration of either level: ONE map-only assignment pass
    * plus ONE combinable per-dimension mean aggregation whose output is
    * codebook-bounded (≤ k rows collected — never data-bounded), so fit
    * cost per iteration is O(n·k₁) then O(n·k₂) distance evals instead of
    * the flat fit's O(n·k), with no per-cell driver-synchronized fits.
    * Deterministic end to end: both inits are content-smallest (xxhash64)
    * members — top-level globally, sub-level per top cell — so the fit is
    * reproducible under any partitioning; an empty top cell degrades to
    * its own top centroid as the single leaf. Iterations are capped low
    * and early-exit on sub-ppm movement: a coarse quantizer is a
    * rate-distortion device, not a clustering answer — the exact-cosine
    * verification stage absorbs cell-placement slop (pqTopK's argument),
    * and each saved iteration is one driver-synchronized job. */
  private[graft] def fitTwoLevelCentroids(
      vecs: DataFrame, // one column "v": array<double>
      k: Int,
      seed: Long,
      fitMaxIter: Int): TwoLevelQuantizer = {
    require(k >= 4, s"two-level quantizer needs k >= 4, got $k")
    val k1 = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
    val k2 = math.max(2, math.ceil(k.toDouble / k1).toInt)

    val vp = vecs.select(col("v")).persist()
    val maxIters = math.min(fitMaxIter, 4)
    def movedBeyond(a: Seq[Double], b: Seq[Double]): Boolean =
      a.zip(b).exists { case (x, y) => math.abs(x - y) > 1e-6 * math.max(1.0, math.abs(x)) }

    // ---- top level: k1 content-smallest DISTINCT rows seed the walk.
    // Duplicate-heavy fit sets (dedup's core input — identical vectors
    // share one xxhash64) can yield FEWER than k1 distinct rows in the
    // 4·k1-row probe; the quantizer then simply runs with fewer top cells
    // (tops.size is the authority from here on, never k1) — a coarse
    // quantizer over a low-diversity corpus needs fewer cells anyway ----
    var tops: IndexedSeq[Seq[Double]] = vp
      .orderBy(xxhash64(col("v")).asc).limit(4 * k1) // TakeOrdered, one job
      .collect().map(_.getSeq[Double](0)).distinct.take(k1).toIndexedSeq
    require(tops.nonEmpty, "two-level quantizer: empty fit set")
    val dim = tops.head.size // no separate size() job — the seeds carry it
    val dimAvgs = (0 until dim).map(i => avg(col("v")(i)).as(s"__m$i"))
    // one Lloyd step: assign by `cellOf`, mean per cell, collect ≤ k rows
    def meansBy(df: DataFrame, cellOf: Column): Map[Int, Seq[Double]] = df
      .select(cellOf.as("cell"), col("v"))
      .groupBy(col("cell")).agg(dimAvgs.head, dimAvgs.tail: _*)
      .select(col("cell"), array((0 until dim).map(i => col(s"__m$i")): _*).as("cen"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    var it = 0
    var moved = true
    while (it < maxIters && moved) {
      val m = meansBy(vp, nearestIdx(col("v"), tops))
      val merged = tops.indices.map(i => m.getOrElse(i, tops(i)))
      moved = tops.zip(merged).exists { case (a, b) => movedBeyond(a, b) }
      tops = merged.toIndexedSeq
      it += 1
    }

    // top-assign ONCE with the same assignment expression the corpus pass
    // will use, stage it for the sub-level loop
    val assignedTop = vp.select(col("v"), nearestIdx(col("v"), tops).as("top"))
      .persist() // first consumer (the sub init) populates the cache

    // sub init: per top cell, the k2 content-smallest members; flat leaf
    // id = top·k2 + sub
    var leaves: Map[Int, Seq[Double]] = assignedTop
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("top")).orderBy(xxhash64(col("v")).asc)))
      .filter(col("__rn") <= k2)
      .select((col("top") * k2 + col("__rn") - 1).as("cell"), col("v"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    tops.indices.foreach { t =>
      if (!leaves.contains(t * k2)) leaves += (t * k2) -> tops(t)
    }

    def grouped(ls: Map[Int, Seq[Double]]): IndexedSeq[Seq[(Int, Seq[Double])]] =
      IndexedSeq.tabulate(tops.size)(t =>
        ls.toSeq.filter { case (c, _) => c / k2 == t }.sortBy(_._1))

    it = 0
    moved = true
    while (it < maxIters && moved) {
      val m = meansBy(assignedTop, nearestLeafCell(col("v"), col("top"), grouped(leaves)))
      val merged = leaves.map { case (c, cen) => c -> m.getOrElse(c, cen) }
      moved = merged.exists { case (c, cen) => movedBeyond(leaves(c), cen) }
      leaves = merged
      it += 1
    }
    assignedTop.unpersist(false)
    vp.unpersist(false)
    TwoLevelQuantizer(tops, grouped(leaves))
  }

  /** Bootstrap a persisted semantic (embedding) index WITHOUT running dedup:
    * fit the coarse quantizer, store `<indexPath>/centroids` (tiny — the
    * frozen cell geometry every later batch assigns against) and
    * `<indexPath>/vectors` = (doc_id, cell, v) partitioned by batch (same
    * replay-idempotent layout as the minhash index). */
  def buildSemanticIndex(
      df: DataFrame,
      id: String,
      vec: String,
      indexPath: String,
      nClusters: Int = 16,
      seed: Long = 42L,
      fitSampleFraction: Double = 1.0,
      fitMaxIter: Int = 20,
      batchId: String = "base",
      targetCell: Int = 0,
      twoLevelCutover: Int = 1024): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val keyed = df.filter(col(vec).isNotNull && size(col(vec)) > 0)
      .select(col(id).as("doc_id"), col(vec).as("v"))
      .withColumn("features", array_to_vector(col("v").cast("array<double>")))
    val fitSet = if (fitSampleFraction < 1.0) keyed.sample(fitSampleFraction, seed) else keyed
    val spark = df.sparkSession
    import spark.implicits._

    // targetCell > 0 opts the INDEX into semanticDedup's k ∝ n regime; past
    // the cutover the fit and base assignment go two-level, and the stored
    // centroid table grows a `top` column + a `topcentroids` side table so
    // every later batch ([[semanticDedupIncremental]]) assigns with the
    // SAME hierarchical geometry — base and increments can never disagree
    // on which leaf a vector belongs to
    val k = if (targetCell > 0) {
      val n = keyed.count()
      val kCap = if (n / math.max(1, targetCell) + 1 > twoLevelCutover) 16384L else 4096L
      math.max(nClusters, math.min(n / math.max(1, targetCell) + 1, kCap).toInt)
    } else nClusters

    // writer lock over the whole rebuild: the centroid/topcentroid
    // overwrites would otherwise race a locked semanticDedupIncremental's
    // centroid read (files deleted mid-job, or a batch assigned against
    // geometry this rebuild is retiring and folded into the new vectors
    // table). The fit rides inside — a rebuild is index maintenance, and
    // its branches interleave fitting with the table writes.
    withIndexWriter(indexPath) {
    if (k > twoLevelCutover) {
      val q = fitTwoLevelCentroids(
        fitSet.select(col("v").cast("array<double>").as("v")), k, seed, fitMaxIter)
      q.tops.zipWithIndex.map { case (c, t) => (t, c) }
        .toDF("top", "centroid")
        .write.mode("overwrite").parquet(s"$indexPath/topcentroids")
      q.leaves.zipWithIndex
        .flatMap { case (ls, t) => ls.map { case (cell, cen) => (cell, t, cen) } }
        .toDF("cell", "top", "centroid")
        .write.mode("overwrite").parquet(s"$indexPath/centroids")
      // past the literal gate, encode against the just-written centroid
      // FRAME (equi-join on top) instead of a plan-embedded leaf codebook
      val leafBytes = q.leaves.iterator.map(ls =>
        ls.iterator.map(_._2.size.toLong * 8L).sum).sum
      val assignedNew =
        if (leafBytes > CodebookLiteralMaxBytes)
          assignTwoLevelViaJoin(keyed.select(col("doc_id"), col("v")), q.tops,
            keyed.sparkSession.read.parquet(s"$indexPath/centroids"))
        else keyed.select(col("doc_id"),
          assignTwoLevel(col("v").cast("array<double>"), q).as("cell"), col("v"))
      writeIndexBatch(assignedNew,
        s"$indexPath/vectors", batchId, wholeIndex = true)
    } else {
      val model = new KMeans().setK(k).setSeed(seed).setMaxIter(fitMaxIter)
        .setFeaturesCol("features").fit(fitSet)
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq
        .toDF("cell", "centroid")
        .write.mode("overwrite").parquet(s"$indexPath/centroids")
      writeIndexBatch(
        model.transform(keyed).select(col("doc_id"), col("prediction").as("cell"), col("v")),
        s"$indexPath/vectors", batchId, wholeIndex = true)
    }
    }
  }

  /** Rebuild the [[TwoLevelQuantizer]] from a persisted two-level index
    * (`topcentroids` + `top`-annotated `centroids`) — codebook-bounded
    * collects, no MLlib, the serving analogue of [[assignCells]]. */
  private[graft] def loadTwoLevel(spark: SparkSession, indexPath: String): TwoLevelQuantizer = {
    val tops = spark.read.parquet(s"$indexPath/topcentroids")
      .orderBy("top").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid"))).toIndexedSeq
    val leafRows = spark.read.parquet(s"$indexPath/centroids")
      .select(col("cell").cast("int"), col("top").cast("int"), col("centroid"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val leaves = IndexedSeq.tabulate(tops.size)(t =>
      leafRows.filter(_._2 == t).map { case (c, _, cen) => (c, cen) }.sortBy(_._1).toSeq)
    TwoLevelQuantizer(tops, leaves)
  }

  /** Assign vectors to their nearest stored centroid (squared-Euclidean
    * argmin — the same geometry KMeans assigned the base corpus with; ties
    * break on the lower cell id). The codebook is collected ONCE (bounded:
    * a flat index stores ≤ 4096 centroids by [[semanticDedup]]'s own cap —
    * the same driver-fits-the-codebook argument [[loadTwoLevel]] already
    * makes) and assignment is ONE map-only codegen
    * [[graft.functions.NearestCentroid]] scan: zero joins, zero exchanges.
    * The previous shape (broadcast cross join to n·k rows + a row_number
    * window over doc_id) paid a full n·k-row shuffle per incremental batch
    * — on the hot path of [[semanticDedupIncremental]] and every
    * [[graft.streaming.StreamingSemanticDedup]] micro-batch. Cell ids come
    * back through a sorted id table so non-contiguous cell numbering is
    * preserved; sorting ascending makes NearestCentroid's ties-to-lower-
    * index match the old (d2 asc, cell asc) tie-break exactly. */
  private[graft] def assignCells(keyed: DataFrame, centroids: DataFrame,
      literalMaxBytes: Long = CodebookLiteralMaxBytes): DataFrame = {
    if (codebookBytes(centroids) > literalMaxBytes)
      return assignCellsViaJoin(keyed, centroids)
    val rows = centroids.select(col("cell").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(rows.nonEmpty, "assignCells: empty centroid table")
    val ids: Seq[Int] = rows.map(_._1).toSeq
    val localIdx = graft.functions.NearestCentroid(
      col("v").cast("array<double>"), rows.map(_._2.toSeq).toSeq)
    keyed.select(col("doc_id"),
      element_at(typedLit(ids), localIdx + 1).as("cell"), col("v"))
  }

  /** Incremental SEMANTIC dedup — [[semanticDedup]]'s daily-batch form,
    * mirroring [[minhashLshIncremental]] exactly: assign the new batch to
    * the FROZEN centroids (no refit — cell geometry must stay stable or
    * old assignments go stale), candidates are new×new and new×index cell
    * collisions (never index×index), exact-cosine verification, pairs
    * oriented index-canonical, and the new batch's (doc_id, cell, v) rows
    * fold into `vectors/batch=<batchId>` — replay-safe via the same
    * partition-exclusion read + dynamic partition overwrite.
    *
    * Quantizer drift is the documented operational caveat: after enough
    * distribution shift, rebuild with [[buildSemanticIndex]] (a new base
    * batch) rather than refitting in place.
    *
    * @return (keep_id, drop_id, cosine)
    */
  def semanticDedupIncremental(
      newDf: DataFrame,
      id: String,
      vec: String,
      indexPath: String,
      batchId: String,
      threshold: Double = 0.9,
      maxCluster: Int = 10000,
      candidateSink: Option[String] = None): DataFrame = withIndexWriter(indexPath) {
    // full-span writer lock — the minhashLshIncremental rationale
    val spark = newDf.sparkSession
    val centroids = spark.read.parquet(s"$indexPath/centroids")
    val oldVecs = spark.read.parquet(resolveIndexDir(s"$indexPath/vectors"))
      .filter(col("batch") =!= lit(batchId))
      .select(col("doc_id"), col("cell"), col("v"))

    val newKeyed = newDf.filter(col(vec).isNotNull && size(col(vec)) > 0)
      .select(col(id).as("doc_id"), col(vec).as("v"))
    // a two-level index (top-annotated centroids) must be probed with the
    // SAME hierarchical geometry the base was assigned with — a flat argmin
    // over the leaves can land a borderline vector in a different leaf than
    // its indexed near-dup and silently miss the candidate. Past the
    // codebook-literal gate the leaf level assigns through the equi-join
    // fallback (bit-identical — DedupSpec) instead of a plan-embedded
    // codebook that grows with k ∝ n
    val newAssigned = (if (centroids.columns.contains("top")) {
      if (codebookBytes(centroids) > CodebookLiteralMaxBytes)
        assignTwoLevelViaJoin(newKeyed, loadTops(spark, indexPath), centroids)
      else {
        val q = loadTwoLevel(spark, indexPath)
        newKeyed.select(col("doc_id"),
          assignTwoLevel(col("v").cast("array<double>"), q).as("cell"), col("v"))
      }
    } else assignCells(newKeyed, centroids)).persist()
    newAssigned.count(): Unit

    val all = oldVecs.withColumn("is_new", lit(false))
      .unionByName(newAssigned.withColumn("is_new", lit(true)))
    val buckets = all
      .select(struct(col("doc_id"), col("is_new")).as("m"), col("cell"))
      .groupBy(col("cell")).agg(collect_list(col("m")).as("ids"))
      .filter(size(col("ids")).between(2, maxCluster)) // skew guard

    val candidates = sinkCandidates(taggedPairsFromBuckets(buckets), candidateSink)

    val vecsById = all.select(col("doc_id"), col("v"))
    val out = candidates
      .join(vecsById.select(col("doc_id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecsById.select(col("doc_id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("new_a"), col("new_b"),
        round(CosineSimilarity(col("v_a"), col("v_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(
        when(col("new_a") && !col("new_b"), col("id_b")).otherwise(col("id_a")).as("keep_id"),
        when(col("new_a") && !col("new_b"), col("id_a")).otherwise(col("id_b")).as("drop_id"),
        col("cosine"))
    // lineage cut BEFORE the fold-in (same hazard as the minhash flow: a
    // re-executable plan would re-read the index post-fold and see the
    // batch's own vectors as indexed)
    val p = out.localCheckpoint(eager = true)
    writeIndexBatch(newAssigned.select(col("doc_id"), col("cell"), col("v")),
      s"$indexPath/vectors", batchId)
    newAssigned.unpersist(false): Unit
    p
  }

  /** Cross-corpus n-gram overlap — DECONTAMINATION: which `right` (test/eval)
    * docs share at least `minShared` distinct df-capped character n-grams
    * with some `left` (train) doc. The standard pre-training hygiene pass:
    * eval sets must not leak into training data, and near-verbatim leaks
    * surface as runs of shared rare n-grams. Same bucket machinery as
    * [[ngramJaccard]], but candidates are only generated ACROSS the two
    * sides (never within one — a train×train pair is dedup's business, not
    * contamination's), and the df cap is computed over the UNION of both
    * sides' grams (a gram common across the whole corpus is boilerplate,
    * not leak signal).
    *
    * @return (train_id, test_id, n_shared) — one row per contaminated pair,
    *         n_shared = number of distinct shared capped grams
    */
  def ngramCrossOverlap(
      left: DataFrame,
      right: DataFrame,
      id: String,
      text: String,
      n: Int = 8,
      minShared: Int = 3,
      sampleMod: Int = 1,
      maxBucket: Int = 1000): DataFrame = {

    def grams(df: DataFrame, side: Int) =
      df.select(col(id).as("doc_id"), lit(side).as("side"), lower(col(text)).as("__lt"))
        .select(col("doc_id"), col("side"),
          HashedShingles.hashedCharNgrams(col("__lt"), n,
            HashedShingles.KindXx64, 17L, distinct = true, sorted = false).as("hs"))
    val tagged = grams(left, 0).unionByName(grams(right, 1)).persist()
    tagged.count(): Unit

    val buckets = tagged
      .select(struct(col("doc_id"), col("side")).as("m"), explode(col("hs")).as("gh"))
      .filter(pmod(col("gh"), lit(sampleMod.toLong)) === 0)
      .groupBy(col("gh")).agg(collect_list(col("m")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket)) // df cap over BOTH sides

    val out = buckets
      .select(array_sort(col("ids")).as("s"))
      .select(graft.functions.SortedPairs(col("s")).as(Seq("__a", "__b")))
      .select(col("__a.doc_id").as("id_a"), col("__b.doc_id").as("id_b"),
        col("__a.side").as("side_a"), col("__b.side").as("side_b"))
      .filter(col("side_a") =!= col("side_b"))
      .select(
        when(col("side_a") === 0, col("id_a")).otherwise(col("id_b")).as("train_id"),
        when(col("side_a") === 0, col("id_b")).otherwise(col("id_a")).as("test_id"))
      .groupBy(col("train_id"), col("test_id"))
      .agg(count(lit(1)).as("n_shared")) // one bucket == one shared distinct gram
      .filter(col("n_shared") >= minShared)
    eager(out, () => { tagged.unpersist(false): Unit })
  }

  /** Collapse near-dup pairs to per-doc keep/drop marks: a doc is dropped if
    * any pair links it to a smaller id (cheap one-pass approximation of
    * connected components; [[connectedComponents]] is the exact fixpoint).
    * The dup-id set (verified pairs only) is orders of magnitude smaller
    * than the corpus — broadcast it, so marking is a map-only pass over the
    * docs instead of shuffling the corpus by id. */
  def marksFromPairs(docs: DataFrame, id: String, pairs: DataFrame): DataFrame =
    docs.select(col(id).as("doc_id"))
      .join(broadcast(pairs.select(col("id_b").as("doc_id")).distinct()
        .withColumn("is_duplicate", lit(true))), Seq("doc_id"), "left")
      .withColumn("is_duplicate", coalesce(col("is_duplicate"), lit(false)))

  /** QUALITY-AWARE duplicate-cluster canonicalization — [[dedupCorpus]]'s
    * production form: collapse `pairs` to exact connected components, then
    * keep the BEST copy per cluster (max `quality`, ties → min id) instead
    * of the lowest id — when a page was crawled five times, the curation
    * pipeline wants the cleanest capture, not the first. Emits MARKS for
    * every doc (the [[marksFromPairs]] contract — downstream joins decide
    * what to drop): singletons are their own canonical.
    *
    * Shape: CC is the pointer-jumping pass ([[connectedComponents]]);
    * cluster labels join back to the corpus by id (narrow long keys); the
    * per-cluster argmax is ONE window over (quality desc, id) — one
    * exchange on component, cluster-sized partitions (clusters are
    * near-dup groups, bounded by the corpus's replication factor, never
    * corpus-sized).
    *
    * @param quality any deterministic Column over the doc row (e.g.
    *   [[graft.functions.TextAnalysis.qualityScore]])
    * @return (doc_id, component, canonical_id, is_canonical) */
  def canonicalizeClusters(
      docs: DataFrame,
      id: String,
      pairs: DataFrame,
      quality: Column): DataFrame = {
    val comps = connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("component"))
    val scored = docs.select(col(id).cast("long").as("doc_id"), quality.as("__q"))
    val labeled = scored.join(comps, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
    val w = Window.partitionBy("component")
      .orderBy(col("__q").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    labeled
      .withColumn("canonical_id", first(col("doc_id")).over(w))
      .select(col("doc_id"), col("component"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
  }

  /** LEAKAGE-FREE train/test split: a content-addressed split
    * ([[graft.functions.GraftFunctions.hashSplitBucket]]) assigns each doc
    * independently, so two NEAR-DUPLICATES can land on opposite sides — the
    * test set then contains paraphrases of training docs and the eval is
    * contaminated by construction (the failure q56/q175 only DETECT). This
    * split closes it structurally: near-dup pairs collapse to connected
    * components and the whole component buckets by its REPRESENTATIVE's
    * hash, so a cluster is atomic — train or test, never both. Singletons
    * bucket by their own id, which keeps the assignment stable as the
    * corpus grows (a doc's bucket changes only if it joins a cluster).
    *
    * Shape: CC is the pointer-jumping pass ([[connectedComponents]]);
    * labels join back on narrow longs; the bucket is one map-only md5
    * expression on the representative. Nothing here is pair-shaped.
    *
    * @return (doc_id, split_rep, bucket) for every doc */
  def leakFreeSplit(docs: DataFrame, id: String, pairs: DataFrame,
      nBuckets: Int = 100): DataFrame = {
    val comps = connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("component"))
    docs.select(col(id).cast("long").as("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .withColumn("split_rep", coalesce(col("component"), col("doc_id")))
      .select(col("doc_id"), col("split_rep"),
        graft.functions.GraftFunctions.hashSplitBucket(col("split_rep"), nBuckets)
          .as("bucket"))
  }

  /** Per-document CONTAMINATION RATIO against a reference corpus — the
    * audit-grade face of [[ngramCrossOverlap]]'s leak detection: instead of
    * (train, test) pair hits, report for each right-side doc what FRACTION
    * of its distinct 8-gram surface already exists anywhere on the left
    * (the "n% of this benchmark is in the training set" number a data audit
    * publishes; Brown et al. '20 App. C measures exactly this). No df cap:
    * an audit wants every gram counted, and the plan never builds pairs —
    * the left side collapses to a DISTINCT gram set and the right side
    * probes it with one left-semi join on 64-bit gram hashes (an inverted-
    * index probe: both exchanges carry narrow longs, cost ∝ gram volume,
    * never |left|×|right|). Same hashed-gram noise floor as the minhash
    * family (~|grams|²/2⁶⁵ collisions; the oracle re-derives raw strings
    * and agrees at every tested sf).
    *
    * @return (doc_id, n_grams, n_seen, ratio) for every `right` doc;
    *   ratio = round(n_seen/n_grams, 6) — one correctly-rounded division */
  def contaminationRatio(
      left: DataFrame,
      right: DataFrame,
      id: String,
      text: String,
      n: Int = 8): DataFrame =
    contaminationAgainst(
      docGrams(left, id, text, n).select(col("gh")).distinct(),
      right, id, text, n)

  /** The distinct hashed n-gram surface of a doc set — one row per
    * (doc_id, gh) with gh = seeded 64-bit xxhash of the lowercased gram. */
  private def docGrams(df: DataFrame, id: String, text: String, n: Int) =
    df.select(col(id).as("doc_id"),
      explode(HashedShingles.hashedCharNgrams(lower(col(text)), n,
        HashedShingles.KindXx64, 17L, distinct = true, sorted = false)).as("gh"))

  /** The probe body shared by [[contaminationRatio]] and
    * [[contaminationRatioIndexed]]: right-side grams against a given
    * distinct gram set. */
  private def contaminationAgainst(
      gramSet: DataFrame, // one column "gh"
      right: DataFrame,
      id: String,
      text: String,
      n: Int): DataFrame = {
    val rg = docGrams(right, id, text, n).persist()
    rg.count(): Unit // one gram pass feeds both the total and the probe
    val totals = rg.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val seen = rg.join(gramSet, Seq("gh"), "leftsemi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_seen"))
    val out = totals.join(seen, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"))
      .withColumn("ratio",
        round(col("n_seen").cast("double") / col("n_grams").cast("double"), 6))
    eager(out, () => { rg.unpersist(false): Unit })
  }

  /** Persist the benchmark's distinct hashed gram surface — the frozen
    * reference set a decontamination GATE probes on every ingest batch
    * (building it once is what makes the gate an O(batch) probe instead of
    * an O(benchmark) rescan per micro-batch; the offline-artifact/online-
    * request split of the serving family applied to decontamination).
    * Stored in the shared `batch=<id>` index layout so a benchmark refresh
    * is an atomic whole-index rebuild. */
  def buildGramIndex(bench: DataFrame, id: String, text: String,
      indexPath: String, n: Int = 8): Unit =
    writeIndexBatch(
      docGrams(bench, id, text, n).select(col("gh")).distinct(),
      indexPath, "base", wholeIndex = true)

  /** Fold NEW benchmark docs into a gram index — benchmarks grow (a new
    * eval-set release must start gating immediately, without re-tokenizing
    * every prior benchmark). Per-batch distinct grams land in replay-
    * idempotent `batch=<id>` partitions; the membership probe is
    * insensitive to cross-batch duplicates, so no global re-distinct is
    * needed on the write path. */
  def appendGramIndex(bench: DataFrame, id: String, text: String,
      indexPath: String, batchId: String, n: Int = 8): Unit =
    writeIndexBatch(
      docGrams(bench, id, text, n).select(col("gh")).distinct(),
      indexPath, batchId)

  /** Compact gram-index batches, folding cross-batch duplicate grams away
    * (probe cost ∝ stored rows — a year of benchmark drops with shared
    * boilerplate wants the global distinct back). Shared atomic
    * CURRENT-pointer versioning. */
  def compactGramIndex(spark: SparkSession, indexPath: String): Unit =
    compactBatchedDir(spark, indexPath, transform = _.distinct())

  /** [[contaminationRatio]] served from a PERSISTED gram index
    * ([[buildGramIndex]]) — the fit-free form the streaming gate uses: the
    * benchmark side is never re-tokenized; each doc batch pays one gram
    * pass over ITSELF plus one narrow left-semi join on 64-bit hashes. */
  def contaminationRatioIndexed(docs: DataFrame, id: String, text: String,
      indexPath: String, n: Int = 8): DataFrame = {
    val gramSet = docs.sparkSession.read.parquet(resolveIndexDir(indexPath))
      .select(col("gh"))
    contaminationAgainst(gramSet, docs, id, text, n)
  }

  /** End-to-end near-dup removal: collapse `pairs` to exact connected
    * components and keep one canonical doc (min id) per component; docs in no
    * component pass through. The full dedup pipeline is
    * `dedupCorpus(docs, id, minhashLsh(docs, id, text))`. */
  def dedupCorpus(docs: DataFrame, id: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    docs.join(comps, docs(id) === comps("node"), "left")
      .filter(col("component").isNull || col("component") === docs(id))
      .drop("node", "component")
  }

  /** Exact connected components over near-dup pairs, by distributed min-label
    * propagation WITH pointer jumping: every node starts labeled with its own
    * id; each round (a) propagates labels one hop across edges keeping the
    * per-node minimum, then (b) path-halves — `comp ← min(comp, comp[comp])`
    * via a self-join of the label table — so a label reaches distance-d nodes
    * in O(log d) rounds, not d. Fixpoint when no label changes. Each round is
    * two shuffled joins + one shuffled aggregation with NO driver-side graph
    * state, so the same code runs at 100 TB. Labels only decrease and are
    * always ids of reachable nodes, so the fixpoint is exactly the component
    * minimum. Hop-only propagation needs diameter-many rounds — fine for
    * dedup graphs (cliques, diameter ≲ 3) but pathological for chain-shaped
    * edge sets (ConnectedComponentsSpec's 300-node path converges in ≤12
    * rounds here vs 299 hop-only — same O(log n) round bound as
    * large-star/small-star, with simpler per-round plans).
    * `localCheckpoint` per round truncates the exponentially growing lineage;
    * each round RELEASES the previous round's checkpoint blocks (and the edge
    * list at the end) so iteration leaves nothing behind in the block manager.
    *
    * @param pairs edge list with columns `id_a`, `id_b`
    * @return (node BIGINT, component BIGINT), component = min reachable node id
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50,
      reliableDir: Option[String] = graft.operators.Staging.DefaultReliableDir): DataFrame = {
    import graft.operators.Staging
    // symmetric edge list; self-loops dropped
    val edges = Staging.stage(pairs
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .union(pairs.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      .filter(col("src") =!= col("dst")).distinct(), reliableDir)

    var labels = Staging.stage(edges.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node")), reliableDir)

    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // hop messages: one-step propagation across edges
      val msgs = edges.join(labels, edges("src") === labels("node"))
        .select(edges("dst").as("node"), col("comp"))
      // jump messages (path halving): comp[comp] — each node also hears its
      // current label's OWN label. comp is always a node id present in the
      // label table (it started as one and only node ids propagate), so the
      // inner join misses only at roots, which the labels branch re-supplies.
      val parents = labels.select(col("node").as("__pn"), col("comp").as("__pc"))
      val jumps = labels.join(parents, col("comp") === col("__pn"))
        .select(col("node"), col("__pc").as("comp"))
      // one shuffled min per round over all three message sources; the
      // checkpointed plan stays a plain Aggregate (constraint-clean for the
      // next round's union — a checkpointed join+project leaks pruned-attr
      // constraints that break Union.rewriteConstraints)
      val next = graft.operators.Staging.stage(
        labels.unionByName(msgs).unionByName(jumps)
          .groupBy("node").agg(min("comp").as("comp")), reliableDir)
      converged = next.alias("n")
        .join(labels.alias("o"), col("n.node") === col("o.node"))
        .filter(col("n.comp") < col("o.comp"))
        .isEmpty
      GraftBridge.releaseCheckpoint(labels) // prior round no longer referenced
      labels = next
      round += 1
    }
    GraftBridge.releaseCheckpoint(edges)
    labels.select(col("node"), col("comp").as("component"))
  }

  /** Duplicate SPAN detection — exact repeated k-token windows across
    * documents (the substring-level view of "Deduplicating Training Data
    * Makes Language Models Better", Lee et al. 2022: a corpus's worst memor-
    * ization risk is repeated passages inside otherwise-unique documents,
    * which document-level dedup never sees). The paper's suffix array is a
    * single-machine structure; the 100 TB-shaped equivalent is hashed
    * sliding windows: every k-token span → one 60-bit portable hash, ONE
    * groupBy shuffle of narrow (hash, doc_id) rows with map-side partial
    * aggregation, keep spans seen in ≥ minDocs distinct documents. No pair
    * expansion anywhere — a boilerplate span hitting a million documents is
    * one hot AGGREGATION key (partials absorb it), never a million² join.
    *
    * The hash is the same md5-prefix integer as [[graft.functions.GraftFunctions.hashSplitBucket]]
    * so an ANSI oracle re-derives it bit-for-bit; spans are lowercased
    * whitespace tokens re-joined by single spaces (whitespace-normal form).
    *
    * @return (span_hash, n_docs, n_occ, first_doc) — occurrences count
    *         repeats WITHIN a doc too; first_doc = min doc id carrying it
    */
  def duplicateSpans(
      docs: DataFrame,
      id: String,
      text: String,
      k: Int = 8,
      minDocs: Int = 2): DataFrame = {
    val spans = docs
      .select(col(id).as("doc_id"), wsTokens(lower(col(text))).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col("doc_id"),
        explode(wordShinglesFromTokens(col("__toks"), k)).as("span"))
      .select(col("doc_id"),
        conv(substring(md5(col("span")), 1, 15), 16, 10).cast("long").as("span_hash"))
    spans.groupBy("span_hash")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
  }

  /** EXACT-SUBSTRING duplicate REMOVAL (Lee et al. '22, "Deduplicating
    * Training Data Makes Language Models Better" — ExactSubstr): every
    * `spanLen`-token window that occurs more than once in the corpus keeps
    * its CANONICAL occurrence (min (doc_id, pos)) and every token covered
    * by a non-canonical occurrence is cut — [[duplicateSpans]] is the
    * detector, this is the rewrite. Catches what doc-level dedup cannot:
    * a long doc quoting 50 tokens of another keeps its own prose and
    * loses exactly the quote; two identical docs collapse to one (every
    * window of the later doc is non-canonical, covering all its tokens);
    * in-document repetition loses its repeats (later windows of the loop
    * are non-canonical against the first).
    *
    * The paper builds a suffix array; the distributed shape here is the
    * hashed-window equivalent over the SAME decision rule: windows hash to
    * 60-bit ids, so the corpus-wide pass shuffles only (hash, doc_id, pos)
    * triples; the winner is one min-struct aggregate (map-side
    * combinable); removed occurrences expand to covered token positions
    * (a dup-rate × spanLen narrow frame); the rewrite joins back only
    * those positions and re-tokenizes map-side. Output text is the kept
    * token stream joined by single spaces — whitespace normalization is
    * the documented trade for never shuffling text.
    *
    * Docs shorter than `spanLen` tokens carry no window and are never
    * touched. 60-bit hash-merge caveat as everywhere, oracle-mirrored.
    *
    * @return (doc_id, n_tokens, n_removed, clean_text) */
  def removeDuplicateSpans(
      docs: DataFrame,
      id: String,
      text: String,
      spanLen: Int = 20): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    val tokd = docs.select(col(id).cast("long").as("doc_id"),
      wsTokens(col(text)).as("__toks")).persist()
    tokd.count(): Unit // ONE tokenize pass feeds the span pass AND the rewrite
    val occ = tokd.filter(size(col("__toks")) >= spanLen)
      .select(col("doc_id"),
        posexplode(wordShinglesFromTokens(col("__toks"), spanLen)).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("span")), 1, 15), 16, 10).cast("long").as("sh"))
    val dupWinners = occ.groupBy("sh")
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"), count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
      .select(col("sh"), col("w"))
    val removedPos = occ.join(dupWinners, Seq("sh"))
      .filter(!(col("w.doc_id") === col("doc_id") && col("w.pos") === col("pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(spanLen - 1))).as("tp"))
      .distinct()
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("tp"))).as("rm_pos"))
    val out = tokd.join(removedPos, Seq("doc_id"), "left")
      .withColumn("__rm", coalesce(col("rm_pos"), array().cast("array<int>")))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__rm")).cast("long").as("n_removed"),
        array_join(filter(col("__toks"), (_, i) => !array_contains(col("__rm"), i)), " ")
          .as("clean_text"))
    val result = out.localCheckpoint(eager = true)
    tokd.unpersist(false): Unit
    result
  }

  /** The faithful-reconstruction projection shared by the batch and
    * incremental rewrites: expects staged `__toks` (tokens), `__seps`
    * (separator runs of the trimmed text — |toks|−1 entries) and `__rm`
    * (sorted removed token positions). One ordered `aggregate` fold whose
    * state is (text-so-far, previous-kept): each kept token appends behind
    * the ORIGINAL separator when its left neighbor was kept too, a single
    * space across a cut, nothing at the front. Pure string algebra — the
    * q228 oracle replays it in closed window form. */
  private def faithfulCleanText(): Column = {
    val elems = transform(col("__toks"), (tok, i) => struct(
      tok.as("t"),
      when(i === 0, lit("")).otherwise(element_at(col("__seps"), i)).as("sb"),
      (!array_contains(col("__rm"), i)).as("k")))
    aggregate(elems,
      struct(lit("").as("s"), lit(false).as("pk")),
      (acc, e) => struct(
        when(e.getField("k"),
          concat(acc.getField("s"),
            when(acc.getField("s") === "", lit(""))
              .otherwise(when(acc.getField("pk"), e.getField("sb"))
                .otherwise(lit(" "))),
            e.getField("t")))
          .otherwise(acc.getField("s")).as("s"),
        e.getField("k").as("pk")))
      .getField("s")
  }

  /** [[removeDuplicateSpans]] with FAITHFUL reconstruction: identical
    * detection and removal rule (same windows, same canonical winner, same
    * covered-token expansion), but the surviving text preserves the
    * ORIGINAL inter-token whitespace wherever two adjacent kept tokens
    * were adjacent in the source — tabs, newlines, double spaces inside a
    * kept run all survive byte-for-byte; only the splice points where a
    * removed span was cut out join with a single space (there is no
    * "original" separator across a cut). This closes the documented
    * whitespace-normalization trade of [[removeDuplicateSpans]] for
    * pipelines where formatting is signal (code, markup, poetry).
    *
    * Shape: one extra `regexp_extract_all` per doc captures the separator
    * runs alongside the token array (both map-side, text still never
    * shuffles — the removal frame stays narrow (doc_id, positions)), and
    * the reconstruction is ONE ordered `aggregate` fold over
    * (token, separator, kept) triples whose state is (text-so-far,
    * previous-kept) — pure string algebra an external engine replays
    * bit-for-bit (q228's oracle runs the same fold as `list_reduce`).
    *
    * @return (doc_id, n_tokens, n_removed, clean_text) */
  def removeDuplicateSpansFaithful(
      docs: DataFrame,
      id: String,
      text: String,
      spanLen: Int = 20): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    val tokd = docs.select(col(id).cast("long").as("doc_id"),
      wsTokens(col(text)).as("__toks"),
      // separator runs between tokens of the TRIMMED text: exactly
      // |toks| - 1 entries by construction (split and extract_all see the
      // same runs)
      regexp_extract_all(trim(col(text)), lit("\\s+"), lit(0)).as("__seps"))
      .persist()
    tokd.count(): Unit // ONE tokenize pass feeds the span pass AND the rewrite
    val occ = tokd.filter(size(col("__toks")) >= spanLen)
      .select(col("doc_id"),
        posexplode(wordShinglesFromTokens(col("__toks"), spanLen)).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("span")), 1, 15), 16, 10).cast("long").as("sh"))
    val dupWinners = occ.groupBy("sh")
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"), count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
      .select(col("sh"), col("w"))
    val removedPos = occ.join(dupWinners, Seq("sh"))
      .filter(!(col("w.doc_id") === col("doc_id") && col("w.pos") === col("pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(spanLen - 1))).as("tp"))
      .distinct()
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("tp"))).as("rm_pos"))
    val out = tokd.join(removedPos, Seq("doc_id"), "left")
      .withColumn("__rm", coalesce(col("rm_pos"), array().cast("array<int>")))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__rm")).cast("long").as("n_removed"),
        faithfulCleanText().as("clean_text"))
    val result = out.localCheckpoint(eager = true)
    tokd.unpersist(false): Unit
    result
  }

  /** Bootstrap the persisted SPAN index for
    * [[removeDuplicateSpansIncremental]]: the distinct spanLen-token
    * window hashes of the settled corpus — "content that has been seen".
    * Narrow by construction: one 8-byte hash per distinct window, no
    * positions, no text (the incremental rule only asks membership; the
    * canonical copy already lives in the corpus). */
  def buildSpanIndex(docs: DataFrame, id: String, text: String,
      indexPath: String, spanLen: Int = 20): Unit = {
    val occ = spanOccurrences(docs, id, text, spanLen)
    writeIndexBatch(occ.select(col("sh")).distinct(), indexPath, "base",
      wholeIndex = true)
  }

  /** INCREMENTAL ExactSubstr — the ingest-time rewrite: every window of a
    * new doc that the INDEXED corpus already contains (or that an earlier
    * (doc, pos) occurrence within this batch contains) has its covered
    * tokens cut; the cleaned doc is what gets admitted. "Trim the
    * arriving doc of content we already have" — the admission-control
    * face of [[removeDuplicateSpans]], mirroring the other incremental
    * ops: candidates are new-batch-only (the settled corpus is never
    * re-scanned — membership is a semi-join of the BATCH's hashes against
    * the index), the batch's RAW window hashes fold into
    * `batch=` partitions (seen = seen, even when cut — a second arrival
    * of the same content must still be recognized), replay-safe via the
    * partition-exclusion read.
    *
    * @return (doc_id, n_tokens, n_removed, clean_text) for the batch */
  def removeDuplicateSpansIncremental(
      newDf: DataFrame,
      id: String,
      text: String,
      indexPath: String,
      batchId: String,
      spanLen: Int = 20,
      faithful: Boolean = false): DataFrame = withIndexWriter(indexPath) {
    // full-span writer lock — the minhashLshIncremental rationale
    val spark = newDf.sparkSession
    val tokd = newDf.select(col(id).cast("long").as("doc_id"),
      wsTokens(col(text)).as("__toks"),
      // separator runs ride along only when the faithful rewrite needs them
      (if (faithful) regexp_extract_all(trim(col(text)), lit("\\s+"), lit(0))
       else array().cast("array<string>")).as("__seps")).persist()
    tokd.count(): Unit
    val occ = tokd.filter(size(col("__toks")) >= spanLen)
      .select(col("doc_id"),
        posexplode(wordShinglesFromTokens(col("__toks"), spanLen)).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("span")), 1, 15), 16, 10).cast("long").as("sh"))
      .persist()
    occ.count(): Unit

    val indexed = spark.read.parquet(resolveIndexDir(indexPath))
      .filter(col("batch") =!= lit(batchId)).select(col("sh"))
    // seen-in-corpus: membership only — the index never carries positions
    val hitOld = occ.join(indexed, Seq("sh"), "left_semi")
      .select(col("doc_id"), col("pos"))
    // batch-internal: non-canonical occurrences, the one-shot rule
    // restricted to this batch
    val batchWinners = occ.groupBy("sh")
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"), count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1).select(col("sh"), col("w"))
    val hitNew = occ.join(batchWinners, Seq("sh"))
      .filter(!(col("w.doc_id") === col("doc_id") && col("w.pos") === col("pos")))
      .select(col("doc_id"), col("pos"))

    val removedPos = hitOld.unionByName(hitNew)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(spanLen - 1))).as("tp"))
      .distinct()
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("tp"))).as("rm_pos"))
    val out = tokd.join(removedPos, Seq("doc_id"), "left")
      .withColumn("__rm", coalesce(col("rm_pos"), array().cast("array<int>")))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__rm")).cast("long").as("n_removed"),
        (if (faithful) faithfulCleanText()
         else array_join(
           filter(col("__toks"), (_, i) => !array_contains(col("__rm"), i)), " "))
          .as("clean_text"))

    // lineage cut BEFORE the fold-in (the minhashLshIncremental rationale)
    val p = out.localCheckpoint(eager = true)
    writeIndexBatch(occ.select(col("sh")).distinct(), indexPath, batchId)
    occ.unpersist(false): Unit
    tokd.unpersist(false): Unit
    p
  }

  /** Fold the span index's per-batch partitions into one deduplicated
    * `base` generation (membership semantics — duplicate hashes across
    * batches collapse). */
  def compactSpanIndex(spark: SparkSession, indexPath: String): Unit =
    compactBatchedDir(spark, indexPath, transform = _.distinct())

  private def spanOccurrences(docs: DataFrame, id: String, text: String,
      spanLen: Int): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    docs.select(col(id).cast("long").as("doc_id"), wsTokens(col(text)).as("__toks"))
      .filter(size(col("__toks")) >= spanLen)
      .select(col("doc_id"),
        posexplode(wordShinglesFromTokens(col("__toks"), spanLen)).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("span")), 1, 15), 16, 10).cast("long").as("sh"))
  }
}
