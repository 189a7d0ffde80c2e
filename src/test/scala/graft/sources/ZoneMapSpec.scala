package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZoneMapSpec extends SparkSpec {

  test("range read equals a plain filter; non-overlapping shards are skipped") {
    import spark.implicits._
    val root = Files.createTempDirectory("zm_").toString
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "payload")
    ZoneMap.write(df, "k", root, shards = 10)

    val (out, read, total) = ZoneMap.readRange(spark, root, "k", 150L, 249L)
    val got = out.select("k").as[Long].collect().sorted.toSeq
    assert(got == (150L to 249L), s"range read must equal the plain filter")
    assert(total == 10, s"zone map must cover all shards, got $total")
    assert(read <= 3, s"a 10% range over 10 range-shards reads at most ~2: $read")

    // the shard list lands in the scan's PARTITION filters — file skipping,
    // not a post-scan filter
    val (pruned, _, _) = ZoneMap.readRange(spark, root, "k", 150L, 249L)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__shard"),
      s"the shard predicate must prune partitions:\n$plan")
  }

  test("bloom point lookup: holding shard never skipped, misses read zero shards") {
    import spark.implicits._
    val root = Files.createTempDirectory("zm_bloom_").toString
    // 1000 rows range-sharded on k; lookups go by the UNSORTED column u
    val df = (1L to 1000L).map(i => (i, i * 7919L % 1000L)).toDF("k", "u")
    ZoneMap.write(df, "k", root, shards = 10, bloomCol = Some("u"))
    val target = 42L
    val expect = (1L to 1000L).filter(i => i * 7919L % 1000L == target)
    val (out, read, total) = ZoneMap.readPoint(spark, root, target)
    assert(out.select("k").as[Long].collect().sorted.toSeq == expect,
      "every holding row survives (one-sided filter)")
    assert(total == 10 && read < 10,
      s"bloom must skip at least some shards for a sparse key: read=$read")
    val (miss, readMiss, _) = ZoneMap.readPoint(spark, root, 999999L)
    assert(miss.count() == 0L, "a missing key returns nothing")
    assert(readMiss <= 2, s"a missing key reads at most false-positive shards: $readMiss")
  }

  test("a crashed append (data+bloom landed, zonemap commit missing) stays invisible to point reads") {
    import spark.implicits._
    val root = Files.createTempDirectory("zm_crash_").toString
    val df = (1L to 100L).map(i => (i, i)).toDF("k", "u")
    ZoneMap.write(df, "k", root, shards = 4, bloomCol = Some("u"))
    // append rows carrying a fresh point-lookup value, then SIMULATE the
    // crash window: data → bloom are on disk, the zonemap generation (the
    // commit record) never landed
    ZoneMap.append((101L to 120L).map(i => (i, 5000L)).toDF("k", "u"), root, shards = 2)
    val zm = java.nio.file.Paths.get(root, "v1", "zonemap", "batch=a4")
    assert(java.nio.file.Files.exists(zm), "test setup: append generation name")
    val walk = java.nio.file.Files.walk(zm)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.delete(f))
    finally walk.close()
    // the uncommitted shards' bloom bits admit u=5000, but survivors must
    // intersect the zonemap COMMIT RECORD — a point read serving them would
    // disagree with the (zonemap-pruned) range read on the same table
    val (pt, read, total) = ZoneMap.readPoint(spark, root, 5000L)
    assert(pt.count() == 0L,
      "point reads must not serve rows of an uncommitted append")
    assert(total == 4 && read == 0, s"no committed shard admits 5000: $read/$total")
    val (rg, _, _) = ZoneMap.readRange(spark, root, "k", 101L, 120L)
    assert(rg.count() == 0L, "range reads agree: the append never committed")
    // committed rows still serve on both paths
    assert(ZoneMap.readPoint(spark, root, 42L)._1.count() == 1L)
    assert(ZoneMap.readRange(spark, root, "k", 1L, 100L)._1.count() == 100L)
    // and the RETRY (same data re-appended) commits and serves
    ZoneMap.append((101L to 120L).map(i => (i, 5000L)).toDF("k", "u"), root, shards = 2)
    assert(ZoneMap.readPoint(spark, root, 5000L)._1.count() == 20L,
      "the retried append must serve once its zonemap generation lands")
  }

  test("multi-column range stats prune on the correlated column too") {
    import spark.implicits._
    val root = Files.createTempDirectory("zm_multi_").toString
    // t correlates with k (same order) — its per-shard stats are selective
    val df = (1L to 1000L).map(i => (i, 10000L + i)).toDF("k", "t")
    ZoneMap.write(df, "k", root, shards = 10, statsCols = Seq("t"))
    val (out, read, total) = ZoneMap.readRanges(spark, root,
      Seq(("t", 10150L, 10249L)))
    assert(out.select("k").as[Long].collect().sorted.toSeq == (150L to 249L))
    assert(total == 10 && read <= 3, s"correlated stats must prune: $read")
    intercept[IllegalArgumentException] {
      ZoneMap.readRanges(spark, root, Seq(("nope", 1L, 2L)))
    }
  }

  test("append lands in fresh shards; reads span generations; compact restores disjoint ranges") {
    import spark.implicits._
    val root = Files.createTempDirectory("zm_app_").toString
    ZoneMap.write((1L to 500L).toDF("k"), "k", root, shards = 5)
    ZoneMap.append((501L to 1000L).toDF("k"), root, shards = 5)
    // correctness across generations
    val (out, _, total) = ZoneMap.readRange(spark, root, "k", 450L, 550L)
    assert(out.select("k").as[Long].collect().sorted.toSeq == (450L to 550L))
    assert(total == 10, s"map must cover both generations: $total")
    // appended data is range-local too: a window inside the APPEND's key
    // space reads only its new shards
    val (_, readNew, _) = ZoneMap.readRange(spark, root, "k", 950L, 1000L)
    assert(readNew <= 2, s"append-window read must stay local: $readNew")
    // OVERLAPPING appends drift: append the same key space again, the
    // old window now touches both generations — compact repairs it
    ZoneMap.append((1L to 500L).map(i => i).toDF("k"), root, shards = 5)
    val (_, readDrift, _) = ZoneMap.readRange(spark, root, "k", 1L, 100L)
    assert(readDrift >= 2, s"overlapping generations must both be read: $readDrift")
    ZoneMap.compact(spark, root, shards = 10)
    val (out2, readC, totalC) = ZoneMap.readRange(spark, root, "k", 1L, 100L)
    assert(totalC == 10 && readC <= 2, s"compaction restores disjoint ranges: $readC/$totalC")
    assert(out2.count() == 200L, "duplicates from the re-append survive compaction (rewrite, not dedup)")
  }

  test("bloom config persists: append and compact keep serving point lookups correctly") {
    import spark.implicits._
    val root = Files.createTempDirectory("zm_meta_").toString
    val mk = (r: Range) => r.map(i => (i.toLong, i.toLong * 7919L % 1000L)).toDF("k", "u")
    ZoneMap.write(mk(1 to 500), "k", root, shards = 5, bloomCol = Some("u"))
    // append WITHOUT re-passing the bloom config: it must come from meta,
    // so the appended shards still carry bloom rows a point lookup probes
    ZoneMap.append(mk(501 to 1000), root, shards = 5)
    val target = 42L
    val expect = (1L to 1000L).filter(i => i * 7919L % 1000L == target)
    val (out, _, total) = ZoneMap.readPoint(spark, root, target)
    assert(out.select("k").as[Long].collect().sorted.toSeq == expect,
      "appended shards must be bloom-probed, not silently skipped")
    assert(total == 10)
    // compact derives the bloom config too: the rewrite reuses shard ids,
    // so a stale bloom here would silently mis-prune — assert it doesn't
    ZoneMap.compact(spark, root, shards = 7)
    val (out2, read2, total2) = ZoneMap.readPoint(spark, root, target)
    assert(out2.select("k").as[Long].collect().sorted.toSeq == expect,
      "post-compaction point lookup must see every holding row")
    assert(total2 == 7 && read2 < 7, s"compacted bloom still prunes: $read2/$total2")
    // a rewrite WITHOUT a bloom column retires the bloom with the old
    // version (the staged-version commit can never leave stale bits under
    // reused shard ids) and point lookups fail loudly
    ZoneMap.write(mk(1 to 100), "k", root, shards = 3)
    assert(!Files.exists(java.nio.file.Paths.get(s"${ZoneMap.tableRoot(root)}/bloom")),
      "rewrite without bloomCol must not carry a bloom into the new version")
    intercept[IllegalArgumentException] {
      ZoneMap.readPoint(spark, root, target)
    }
  }

  test("appendBatch replay (checkpoint re-delivery) supersedes itself — row counts unchanged") {
    import spark.implicits._
    val root = Files.createTempDirectory("zm_replay_").toString
    ZoneMap.write((1L to 500L).toDF("k"), "k", root, shards = 5)
    val batch = (501L to 800L).toDF("k")
    ZoneMap.appendBatch(batch, root, shardsPerBatch = 4, batchId = 0L)
    val (one, _, totalOne) = ZoneMap.readRange(spark, root, "k", 1L, 1000L)
    assert(one.count() == 800L)
    // re-deliver the SAME batch id: data partitions overwrite, map/bloom
    // generation supersedes — nothing duplicates
    ZoneMap.appendBatch(batch, root, shardsPerBatch = 4, batchId = 0L)
    val (two, _, totalTwo) = ZoneMap.readRange(spark, root, "k", 1L, 1000L)
    assert(two.count() == 800L, "replayed batch must not duplicate rows")
    assert(totalTwo == totalOne, "replayed batch must not add map generations")
    // a DIFFERENT batch id is a genuine append
    ZoneMap.appendBatch((801L to 900L).toDF("k"), root, shardsPerBatch = 4, batchId = 1L)
    val (three, _, _) = ZoneMap.readRange(spark, root, "k", 1L, 1000L)
    assert(three.select("k").as[Long].collect().sorted.toSeq == (1L to 900L))
    // and a replay with a DIFFERENT shape (fewer shards with rows) sweeps
    // the prior attempt's stale shard dirs
    ZoneMap.appendBatch((801L to 805L).toDF("k"), root, shardsPerBatch = 4, batchId = 1L)
    val (four, _, _) = ZoneMap.readRange(spark, root, "k", 1L, 1000L)
    assert(four.count() == 805L,
      "replay with shifted range boundaries must leave no stale rows behind")
  }

  test("z-order sharding prunes a 2-D box on both dimensions; single-key sharding cannot") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    // full 64×64 grid — a and b are INDEPENDENT, so per-shard b-stats on an
    // a-sorted layout are useless by construction
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("a", "b")
      .withColumn("zkey", GraftFunctions.zOrderN(Seq(col("a"), col("b")), bits = 6))
    val zroot = Files.createTempDirectory("zm_z_").toString
    ZoneMap.write(grid, "zkey", zroot, shards = 16, statsCols = Seq("a", "b"))
    val sroot = Files.createTempDirectory("zm_s_").toString
    ZoneMap.write(grid, "a", sroot, shards = 16, statsCols = Seq("a", "b"))
    val box = Seq(("a", 0L, 15L), ("b", 0L, 15L)) // an aligned quadrant
    val (zdf, zread, ztotal) = ZoneMap.readRanges(spark, zroot, box)
    val (sdf, sread, _) = ZoneMap.readRanges(spark, sroot, box)
    assert(zdf.count() == 256L && sdf.count() == 256L, "both layouts correct")
    assert(ztotal == 16)
    // the z-layout reads ~the box's share of shards; the a-sorted layout
    // must read every shard overlapping a ∈ [0,15] (1/4 of the key space)
    // because b spans the full range inside each of them
    assert(zread <= 2, s"z-order box read must stay local: $zread")
    assert(sread >= 4 && zread < sread,
      s"single-key layout cannot prune the second dimension: z=$zread vs single=$sread")
  }

  test("rewrites are CAS-versioned with keep-one retention; reads resolve the pointer") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("zm_ver_").toString
    def vdirs(): Seq[String] = {
      val ls = Files.list(java.nio.file.Paths.get(root))
      try ls.iterator().asScala
        .map(_.getFileName.toString).filter(_.matches("v\\d+")).toSeq.sorted
      finally ls.close()
    }
    ZoneMap.write((1L to 100L).toDF("k"), "k", root, shards = 2)
    assert(Files.exists(java.nio.file.Paths.get(root, "CURRENT")),
      "write must commit through the CURRENT pointer")
    ZoneMap.append((101L to 200L).toDF("k"), root, shards = 2)
    ZoneMap.compact(spark, root, shards = 4)
    // retention: the immediately superseded version survives one rewrite
    // cycle (a lock-free reader that resolved v1 mid-scan keeps its files)
    assert(vdirs() == Seq("v1", "v2"),
      s"keep exactly one superseded version, got ${vdirs()}")
    val (out, _, total) = ZoneMap.readRange(spark, root, "k", 1L, 200L)
    assert(out.count() == 200L && total == 4,
      "post-compaction reads resolve through the pointer to the new version")
    // the next rewrite vacuums v1 and keeps v2
    ZoneMap.compact(spark, root, shards = 4)
    assert(vdirs() == Seq("v2", "v3"),
      s"the next rewrite must vacuum v1, got ${vdirs()}")
    assert(ZoneMap.readRange(spark, root, "k", 1L, 200L)._1.count() == 200L)
  }

  test("map is an optimization, not a correctness dependence: boundary rows survive") {
    import spark.implicits._
    val root = Files.createTempDirectory("zm_b_").toString
    // skewed keys: duplicates across the shard boundary
    val df = (Seq.fill(50)(100L) ++ Seq.fill(50)(200L) ++ (1L to 99L)).toDF("k")
    ZoneMap.write(df, "k", root, shards = 4)
    val (out, _, _) = ZoneMap.readRange(spark, root, "k", 100L, 100L)
    assert(out.count() == 50L, "every duplicate of the boundary key survives")
    val (empty, read, _) = ZoneMap.readRange(spark, root, "k", 5000L, 6000L)
    assert(empty.count() == 0L && read == 0, "a miss reads zero shards")
  }
}
