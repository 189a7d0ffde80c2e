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
