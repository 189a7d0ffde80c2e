package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrefixScanSpec extends SparkSpec {

  test("runningTotal equals the single-task reference, across partitions and ties") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // quality deliberately coarse (0..4) so range-partition boundaries SPLIT
    // tied keys — the tiebreaker must keep the scan exact anyway
    val rows = Seq.tabulate(500)(i =>
      (i.toLong, rng.nextInt(5).toDouble, (rng.nextInt(20) + 1).toLong))
    val df = rows.toDF("id", "q", "v").repartition(13) // scrambled input
    val got = PrefixScan.runningTotal(df,
        Seq(col("q").desc, col("id").asc), col("v"))
      .select("id", "running_total").as[(Long, Long)].collect().toMap
    // reference: driver-side exact scan in the same total order
    val sorted = rows.sortBy { case (id, q, _) => (-q, id) }
    var acc = 0L
    val expected = sorted.map { case (id, _, v) => acc += v; id -> acc }.toMap
    assert(got == expected)
    // and the work was NOT funneled through a single global task: with
    // AQE's small-data coalescing out of the way (it hid the layout above),
    // the scan runs on the range-shuffle's parallelism
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val staged = PrefixScan.runningTotal(df,
        Seq(col("q").desc, col("id").asc), col("v"))
      assert(staged.rdd.getNumPartitions > 1,
        "prefix scan must not funnel through one partition")
      assert(staged.select("id", "running_total").as[(Long, Long)]
        .collect().toMap == expected, "parallel layout must stay exact")
    } finally spark.conf.set(key, prev)
  }

  test("budgetedSelect keeps the exact greedy prefix, boundary inclusive") {
    import spark.implicits._
    // order is id asc; values 10 each; budget 35 -> rows 1,2,3 (30) kept,
    // row 4 would reach 40 > 35 -> dropped
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)).toDF("id", "v")
    val kept = PrefixScan.budgetedSelect(df, Seq(col("id").asc), col("v"), 35L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
    // boundary: budget exactly 40 admits row 4 (inclusive rule)
    val kept2 = PrefixScan.budgetedSelect(df, Seq(col("id").asc), col("v"), 40L)
      .select("id").as[Long].collect().toSet
    assert(kept2 == Set(1L, 2L, 3L, 4L))
  }
}
