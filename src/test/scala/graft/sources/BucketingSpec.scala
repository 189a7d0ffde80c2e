package graft.sources

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join with zero Exchange and correct results") {
    import spark.implicits._
    val facts = Seq.tabulate(200)(i => (i.toLong % 40, i.toLong, (i * 3 % 17).toDouble))
      .toDF("k", "fid", "v")
    val dims = Seq.tabulate(40)(i => (i.toLong, s"name_$i")).toDF("k", "name")

    Bucketing.writeBucketed(facts, "b_facts", buckets = 8, keys = Seq("k"), sortKeys = Seq("k"))
    Bucketing.writeBucketed(dims, "b_dims", buckets = 8, keys = Seq("k"), sortKeys = Seq("k"))

    // disable broadcast so the bucket-join path (not a broadcast) is exercised
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "b_facts", "b_dims", Seq("k"))
      assert(joined.count() == 200)
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join must not shuffle:\n$physical")
      assert(physical.contains("SortMergeJoin") || physical.contains("ShuffledHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
