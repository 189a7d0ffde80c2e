package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection helper: `runMain graft.Explain <query> [sfDir] [reps]`
  * prints the formatted physical plan of a [[SparkEntry.queries]] entry and
  * times `reps` executions (first = cold, rest = warm).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    var lastDf: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to reps) {
      // run 1 must stay cold: queries with eager internal stages (the dedup
      // family) execute during CONSTRUCTION, so even printing the plan first
      // would pre-warm them (round-3 lesson: a 474s cold query looked like
      // 5.9s). The session is reset between reps for the same reason.
      if (i > 1) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      val t0 = System.nanoTime()
      // noop sink: count() would let Catalyst prune unused projections
      lastDf = fn(spark, sfDir)
      lastDf.write.mode("overwrite").format("noop").save()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // explain the LAST rep's frame: reconstructing the query here would
    // re-execute the eager dedup pipelines just to print a plan
    if (lastDf != null) lastDf.explain("formatted")
    spark.stop()
  }
}
