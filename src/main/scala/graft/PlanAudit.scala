package graft

import org.apache.spark.sql.SparkSession

/** Scale-smell audit over every registered query's physical plan: flags the
  * operators that kill 100 TB runs (cartesian products, broadcast
  * nested-loop joins over non-tiny inputs, missing pushdown on filtered
  * scans) and counts exchanges.
  * `runMain graft.PlanAudit [sfDir [queryName...]]` — extra args select a
  * subset, like graft.Verify. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
        // deliberate corpus-loader / explicit repartitions are not shuffle
        // smells — exclude both hash- and round-robin REPARTITION exchanges
        val exchanges = "Exchange (?!(hashpartitioning|roundrobinpartitioning)\\(.*REPARTITION)"
          .r.findAllIn(plan).size
        val flags = (if (cartesian) " CARTESIAN!" else "") + (if (bnlj > 0) s" bnlj=$bnlj" else "")
        println(f"[audit] $name%-24s exchanges=$exchanges%-3d$flags")
      } catch { case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
