package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` of selected declared queries to files —
  * the plans/r12 before/after evidence trail.
  *
  *   runMain graft.tools.DumpPlans <outDir> <suffix> <sfDir> <query...>
  *
  * Writes `<outDir>/<query>_<suffix>.txt`. Queries whose pipelines execute
  * eagerly during construction (dedup/index families) are executed as part
  * of building the frame; the dumped plan is the declared query's final
  * frame, exactly what PlanAudit sees. */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS",
          graft.GraftWidth.volumeScaled(sfDir, cpus.toInt).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        println(s"[plans] $name -> $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plans] $name ERROR ${e.getMessage}")
      }
      // release any per-query persisted state so the next query starts clean
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
