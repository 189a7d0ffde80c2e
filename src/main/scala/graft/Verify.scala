package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  * Optional 3rd+ args restrict to a subset of query names (local iteration). */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    // default to the machine size (the driver may not set SPARK_GRAFT_CPUS;
    // the environment is local[32] — 4 threads would 8× the wall time)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // volume-scaled shuffle width via AQE coalesce — derived from the
      // corpus bytes, floored at the core count (see Bench.scala: a flat
      // 512 measurably DOUBLED the containment/streaming families at
      // sf0.1; the width grows only when the volume does)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS",
          GraftWidth.volumeScaled(sfDir, cpus.toInt).toString))
      .config("spark.sql.session.timeZone", "UTC")
      // corpus timestamps are naive-µs parquet — see Tables class doc
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // written BEFORE the query loop: if an external timeout kills the dump
    // midway, the oracle file + partial results still yield a partial
    // correctness score instead of zero.
    // {AUX} → the sf-specific oracle side-table dir (QuerySuite.aux): queries
    // whose candidate generation is hash-based dump candidates there, and the
    // oracle re-derives verification + marks from the dump.
    val auxSub = s"${QuerySuite.auxRoot}/${new java.io.File(sfDir).getName}"
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{AUX}", auxSub))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Queries run CONCURRENTLY on the shared session (Spark schedules
    // concurrent jobs fine; FIFO within the pool): wall time ≈ the few heavy
    // e2e/ML queries instead of the sum of 50+ serial jobs — keeps the full
    // dump inside the driver's per-round budget as the suite grows.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "6").toInt)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .toSeq.sortBy(_._1)
      .map { case (name, fn) =>
        scala.concurrent.Future {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1f s")
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures), scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    spark.stop()
  }
}
