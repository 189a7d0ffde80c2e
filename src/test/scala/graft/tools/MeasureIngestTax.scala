package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.{FType, FeatureDef, FeatureGroup, FeatureStore}

/** Bisect the fixed per-commit ingest tax (VERDICT r10 item 2 — the q59
  * +50% driver-tail regression) into its terms, using the store's own
  * [[FeatureStore.lastCommitPhases]] breakdown. Reproduces the q59 shape:
  * a FRESH store, one bootstrap ingest of the sf0.1 events slice, then a
  * small incremental batch, then an explicit full rebuild (the only path
  * that still pays a sizing count — the ingest bootstrap now sizes its
  * buckets from the append job's observed approx-distinct key count).
  *
  *   sbt "Test/runMain graft.tools.MeasureIngestTax /root/testdata/sf0.1"
  */
object MeasureIngestTax {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors)}]")
      .config("spark.sql.shuffle.partitions",
        math.min(32, Runtime.getRuntime.availableProcessors))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val group = FeatureGroup("TaxBench", "user_id", "ts", Seq(
      FeatureDef("user_id", FType.Integral),
      FeatureDef("event_id", FType.Integral),
      FeatureDef("ts", FType.FTimestamp),
      FeatureDef("value", FType.Fractional)))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // `skip`: phases recorded before this op (ingest resets the buffer;
    // a standalone refreshOnline appends to it)
    def show(label: String, total: Double, fs: FeatureStore, skip: Int = 0): Unit = {
      val phases = fs.lastCommitPhases("TaxBench").drop(skip)
      val accounted = phases.map(_._2).sum
      val detail = phases.map { case (n, s) => f"$n=${s * 1000}%.0f ms" }.mkString(" ")
      println(f"[tax] $label%-22s total=${total * 1000}%.0f ms " +
        f"(accounted=${accounted * 1000}%.0f ms) $detail")
    }

    val views = Tables.events(spark, sfDir).filter(col("event_type") === "view")
    // warm the source read once so the first measured ingest is not
    // charged the parquet footer/listing cold start
    views.count(): Unit

    (1 to 3).foreach { round =>
      val dir = Files.createTempDirectory("graft_taxbench_").toString
      val fs = new FeatureStore(spark, dir)
      fs.createGroup(group)
      val (_, boot) = time(fs.ingest("TaxBench", views))
      show(s"bootstrap_ingest r$round", boot, fs)
      val batch = views.limit(64)
      val (_, inc) = time(fs.ingest("TaxBench", batch))
      show(s"incremental_ingest r$round", inc, fs)
      val skip = fs.lastCommitPhases("TaxBench").size
      val (_, full) = time(fs.refreshOnline(group, None))
      show(s"explicit_rebuild r$round", full, fs, skip)
    }
    spark.stop()
  }
}
