package graft.streaming

import graft.SparkSpec
import graft.operators.DataQuality
import org.apache.spark.sql.functions._

import java.nio.file.Files

class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  // skewed current side vs uniform baseline — every bucket populated on at
  // least one side, some on neither (the spine case)
  private val baseline = (1 to 400).map(i => (i % 100).toDouble).toDF("v")
  private val current = (1 to 300).map(i => ((i % 60) + 20).toDouble).toDF("v")

  test("accumulated streaming PSI equals the one-shot psiDrift bit for bit") {
    val counts = Files.createTempDirectory("drift_counts_").toString
    StreamingDrift.foldBatch(current.filter(col("v") < 40), 0L, "v", 0.0, 120.0, 12, counts)
    StreamingDrift.foldBatch(current.filter(col("v") >= 40), 1L, "v", 0.0, 120.0, 12, counts)
    val baseCounts = DataQuality.bucketCounts(baseline, "v", 0.0, 120.0, 12, "n_base")
    val streamed = StreamingDrift.psiVsBaseline(spark, counts, baseCounts, 12)
      .as[(Int, Long, Long, Double)].collect().toSet
    val oneShot = DataQuality.psiDrift(baseline, current, "v", 0.0, 120.0, 12)
      .as[(Int, Long, Long, Double)].collect().toSet
    assert(streamed == oneShot, "linear counts must make streamed PSI exact")
    assert(oneShot.size == 12, "dense spine: every bucket present")
  }

  test("replaying a batch rewrites the same bytes — no double count") {
    val counts = Files.createTempDirectory("drift_replay_").toString
    StreamingDrift.foldBatch(current, 5L, "v", 0.0, 120.0, 12, counts)
    val once = StreamingDrift.mergedCounts(spark, counts)
      .as[(Int, Long)].collect().toSet
    StreamingDrift.foldBatch(current, 5L, "v", 0.0, 120.0, 12, counts) // recovery replay
    val twice = StreamingDrift.mergedCounts(spark, counts)
      .as[(Int, Long)].collect().toSet
    assert(once == twice, "replay must be idempotent")
  }

  test("end-to-end: file stream in N batches matches the batch PSI") {
    val src = Files.createTempDirectory("drift_src_").toString
    current.repartition(3).write.mode("overwrite").parquet(src)
    val counts = Files.createTempDirectory("drift_e2e_").toString
    val stream = spark.readStream.schema("v DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamingDrift.start(stream, "v", 0.0, 120.0, 12, counts,
      Files.createTempDirectory("drift_ckpt_").toString)
    q.awaitTermination()
    val nBatches = spark.read.parquet(counts).select("batch").distinct().count()
    assert(nBatches == 3, s"expected 3 micro-batches, saw $nBatches")
    val baseCounts = DataQuality.bucketCounts(baseline, "v", 0.0, 120.0, 12, "n_base")
    val streamed = StreamingDrift.psiVsBaseline(spark, counts, baseCounts, 12)
      .as[(Int, Long, Long, Double)].collect().toSet
    val oneShot = DataQuality.psiDrift(baseline, current, "v", 0.0, 120.0, 12)
      .as[(Int, Long, Long, Double)].collect().toSet
    assert(streamed == oneShot)
  }
}
