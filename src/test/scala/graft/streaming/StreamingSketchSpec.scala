package graft.streaming

import graft.SparkSpec
import graft.operators.CountMin
import org.apache.spark.sql.functions._

import java.nio.file.Files

class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private val data = (1L to 30L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("k")

  test("merge of per-batch folds equals the one-shot grid, cell for cell") {
    val gridPath = Files.createTempDirectory("sketch_grid_").toString
    StreamingSketch.foldBatch(data.filter(col("k") <= 10), 0L, "k", 4, 64, gridPath)
    StreamingSketch.foldBatch(data.filter(col("k") > 10 && col("k") <= 20), 1L, "k", 4, 64, gridPath)
    StreamingSketch.foldBatch(data.filter(col("k") > 20), 2L, "k", 4, 64, gridPath)
    val merged = StreamingSketch.mergedGrid(spark, gridPath)
    val whole = CountMin.sketch(data, "k", 4, 64)
    assert(merged.unionAll(whole).distinct().count() == whole.count(),
      "stream-merged grid must equal the batch grid exactly")
  }

  test("replaying a batch rewrites the same bytes — no double count") {
    val gridPath = Files.createTempDirectory("sketch_replay_").toString
    StreamingSketch.foldBatch(data, 7L, "k", 4, 64, gridPath)
    val once = StreamingSketch.mergedGrid(spark, gridPath)
      .as[(Int, Long, Long)].collect().toSet
    StreamingSketch.foldBatch(data, 7L, "k", 4, 64, gridPath) // checkpoint-recovery replay
    val twice = StreamingSketch.mergedGrid(spark, gridPath)
      .as[(Int, Long, Long)].collect().toSet
    assert(once == twice, "replay must be idempotent")
  }

  test("end-to-end: file stream in N batches builds the exact batch grid") {
    val src = Files.createTempDirectory("sketch_src_").toString
    data.repartition(3).write.mode("overwrite").parquet(src)
    val gridPath = Files.createTempDirectory("sketch_e2e_").toString
    val stream = spark.readStream.schema("k LONG")
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamingSketch.start(stream, "k", 4, 64, gridPath,
      Files.createTempDirectory("sketch_ckpt_").toString)
    q.awaitTermination()
    val nBatches = spark.read.parquet(gridPath).select("batch").distinct().count()
    assert(nBatches == 3, s"expected 3 micro-batches, saw $nBatches")
    val merged = StreamingSketch.mergedGrid(spark, gridPath)
    val whole = CountMin.sketch(data, "k", 4, 64)
    assert(merged.unionAll(whole).distinct().count() == whole.count())
  }
}
