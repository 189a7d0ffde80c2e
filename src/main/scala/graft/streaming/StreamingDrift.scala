package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.DataQuality

/** Streaming feature-drift monitoring: each micro-batch folds its fixed-width
  * BUCKET COUNTS (the linear summary PSI is computed from) into a persisted
  * histogram directory; the PSI terms against a frozen baseline are derived
  * at read time from the accumulated counts. Summing per-batch histograms
  * yields exactly the one-shot histogram — the [[StreamingSketch]] linearity
  * argument — so the streaming monitor's PSI equals the batch
  * [[DataQuality.psiDrift]] over the union of all batches, bit for bit.
  *
  * This is the 100 TB serving-side drift gate: state per batch is ≤ nBuckets
  * rows (never per-key/per-value), the persisted histogram is a restartable
  * engine-portable artifact, and the baseline is a FROZEN ≤ nBuckets-row
  * table computed once at deploy time — exactly how production monitors pin
  * the training distribution.
  *
  * Replay safety: a batch writes its counts under `batch=<id>` with
  * overwrite, so checkpoint-recovery re-delivery rewrites the same bytes
  * instead of double-counting — the StreamingSketch / minhash-index
  * contract.
  */
object StreamingDrift {

  /** Fold one micro-batch: its bucket histogram → `countsPath/batch=<id>`. */
  def foldBatch(batch: DataFrame, batchId: Long, valueCol: String,
      lo: Double, hi: Double, nBuckets: Int, countsPath: String): Unit =
    DataQuality.bucketCounts(batch, valueCol, lo, hi, nBuckets, "n_cur")
      .coalesce(1) // ≤ nBuckets rows by construction
      .write.mode("overwrite").parquet(s"$countsPath/batch=$batchId")

  def start(stream: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBuckets: Int, countsPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          foldBatch(batch, batchId, valueCol, lo, hi, nBuckets, countsPath)
      }
      .trigger(trigger)
      .start()

  /** Accumulated current-side histogram: per-bucket sum over every folded
    * batch. Equals the one-shot histogram over the union of all batches,
    * exactly (counts are linear). */
  def mergedCounts(spark: SparkSession, countsPath: String): DataFrame =
    spark.read.parquet(countsPath)
      .groupBy("bucket").agg(sum("n_cur").as("n_cur"))

  /** PSI terms of the accumulated stream against a frozen baseline-count
    * table `(bucket, n_base)` — bit-identical to the batch
    * [[DataQuality.psiDrift]] over the same data. */
  def psiVsBaseline(spark: SparkSession, countsPath: String,
      baselineCounts: DataFrame, nBuckets: Int): DataFrame =
    DataQuality.psiFromCounts(baselineCounts,
      mergedCounts(spark, countsPath), nBuckets)
}
