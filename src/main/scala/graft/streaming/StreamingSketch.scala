package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CountMin

/** Streaming count-min ingestion: each micro-batch folds its PARTIAL grid
  * into a persisted sketch directory; reading the directory back and summing
  * per cell yields exactly the grid a single batch build would produce —
  * the sketch is a linear summary, so merge is plain addition. This is the
  * 100 TB shape for frequency tracking over an unbounded stream: state per
  * batch is d·w bounded cells (not per-key), and the persisted grid is a
  * restartable, engine-portable artifact (md5-derived buckets, see
  * [[graft.operators.CountMin]]).
  *
  * Replay safety: a batch writes its cells under `batch=<id>` with
  * overwrite, so checkpoint-recovery re-delivery rewrites the same bytes
  * instead of double-counting — the same contract as the minhash index's
  * per-batch subdirs and `FeatureStore.ingest`'s batchId guard.
  */
object StreamingSketch {

  /** Fold one micro-batch: its d×w partial grid → `gridPath/batch=<id>`. */
  def foldBatch(batch: DataFrame, batchId: Long, key: String,
      depth: Int, width: Int, gridPath: String): Unit =
    CountMin.sketch(batch, key, depth, width)
      .coalesce(1) // ≤ d·w cells by construction
      .write.mode("overwrite").parquet(s"$gridPath/batch=$batchId")

  def start(stream: DataFrame, key: String, depth: Int, width: Int,
      gridPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) foldBatch(batch, batchId, key, depth, width, gridPath)
      }
      .trigger(trigger)
      .start()

  /** The merged sketch: per-cell sum over every folded batch. Equals the
    * batch-built grid over the union of all batches, exactly. */
  def mergedGrid(spark: SparkSession, gridPath: String): DataFrame =
    spark.read.parquet(gridPath)
      .groupBy("row", "bucket").agg(sum("c").as("c"))
}
