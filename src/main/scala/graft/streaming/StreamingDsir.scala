package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.functions.Dsir

/** Streaming DSIR admission gate — importance resampling on the ingest
  * path: each micro-batch of documents is scored FIT-FREE against the
  * frozen persisted DSIR model ([[graft.functions.Dsir.buildDsirIndex]])
  * and only docs whose average log importance ratio clears the threshold
  * are admitted. The third leg of the ingest curation stack:
  * [[StreamingCuration]] asks "have we seen this / does it leak eval?",
  * [[StreamingPerplexityGate]] asks "is it fluent under the trusted LM?",
  * this one asks "does it LOOK LIKE the trusted corpus rather than the
  * pool?" (Xie '23).
  *
  * The model is the OFFLINE artifact and must be frozen while the stream
  * runs (a moving model would make admission replay-dependent); accepted
  * docs land in `batch=b<N>` partitions — the effectively-once re-delivery
  * contract shared with [[StreamingDedup]]. Per-batch cost is the fit-free
  * scoring join: batch-sized feature rows against the ≤`buckets`-row count
  * tables (a genuine broadcast) — input-volume-bound, no state store (the
  * model IS the state, persisted and immutable). */
object StreamingDsirGate {

  /** @param minLogratio admit docs with `logratio >= minLogratio` (0.0 =
    *   "more target-like than pool-like"); docs with no feature (no
    *   tokens) are REJECTED — the model cannot assess them, and an
    *   unassessable doc passing a quality gate is the unsafe default
    *   (mirrored by the oracle).
    * @param scoreSink optional per-batch score dump under `<sink>/b<id>`
    *   (an oracle fixture, not a serving output) */
  def start(
      docStream: DataFrame,
      id: String,
      text: String,
      indexPath: String,
      keptPath: String,
      checkpoint: String,
      minLogratio: Double,
      trigger: Trigger = Trigger.AvailableNow(),
      scoreSink: Option[String] = None): StreamingQuery =
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val scored = Dsir.importanceIndexed(
            batch.sparkSession, indexPath, batch, id, text)
          scoreSink.foreach { p =>
            scored.write.mode("overwrite").parquet(s"$p/b$batchId")
          }
          val kept = scored
            .filter(col("n_feats") > 0 && col("logratio") >= lit(minLogratio))
            .select("doc_id")
          batch.join(kept, batch(id) === kept("doc_id"), "left_semi")
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(keptPath)
        }
      }
      .trigger(trigger)
      .start()
}
