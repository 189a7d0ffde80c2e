package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.functions.LmPerplexity

/** Streaming PERPLEXITY admission gate — the CCNet filter on the ingest
  * path: each micro-batch of documents is scored FIT-FREE against the
  * frozen persisted LM ([[graft.functions.LmPerplexity.buildLmIndex]]) and
  * only docs whose per-token log-perplexity clears the threshold are
  * admitted. The companion of [[StreamingCuration]]'s dedup/decontamination
  * gates: that pipeline asks "have we seen this before / does it leak
  * eval?", this one asks "is it fluent under the trusted distribution?" —
  * together they are the ingest-time curation stack.
  *
  * The LM is the OFFLINE artifact and must be frozen while the stream runs
  * (scoring against a moving model would make admission replay-dependent);
  * accepted docs land in `batch=b<N>` partitions — the effectively-once
  * re-delivery contract shared with [[StreamingDedup]] (a checkpoint-
  * replayed batch overwrites its own partition). Per-batch cost is the
  * fit-free scoring join: batch-sized bigram rows against the bucket-pruned
  * count tables — input-volume-bound, no state store needed (the model IS
  * the state, persisted and immutable). */
object StreamingPerplexityGate {

  /** READ CONTRACT for `keptPath`: a gate may legitimately admit ZERO
    * docs (an absolute threshold against a shifted corpus — a 100×
    * vocabulary raises every smoothed logppl), in which case the sink
    * holds no parquet footer to infer a schema from. Readers pass the doc
    * schema explicitly (`spark.read.schema(...).parquet(keptPath)`) —
    * they own it, the gate is a filter. The alternative (seeding an empty
    * unpartitioned file) would collide with the `batch=` partition layout
    * of later non-empty batches.
    *
    * @param maxLogPpl admit docs with `logppl <= maxLogPpl`; docs with no
    *   bigram (fewer than 2 tokens) are REJECTED — the model cannot assess
    *   them, and an unassessable doc passing a quality gate is the unsafe
    *   default (mirrored by the oracle).
    * @param scoreSink optional per-batch score dump under `<sink>/b<id>`
    *   (the [[StreamingDedup]] accumulation contract — an oracle fixture,
    *   not a serving output) */
  def start(
      docStream: DataFrame,
      id: String,
      text: String,
      indexPath: String,
      keptPath: String,
      checkpoint: String,
      maxLogPpl: Double,
      trigger: Trigger = Trigger.AvailableNow(),
      scoreSink: Option[String] = None): StreamingQuery =
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val scored = LmPerplexity.perplexityIndexed(
            batch.sparkSession, indexPath, batch, id, text)
          scoreSink.foreach { p =>
            scored.write.mode("overwrite").parquet(s"$p/b$batchId")
          }
          val kept = scored
            .filter(col("n_bigrams") > 0 && col("logppl") <= lit(maxLogPpl))
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
