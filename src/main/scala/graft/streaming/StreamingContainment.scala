package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.dedup.Dedup

/** Streaming QUOTE detection — [[StreamingDedup]]'s asymmetric face: every
  * micro-batch of documents is checked for CONTAINMENT against (and folded
  * into) the persisted containment index via
  * [[graft.dedup.Dedup.containmentIncremental]]. Jaccard-based streaming
  * dedup waves through a new composite that quotes an indexed doc wholesale
  * (tiny symmetric similarity); this gate reports it — both directions: a
  * new doc quoting indexed content (new_container) and a new fragment the
  * corpus already subsumes (new_contained). Emitted rows are the verified
  * pair frame itself, landed in `batch=b<N>` partitions — the
  * effectively-once re-delivery contract shared with [[StreamingDedup]]
  * (a replayed batch overwrites its own partition AND its own index
  * fold-in, never double-reporting).
  *
  * Bootstrap with [[graft.dedup.Dedup.buildContainmentIndex]] first. The
  * index's (df, tok) order stays frozen while the stream runs — lossless
  * by the prefix pigeonhole under any fixed order; rebuild to refresh
  * bucket efficiency after heavy drift (the frozen-centroid caveat). */
object StreamingContainment {

  /** @param candidateSink oracle fixture passthrough — per-micro-batch
    *   dumps under `<sink>/b<batchId>` (shared-path overwrite would keep
    *   only the last batch; per-batch subdirs stay replay-idempotent) */
  def start(
      stream: DataFrame,
      id: String,
      text: String,
      indexPath: String,
      pairsPath: String,
      checkpoint: String,
      thresholdNum: Int = 9,
      thresholdDen: Int = 10,
      trigger: Trigger = Trigger.AvailableNow(),
      candidateSink: Option[String] = None): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Dedup.containmentIncremental(batch, id, text, indexPath,
              batchId = s"b$batchId",
              thresholdNum = thresholdNum, thresholdDen = thresholdDen,
              candidateSink = candidateSink.map(p => s"$p/b$batchId"))
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(pairsPath)
        }
      }
      .trigger(trigger)
      .start()
}

/** Streaming ExactSubstr ingest rewrite — the online face of
  * [[graft.dedup.Dedup.removeDuplicateSpansIncremental]]: every micro-batch
  * of documents is trimmed of the spanLen-token windows the indexed corpus
  * (or an earlier occurrence in the same batch) already contains, the
  * CLEANED docs land in `batch=b<N>` partitions, and the batch's raw
  * window hashes fold into the span index — so a quote of content that
  * streamed in hours ago, in another micro-batch, is still cut.
  * Effectively-once: a replayed batch overwrites its own output partition
  * AND its own index partition. */
object StreamingSpanDedup {

  def start(
      docStream: DataFrame,
      id: String,
      text: String,
      indexPath: String,
      cleanedPath: String,
      checkpoint: String,
      spanLen: Int = 20,
      trigger: Trigger = Trigger.AvailableNow(),
      faithful: Boolean = false): StreamingQuery =
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Dedup.removeDuplicateSpansIncremental(batch, id, text, indexPath,
              batchId = s"b$batchId", spanLen = spanLen, faithful = faithful)
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(cleanedPath)
        }
      }
      .trigger(trigger)
      .start()
}

/** Streaming CCNet paragraph dedup — the online face of
  * [[graft.functions.TextAnalysis.dedupParagraphsIncremental]]: each
  * micro-batch loses the paragraphs the indexed corpus already contains
  * (plus batch-internal repeats), cleaned docs land in `batch=b<N>`
  * partitions, raw paragraph hashes fold into the membership index —
  * effectively-once end to end (replay overwrites its own partitions). */
object StreamingParagraphDedup {

  def start(
      docStream: DataFrame,
      id: String,
      text: String,
      indexPath: String,
      cleanedPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.functions.TextAnalysis.dedupParagraphsIncremental(
              batch, id, text, indexPath, batchId = s"b$batchId")
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(cleanedPath)
        }
      }
      .trigger(trigger)
      .start()
}

/** Streaming ZONE-MAPPED ingest — the online face of
  * [[graft.sources.ZoneMap.appendBatch]]: each micro-batch lands as fresh
  * range-local shards with their map rows (and bloom bits when the table's
  * persisted meta configures them), so a reader's range/point queries keep
  * skipping files while the table grows. EFFECTIVELY-ONCE: shard ids
  * derive from the micro-batch id, so a batch re-delivered after
  * checkpoint recovery overwrites its own data partitions and supersedes
  * its own `batch=b<id>` map/bloom generation — replay never duplicates
  * rows (the `batch=` discipline every other streaming op here uses).
  * Appends never rewrite OTHER batches' files; read amplification drifts
  * as generations overlap in key space — run
  * [[graft.sources.ZoneMap.compact]] on the maintenance schedule (the
  * streaming table format's OPTIMIZE cadence). The sharding key, stats
  * columns, and bloom configuration come from the table's meta — the
  * stream cannot drift from the layout the readers prune against. */
object StreamingZoneMap {

  def start(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      shardsPerBatch: Int,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.sources.ZoneMap.appendBatch(batch, path, shardsPerBatch, batchId)
        }
      }
      .trigger(trigger)
      .start()
}

/** Streaming kNN-GRAPH maintenance — the online face of
  * [[graft.similarity.Similarity.knnGraphAppend]]: each micro-batch of
  * vectors folds into the persisted graph, updating exactly the anchors
  * whose neighborhoods can change (new anchors + stored-probe-cell hits).
  * The generation is derived from the micro-batch id (gen = batchId + 1 —
  * generations start at 1, batch ids at 0), so checkpoint recovery
  * re-delivers into the SAME gen partition: replay overwrites itself, the
  * supersession order stays consistent, and `knnGraphRead` serves a
  * consistent graph at every point between batches.
  *
  * The quantizer stays frozen while the stream runs (the
  * [[StreamingSemanticDedup]] caveat): a moving cell geometry would
  * invalidate the stored probe table that affected-anchor detection
  * depends on. Rebuild index + graph to refresh. */
object StreamingKnnGraph {

  def start(
      vecStream: DataFrame,
      id: String,
      vec: String,
      indexPath: String,
      graphPath: String,
      checkpoint: String,
      k: Int,
      nProbe: Int = 2,
      maxCell: Int = 10000,
      trigger: Trigger = Trigger.AvailableNow(),
      candidateSink: Option[String] = None): StreamingQuery =
    vecStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.similarity.Similarity.knnGraphAppend(batch, id, vec,
            indexPath, graphPath, gen = batchId + 1, k = k, nProbe = nProbe,
            maxCell = maxCell,
            candidateSink = candidateSink.map(p => s"$p/b$batchId")): Unit
        }
      }
      .trigger(trigger)
      .start()
}
