package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor,
  StatefulProcessorWithInitialState, StreamingQuery, TimeMode, TimerValues, Trigger, TTLConfig,
  ValueState}

import graft.core.{FeatureGroup, FeatureStore}

/** Streaming ingest — the reference simulates a stream by replaying a CSV
  * row-at-a-time at 1 rec/s into put_record (update_feature_store.py:56-58).
  * Here the same dataflow is a Structured Streaming query: micro-batches
  * flow through `foreachBatch`, which appends offline history and refreshes
  * the online snapshot — idempotent overwrite-snapshot gives effectively-once
  * online semantics (SURVEY.md §2.8).
  */
object StreamingIngest {

  /** Start a streaming ingest into `group`. Caller owns the query lifecycle.
    * The foreachBatch batch id is recorded in the group manifest so a replayed
    * batch (checkpoint recovery re-delivers the last uncommitted batch) is
    * skipped instead of appending duplicate offline rows — effectively-once
    * for BOTH stores, not just the online snapshot. */
  /** @param trigger AvailableNow (default) drains a bounded backlog then
    *                 stops; pass a ProcessingTime/default trigger for a
    *                 long-lived ingest that follows the source. */
  def start(fs: FeatureStore, group: String, stream: DataFrame, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) fs.ingest(group, batch, Some(batchId)): Unit
      }
      .trigger(trigger)
      .start()
}

/** Streaming NEAR-DUP ingest — the streaming face of the incremental dedup
  * flow: every micro-batch dedups against (and folds into) the persisted
  * minhash signature index via [[graft.dedup.Dedup.minhashLshIncremental]],
  * so a duplicate arriving hours after its original — in a different
  * micro-batch — is still caught, which per-batch `dropDuplicates` state
  * cannot do once state is evicted. The index partition for micro-batch N
  * is `batch=b<N>`: checkpoint recovery re-delivers the last uncommitted
  * batch into the SAME partition (overwrite, not double-fold), and the
  * kept-docs output uses the identical per-batch layout — effectively-once
  * end to end, the same contract as [[StreamingIngest]].
  *
  * Bootstrap the index first with `Dedup.buildMinhashIndex` (seed corpus or
  * an empty frame with the right schema).
  */
object StreamingDedup {

  /** @param candidateSink oracle fixture passthrough — each micro-batch
    *   dumps under its own `<sink>/b<batchId>` subdirectory (the dump write
    *   is an overwrite, so a shared path would keep only the LAST batch's
    *   candidates and silently invalidate the oracle under multi-batch
    *   triggers; a replayed batch overwrites its own subdir, keeping the
    *   accumulated dumps replay-idempotent like the index partitions) */
  def start(
      stream: DataFrame,
      id: String,
      text: String,
      indexPath: String,
      keptPath: String,
      checkpoint: String,
      threshold: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow(),
      candidateSink: Option[String] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit, not}
    import graft.dedup.Dedup
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val pairs = Dedup.minhashLshIncremental(batch, id, text, indexPath,
            batchId = s"b$batchId", threshold = threshold,
            candidateSink = candidateSink.map(p => s"$p/b$batchId"))
          val kept = Dedup.incrementalMarks(batch, id, pairs)
            .filter(not(col("is_duplicate"))).select(col("doc_id"))
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
}

/** Streaming IMAGE near-dup ingest — [[StreamingDedup]]'s perceptual-hash
  * face: every micro-batch is converted to image assets, REALLY decoded to
  * 63-bit dHashes ([[graft.multimodal.Multimodal.dHash63]]), and deduped
  * against (and into) the persisted hamming signature index via
  * [[graft.dedup.Dedup.hammingIncremental]] — a brightness-shifted replica
  * of an image ingested hours earlier, in another micro-batch, is still
  * caught. Identical effectively-once contract as [[StreamingDedup]]:
  * per-batch index partitions, per-batch kept output, per-batch candidate
  * dumps. */
object StreamingImageDedup {

  /** @param toAssets converts one micro-batch to the AssetSchema frame the
    *   decoder reads — runs INSIDE foreachBatch so the encode/decode work
    *   stays per-batch (production: the fetch-and-decode stage). */
  def start(
      stream: DataFrame,
      toAssets: DataFrame => DataFrame,
      indexPath: String,
      keptPath: String,
      checkpoint: String,
      bands: Int = 4,
      maxHamming: Int = 3,
      trigger: Trigger = Trigger.AvailableNow(),
      candidateSink: Option[String] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit, not}
    import graft.dedup.Dedup
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // decode ONCE per batch: the hash frame feeds pair generation and
          // the kept-marks join (the q165 double-decode lesson)
          val hashes = graft.multimodal.Multimodal.dHash63(toAssets(batch))
            .filter(col("decode_ok"))
            .select(col("asset_id").as("doc_id"), col("dhash").as("sh"))
            .localCheckpoint(true)
          Dedup.hammingIncrementalMarks(hashes, indexPath,
              batchId = s"b$batchId", bands = bands, maxHamming = maxHamming,
              candidateSink = candidateSink.map(p => s"$p/b$batchId"))
            .filter(not(col("is_duplicate"))).select(col("doc_id"))
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(keptPath)
        }
      }
      .trigger(trigger)
      .start()
  }
}

/** Streaming SEMANTIC near-dup ingest — [[StreamingDedup]]'s vector face:
  * every micro-batch assigns against the FROZEN centroid geometry (flat or
  * two-level, auto-detected from the stored layout), dedups against (and
  * folds into) the persisted vector index via
  * [[graft.dedup.Dedup.semanticDedupIncremental]], so an embedding near-dup
  * arriving hours after its original — in a different micro-batch — is still
  * caught. Identical effectively-once contract as [[StreamingDedup]]: the
  * index partition and the kept-vectors output for micro-batch N are both
  * `batch=b<N>`, so checkpoint re-delivery overwrites instead of
  * double-folding. Bootstrap with `Dedup.buildSemanticIndex` first (the cell
  * geometry must exist before the first batch). */
object StreamingSemanticDedup {

  /** @param candidateSink oracle fixture passthrough — per-micro-batch
    *   `<sink>/b<batchId>` subdirectories, same rationale as
    *   [[StreamingDedup.start]] (a shared overwrite path keeps only the
    *   last batch's dump) */
  def start(
      stream: DataFrame,
      id: String,
      vec: String,
      indexPath: String,
      keptPath: String,
      checkpoint: String,
      threshold: Double = 0.9,
      trigger: Trigger = Trigger.AvailableNow(),
      candidateSink: Option[String] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit, not}
    import graft.dedup.Dedup
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val pairs = Dedup.semanticDedupIncremental(batch, id, vec, indexPath,
            batchId = s"b$batchId", threshold = threshold,
            candidateSink = candidateSink.map(p => s"$p/b$batchId"))
          val kept = Dedup.incrementalMarks(batch, id, pairs)
            .filter(not(col("is_duplicate"))).select(col("doc_id"))
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
}

/** Streaming ANN serving — the online face of the persisted IVFADC index
  * ([[graft.similarity.Similarity.buildIvfadcIndex]]): each micro-batch of
  * QUERY vectors is served FIT-FREE through
  * [[graft.similarity.Similarity.ivfadcTopKIndexed]] (codebook-bounded
  * collects, stage 1 reads only the probe-pruned m-byte codes), and the
  * per-query top-k lands in `batch=b<N>` partitions — the same
  * effectively-once contract as [[StreamingDedup]] (checkpoint re-delivery
  * overwrites its own partition), with per-batch candidate dumps for the
  * oracle. This is the real-time-inference shape for a vector feature:
  * the index is the offline artifact, the stream is the request path. */
object StreamingAnnServe {

  /** @param candidateSink per-micro-batch `<sink>/b<batchId>` dumps (the
    *   [[StreamingDedup.start]] accumulation contract) */
  def start(
      queryStream: DataFrame,
      id: String,
      vec: String,
      indexPath: String,
      outPath: String,
      checkpoint: String,
      k: Int,
      nProbe: Int = 4,
      shortlist: Int = 50,
      excludeSelf: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow(),
      candidateSink: Option[String] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit}
    // the frozen geometry (coarse + PQ codebooks) is loaded ONCE before the
    // stream starts — it is immutable by the index contract, and re-collecting
    // it per micro-batch would put two fixed driver collects on every request
    // batch. Codes + tombstones are still read per batch (they change).
    val model = graft.similarity.Similarity.loadIvfadcModel(
      queryStream.sparkSession, indexPath)
    queryStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.similarity.Similarity.ivfadcTopKIndexed(
              batch.sparkSession, indexPath, batch, id, vec, k = k,
              nProbe = nProbe, shortlist = shortlist, excludeSelf = excludeSelf,
              candidateSink = candidateSink.map(p => s"$p/b$batchId"),
              preloadedModel = Some(model))
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(outPath)
        }
      }
      .trigger(trigger)
      .start()
  }
}

/** Streaming LEXICAL retrieval — the text face of [[StreamingAnnServe]]:
  * each micro-batch of QUERIES (`(query_id, terms array<string>)` rows) is
  * served FIT-FREE from the persisted BM25 index
  * ([[graft.functions.LexicalRetrieval.buildBm25Index]] — bucket-pruned
  * postings scan, broadcast query side, ordered-fold scores), and the
  * per-query top-k lands in `batch=b<N>` partitions — the effectively-once
  * re-delivery contract shared with [[StreamingDedup]]. The index is the
  * offline artifact; the stream is the request path. */
object StreamingBm25Serve {

  def start(
      queryStream: DataFrame,
      indexPath: String,
      outPath: String,
      checkpoint: String,
      id: String = "query_id",
      terms: String = "terms",
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.functions.lit
    queryStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.functions.LexicalRetrieval.bm25TopKIndexed(
              batch.sparkSession, indexPath, batch, id = id, terms = terms,
              k = k, k1 = k1, b = b)
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(outPath)
        }
      }
      .trigger(trigger)
      .start()
  }
}

/** Streaming HYBRID retrieval — both persisted indexes on one request path:
  * each micro-batch of queries carries TEXT TERMS and an EMBEDDING; the
  * lexical arm serves fit-free from the BM25 index
  * ([[graft.functions.LexicalRetrieval.bm25TopKIndexed]]), the dense arm
  * fit-free from the semantic index
  * ([[graft.similarity.Similarity.ivfTopKIndexed]]), and
  * [[graft.similarity.Similarity.rrfFuse]] folds the two rank frames —
  * request-batch-sized end to end, `batch=b<N>` output partitions under the
  * shared effectively-once contract. nProbe is the recall/cost dial; probing
  * every cell makes the dense arm EXACT (the oracle's degeneracy setting). */
object StreamingHybridServe {

  def start(
      queryStream: DataFrame, // (query_id, terms array<string>, qvec array<float>)
      bm25IndexPath: String,
      semIndexPath: String,
      outPath: String,
      checkpoint: String,
      k: Int = 10,
      armK: Int = 20,
      nProbe: Int = 4,
      kRrf: Int = 60,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.functions.LexicalRetrieval
    import graft.similarity.Similarity
    queryStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val lex = LexicalRetrieval.bm25TopKIndexed(s, bm25IndexPath,
              batch.select("query_id", "terms"), k = armK)
            .select("query_id", "doc_id", "rank")
          val sem = Similarity.ivfTopKIndexed(s, semIndexPath,
              batch.select("query_id", "qvec"), "query_id", "qvec",
              k = armK, nProbe = nProbe, excludeSelf = true)
            .select(col("query_id"), col("nbr_id").as("doc_id"),
              col("nbr_rank").as("rank"))
          Similarity.rrfFuse(Seq(lex, sem), k = k, kRrf = kRrf)
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(outPath)
        }
      }
      .trigger(trigger)
      .start()
  }
}

/** Streaming DECONTAMINATION gate — benchmark leak protection on the ingest
  * path: each micro-batch of documents probes the FROZEN benchmark gram
  * index ([[graft.dedup.Dedup.buildGramIndex]]) and docs whose contamination
  * ratio exceeds `maxRatio` are quarantined instead of ingested. Per-batch
  * verdict rows (every doc, with its ratio and the gate decision) land in
  * `verdictPath/batch=b<N>` and the clean docs in `keptPath/batch=b<N>` —
  * both under the effectively-once re-delivery contract shared with
  * [[StreamingDedup]]. This is [[graft.dedup.Dedup.contaminationRatio]]'s
  * audit number turned into an online admission control: the benchmark side
  * is tokenized ONCE offline, each batch pays one gram pass over itself plus
  * one narrow hash semi-join. */
object StreamingDecontamGate {

  def start(
      docStream: DataFrame,
      id: String,
      text: String,
      indexPath: String,
      keptPath: String,
      verdictPath: String,
      checkpoint: String,
      maxRatio: Double = 0.5,
      n: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.dedup.Dedup
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val verdicts = Dedup.contaminationRatioIndexed(batch, id, text,
              indexPath, n)
            .withColumn("quarantined", col("ratio") > maxRatio)
          verdicts
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(verdictPath)
          val clean = verdicts.filter(!col("quarantined")).select(col("doc_id"))
          batch.join(clean, batch(id) === clean("doc_id"), "left_semi")
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(keptPath)
        }
      }
      .trigger(trigger)
      .start()
  }
}

/** Streaming WATCHLIST phrase alerts — content-compliance scanning on the
  * ingest path: each document micro-batch runs the one-pass multi-phrase
  * scan ([[graft.functions.LexicalRetrieval.phraseScan]] — broadcast
  * watchlist, narrow (doc, phrase, start) aggregation, no index, text never
  * shuffles) and every hit lands in `alertPath/batch=b<N>` under the shared
  * effectively-once contract. The shape a brand-safety / policy pipeline
  * runs: the watchlist is small and changes rarely; the corpus streams past
  * once. */
object StreamingPhraseAlert {

  def start(
      docStream: DataFrame,
      id: String,
      text: String,
      phrases: Seq[Seq[String]],
      alertPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.functions.lit
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.functions.LexicalRetrieval.phraseScan(batch, id, text, phrases)
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(alertPath)
        }
      }
      .trigger(trigger)
      .start()
  }
}

/** Streaming CURATION pipeline — the full crawl-ingest request path in one
  * stream, composing the two admission controls this library ships:
  * per micro-batch, (1) every doc probes the FROZEN benchmark gram index
  * and contaminated docs are QUARANTINED ([[StreamingDecontamGate]]'s
  * stage), then (2) the admitted docs near-dup-check against — and fold
  * into — the persisted minhash signature index
  * ([[StreamingDedup]]'s stage), and only novel, clean docs land in
  * `keptPath/batch=b<N>`. Verdicts and per-batch candidate dumps follow the
  * family's effectively-once contracts, so the whole pipeline is
  * crash-replayable and every decision is independently re-derivable. */
object StreamingCurationPipeline {

  def start(
      docStream: DataFrame,
      id: String,
      text: String,
      gramIndexPath: String,
      sigIndexPath: String,
      keptPath: String,
      verdictPath: String,
      checkpoint: String,
      maxRatio: Double = 0.5,
      threshold: Double = 0.5,
      n: Int = 8,
      trigger: Trigger = Trigger.AvailableNow(),
      candidateSink: Option[String] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit, not}
    import graft.dedup.Dedup
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val verdicts = Dedup.contaminationRatioIndexed(batch, id, text,
              gramIndexPath, n)
            .withColumn("quarantined", col("ratio") > maxRatio)
          verdicts
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(verdictPath)
          val admitted = verdicts.filter(not(col("quarantined")))
            .select(col("doc_id"))
          val clean = batch.join(admitted, batch(id) === admitted("doc_id"),
            "left_semi")
          val pairs = Dedup.minhashLshIncremental(clean, id, text,
            sigIndexPath, batchId = s"b$batchId", threshold = threshold,
            candidateSink = candidateSink.map(p => s"$p/b$batchId"))
          val novel = Dedup.incrementalMarks(clean, id, pairs)
            .filter(not(col("is_duplicate"))).select(col("doc_id"))
          clean.join(novel, clean(id) === novel("doc_id"), "left_semi")
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(keptPath)
        }
      }
      .trigger(trigger)
      .start()
  }
}

/** Streaming ENRICHMENT against the online feature store — the serving-side
  * stream-static join: each event micro-batch attaches the store's
  * latest-per-key features by key. The snapshot is re-read PER BATCH
  * through the store's LATEST pointer (not captured once at query start),
  * so concurrent ingests become visible at the next micro-batch — the
  * freshness contract a feature-enrichment stream actually wants. Left
  * join: an unknown key flows through with null features (downstream
  * imputes defaults, the FeatureML convention) rather than dropping the
  * event. Output lands in `batch=b<N>` partitions — the effectively-once
  * re-delivery contract shared with [[StreamingDedup]]. */
object StreamingEnrich {

  def start(
      eventStream: DataFrame,
      fs: graft.core.FeatureStore,
      group: String,
      keyCol: String,
      featureCols: Seq[String],
      outPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit}
    eventStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val online = fs.online(group)
            .select((keyCol +: featureCols).map(col): _*)
          batch.join(online, Seq(keyCol), "left")
            .withColumn("batch", lit(s"b$batchId"))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(outPath)
        }
      }
      .trigger(trigger)
      .start()
  }
}

/** Typed event for the stateful latest-per-key stream (mirrors the events
  * table: key=user_id, event-time=ts). */
case class KeyedEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
    event_type: String, value: Double)

/** Stateful latest-per-key over an unbounded stream —
  * `dropDuplicatesWithinWatermark` cannot express argmax, so this keeps the
  * max-(event-time, event_id) record per key in [[GroupState]]
  * (SURVEY.md §2.5 A1 form ③). Unlike the reference's dict (last-ARRIVAL
  * wins, update_feature_store.py:26-27), this is correct under out-of-order
  * arrival: max EVENT TIME wins — the latent reference bug fixed
  * (SURVEY.md §2.8) and asserted by StreamingSpec.
  */
object StreamingLatest {

  def latestPerKey(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[KeyedEvent, KeyedEvent](GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[KeyedEvent], state: GroupState[KeyedEvent]) =>
          val incoming = rows.reduceOption(max)
          val best = (state.getOption.toSeq ++ incoming.toSeq).reduce(max)
          state.update(best)
          best
      }
  }

  /** [[latestPerKey]] with WATERMARK-DRIVEN state expiry — the unbounded-key
    * form (SURVEY.md §2.8 extension): `NoTimeout` state grows with the key
    * space forever, which a long-lived 100 TB ingest cannot afford. A key
    * whose latest event is older than `ttl` behind the event-time watermark
    * is evicted from the state store (and simply re-enters cold if it ever
    * produces again — latest-per-key state is self-rebuilding, so eviction
    * is safe for serving, it only widens the re-warm window).
    *
    * @param watermarkDelay max expected event-time disorder (watermark lag)
    * @param ttl            how long a quiet key's state is retained past the
    *                       watermark before eviction
    */
  def latestPerKeyWithTTL(
      events: Dataset[KeyedEvent],
      watermarkDelay: String,
      ttl: String): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[KeyedEvent, KeyedEvent](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[KeyedEvent], state: GroupState[KeyedEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val incoming = rows.reduceOption(max)
            val best = (state.getOption.toSeq ++ incoming.toSeq).reduce(max)
            state.update(best)
            // evict once the key has been quiet for `ttl` of event time; the
            // timeout base must sit above the current watermark (engine
            // requirement), which for a late-arriving best can be older
            val base = math.max(best.ts.getTime, state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(base, ttl)
            Iterator.single(best)
          }
      }
  }

  private def max(a: KeyedEvent, b: KeyedEvent): KeyedEvent = {
    val c = a.ts.compareTo(b.ts)
    if (c > 0 || (c == 0 && a.event_id >= b.event_id)) a else b
  }

  /** [[latestPerKey]] on `transformWithState` (Spark 4's arbitrary-state
    * API, the successor to `mapGroupsWithState`): identical argmax
    * semantics, with the differences that matter at 100 TB —
    *   - state lives in named, TYPED handles ([[org.apache.spark.sql
    *     .streaming.ValueState]]) on the RocksDB provider (the API refuses
    *     the HDFS heap provider outright), so per-key state is
    *     disk-backed + changelogged instead of executor heap;
    *   - state TTL is declarative ([[org.apache.spark.sql.streaming
    *     .TTLConfig]]) — the runtime expires quiet keys, replacing
    *     [[latestPerKeyWithTTL]]'s hand-rolled timeout bookkeeping;
    *   - state schema is registered and evolvable (add a field to the
    *     state type without discarding the checkpoint).
    * Output mode Update: one row per key per micro-batch it appears in,
    * exactly like [[latestPerKey]] — the two forms share q11's collapse
    * convention and oracle.
    *
    * @param ttl expire a key's state this long after its last WRITE
    *            (processing time — TWS TTL is wall-clock, unlike the
    *            event-time eviction in [[latestPerKeyWithTTL]]); None =
    *            keep forever (the q11 bounded-drain mode).
    *            CAVEAT: TTL forces TimeMode.ProcessingTime, in which
    *            Spark's `shouldRunAnotherBatch` returns true after EVERY
    *            batch (the operator always wants another chance to advance
    *            its clock) — so a TTL query never drains under
    *            `Trigger.AvailableNow` and busy-loops under the default
    *            0-interval trigger. Run TTL queries with an interval
    *            `ProcessingTime` trigger and stop them explicitly; the
    *            no-TTL form drains normally.
    */
  def latestPerKeyTWS(events: Dataset[KeyedEvent],
      ttl: Option[java.time.Duration] = None): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    // encoder materialized ONCE here on the driver and captured by the
    // processor: deriving it inside init() would run Scala runtime
    // reflection on every executor task thread, which serializes on a
    // global TypeTag lock (measured: all tasks blocked for minutes under
    // a REPL/test classloader)
    val enc = implicitly[org.apache.spark.sql.Encoder[KeyedEvent]]
    events.groupByKey(_.user_id)
      .transformWithState(new LatestProcessor(ttl, enc),
        // TTL is wall-clock, so the engine requires ProcessingTime mode to
        // stamp state writes; without TTL, no clock is needed at all
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  /** The [[latestPerKeyTWS]] state machine: one ValueState holding the
    * current argmax record per key. */
  private class LatestProcessor(ttl: Option[java.time.Duration],
      enc: org.apache.spark.sql.Encoder[KeyedEvent])
      extends StatefulProcessor[Long, KeyedEvent, KeyedEvent] {
    @transient private var best: ValueState[KeyedEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      best = getHandle.getValueState[KeyedEvent]("best", enc,
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[KeyedEvent] = {
      val incoming = rows.reduceOption(max)
      val winner = (Option(best.get()).toSeq ++ incoming.toSeq).reduce(max)
      best.update(winner)
      Iterator.single(winner)
    }
  }

  /** [[latestPerKeyTWS]] WARM-STARTED from a batch frame — the online-store
    * BOOTSTRAP path: at 100 TB you do not replay months of history through
    * the stream to rebuild serving state; you load the offline store's
    * latest-per-key snapshot as the stream job's INITIAL STATE (the
    * `StatefulProcessorWithInitialState` overload, first run only) and
    * stream forward from the cutover point. Argmax semantics make the
    * handoff safe even if the bootstrap frame and the stream overlap: a
    * record seen on both sides resolves to the same winner.
    *
    * @param init one row per key (e.g. `LatestPerKey.viaMaxBy` over the
    *             offline store); keys absent from the stream keep their
    *             bootstrap value in state but never emit — union the
    *             bootstrap frame with the emitted rows and re-collapse for
    *             a full snapshot (q140's convention).
    */
  def latestPerKeyBootstrapped(
      events: Dataset[KeyedEvent],
      init: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    val enc = implicitly[org.apache.spark.sql.Encoder[KeyedEvent]]
    events.groupByKey(_.user_id)
      .transformWithState(new LatestInitProcessor(enc),
        TimeMode.None(), OutputMode.Update(),
        init.groupByKey(_.user_id), enc, enc)
  }

  private class LatestInitProcessor(enc: org.apache.spark.sql.Encoder[KeyedEvent])
      extends StatefulProcessorWithInitialState[Long, KeyedEvent, KeyedEvent, KeyedEvent] {
    @transient private var best: ValueState[KeyedEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      best = getHandle.getValueState[KeyedEvent]("best", enc, TTLConfig.NONE)

    override def handleInitialState(key: Long, initialState: KeyedEvent,
        timerValues: TimerValues): Unit = {
      // argmax against anything already present: initial-state rows carry
      // no ordering guarantee relative to each other or the first batch
      val winner = (Option(best.get()).toSeq :+ initialState).reduce(max)
      best.update(winner)
    }

    override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[KeyedEvent] = {
      val incoming = rows.reduceOption(max)
      val winner = (Option(best.get()).toSeq ++ incoming.toSeq).reduce(max)
      best.update(winner)
      Iterator.single(winner)
    }
  }
}
