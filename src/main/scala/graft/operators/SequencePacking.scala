package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Greedy packing of documents into fixed token-budget training sequences —
  * the step between curation and tokenization in an LLM data pipeline (every
  * trainer wants ~budget-length sequences, not one short doc per row).
  * Extension surface (north star in BASELINE.json; not in the reference).
  *
  * Packing is a prefix-dependent recurrence (where doc i lands depends on
  * every doc before it), so it cannot be a window function. The distributed
  * shape: shard the corpus by an ENGINE-PORTABLE content hash
  * ([[GraftFunctions.hashSplitBucket]] — the same md5 form the oracle
  * re-derives), run the greedy fold INSIDE each shard as one `aggregate`
  * higher-order function over the shard's (doc_id, n_tok) structs, and emit
  * assignments with `explode`. One shuffle total; the sequential part is
  * bounded by the shard, never the corpus — at 100 TB you raise `nShards`
  * so a shard's id+count structs (16 bytes/doc) stay executor-sized, and
  * shards pack in parallel across the cluster. Only ids and counts are
  * collected — document text never enters the fold.
  *
  * Determinism: shards are content-addressed and docs pack in ascending
  * doc_id order within a shard (`array_sort` on the collected structs), so
  * the assignment is a pure function of the corpus — reruns, engines, and
  * cluster layouts all agree (same auditability argument as the q52 split).
  */
object SequencePacking {

  /** Assign each document to a (shard, seq_id, seq_offset) training slot.
    *
    * Greedy first-fit-in-order per shard: docs are taken in ascending id
    * order; a doc opens a new sequence when it would overflow `budget` and
    * the current sequence is non-empty. A doc longer than `budget` occupies
    * a sequence alone (truncation is the tokenizer's call, not the
    * packer's); zero-token docs ride along at their current offset.
    *
    * @return (doc_id, shard, seq_id, seq_offset, n_tokens) — one row per doc
    */
  def packSequences(
      docs: DataFrame,
      id: String,
      text: String,
      budget: Long,
      nShards: Int = 32): DataFrame =
    packFromCounts(
      docs.select(col(id).as("__pid"),
        GraftFunctions.tokenCountWs(col(text)).cast("long").as("__ptok")),
      "__pid", "__ptok", budget, nShards)

  /** Packing over PRE-COMPUTED token counts — the narrow entry point for
    * pipelines that already carry a count (e.g. repetitionStats' n_tokens):
    * only (id, count) rows enter the shard shuffle, the text is never
    * re-tokenized or moved. */
  def packFromCounts(
      counts: DataFrame,
      id: String,
      nTok: String,
      budget: Long,
      nShards: Int = 32): DataFrame = {
    val outT = "array<struct<doc_id:bigint,n_tok:bigint,seq_id:bigint,seq_offset:bigint>>"
    val base = counts.select(
      col(id).cast("long").as("doc_id"),
      col(nTok).cast("long").as("n_tok"),
      GraftFunctions.hashSplitBucket(col(id), nShards).as("shard"))
    base
      .groupBy("shard")
      .agg(array_sort(collect_list(struct(col("doc_id"), col("n_tok")))).as("ds"))
      .select(col("shard"), explode(aggregate(
        col("ds"),
        struct(lit(0L).as("seq"), lit(0L).as("fill"), array().cast(outT).as("out")),
        (acc, d) => {
          val t = d.getField("n_tok")
          val newBin = (acc.getField("fill") + t > lit(budget)) &&
            (acc.getField("fill") > lit(0L))
          val seq = when(newBin, acc.getField("seq") + 1L).otherwise(acc.getField("seq"))
          val off = when(newBin, lit(0L)).otherwise(acc.getField("fill"))
          struct(
            seq.as("seq"),
            (off + t).as("fill"),
            concat(acc.getField("out"), array(struct(
              d.getField("doc_id").as("doc_id"), t.as("n_tok"),
              seq.as("seq_id"), off.as("seq_offset")))).as("out"))
        },
        acc => acc.getField("out"))).as("e"))
      .select(col("e.doc_id").as("doc_id"), col("shard"),
        col("e.seq_id").as("seq_id"), col("e.seq_offset").as("seq_offset"),
        col("e.n_tok").as("n_tokens"))
  }
}
