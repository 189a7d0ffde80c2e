package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed word-count extraction, a
  * driver-side merge-table learner over the CAPPED word-frequency vocab,
  * and a corpus tokenizer that encodes the DISTINCT-WORD vocab once and
  * joins token counts back onto documents.
  *
  * Scale design, piece by piece:
  *   - the corpus→(word, count) reduction is the only pass over the raw
  *     text: one shuffle with map-side combine;
  *   - merge LEARNING runs on the word-frequency table, not the corpus —
  *     that table is Zipf-small for any corpus (and `maxVocab` caps the
  *     driver collect regardless), which is exactly how production
  *     tokenizer trainers work: they count words distributed, then learn
  *     merges in RAM over the counts;
  *   - corpus ENCODING tokenizes each distinct word once (|vocab| rows,
  *     never |corpus|) and broadcast/shuffle-joins the per-word token
  *     counts back — a 100 TB corpus pays one explode-join-aggregate.
  *
  * Merge application is rank-ordered left-to-right (the convention of
  * Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units", Algorithm 1 — a PUBLIC paper, cf. PAPERS.md), which the
  * q108 oracle replays independently in DuckDB as a recursive CTE over the
  * dumped merge table: candidate GENERATION (learning) is engine-specific,
  * application and the doc-level rollup are fully re-derived.
  *
  * Reference ground: the reference pipeline tokenizes/featurizes text
  * driver-side per record (update_feature_store.py's per-row transforms);
  * a subword vocabulary is the training-data-pipeline extension of that
  * seam, not a reference port.
  */
object Bpe {

  /** One learned merge; `rank` is 1-based learning order. */
  final case class Merge(rank: Int, left: String, right: String)

  private val NonAlpha = "[^a-z]+"

  private def wordsOf(textCol: String) =
    split(regexp_replace(lower(col(textCol)), NonAlpha, " "), " ")

  /** Normalize to [a-z ] and reduce to (word, n) counts — one shuffle with
    * map-side combine. The normalization regex is mirrored verbatim by the
    * oracle so both engines see the identical vocabulary. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(wordsOf(textCol)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** One merge's left-to-right application: under (a,a), "aaa" becomes
    * [aa, a] — a merged token never re-merges with the symbol that follows
    * in the same pass. Mirrored by the oracle's list_reduce fold. */
  private[functions] def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val buf = mutable.ArrayBuffer.empty[String]
    syms.foreach { s =>
      if (buf.nonEmpty && buf.last == l && s == r) buf(buf.length - 1) = l + r
      else buf += s
    }
    buf.toVector
  }

  /** Encode one word by applying every merge in rank order. */
  private[functions] def encodeWord(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) { case (acc, (l, r)) =>
      applyMerge(acc, l, r)
    }

  /** Learn `numMerges` merges from the top-`maxVocab` words by count.
    * Deterministic end to end: the vocab cap orders (n desc, word) and the
    * best-pair argmax tie-breaks (count desc, pair lexicographic), so
    * reruns produce the identical merge table. Stops early if the vocab is
    * fully merged. */
  def train(wordCounts: DataFrame, numMerges: Int, maxVocab: Int = 100000): Seq[Merge] = {
    var words: Array[(Vector[String], Long)] = wordCounts
      .orderBy(col("n").desc, col("word")).limit(maxVocab)
      .collect().map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1)))
    val merges = Vector.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, r), _) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += Merge(rank, l, r)
        words = words.map { case (syms, n) => (applyMerge(syms, l, r), n) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Tokenize the distinct-word vocab: the one imperative per-row loop in
    * the tokenizer, deliberately confined to |vocab| rows (never |corpus|)
    * with the merge table broadcast — the justified typed-map exception,
    * same class as the declared multimodal codec seam. */
  def encodeVocab(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.sortBy(_.rank).map(m => (m.left, m.right)))
    words.select("word").as[String]
      .map(w => (w, encodeWord(w, bc.value)))
      .toDF("word", "tokens")
  }

  /** Per-document word and BPE token counts: explode the corpus to (doc,
    * word), join the per-word token counts from [[encodeVocab]], roll up
    * per document. Documents with no [a-z] words drop out (both engines
    * agree — the oracle uses the same inner join). */
  def tokensPerDoc(docs: DataFrame, idCol: String, textCol: String, encoded: DataFrame): DataFrame = {
    val docWords = docs
      .select(col(idCol), explode(wordsOf(textCol)).as("word"))
      .filter(length(col("word")) > 0)
    docWords
      .join(encoded.select(col("word"), size(col("tokens")).cast("long").as("wt")), Seq("word"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum(col("wt")).as("n_bpe_tokens"))
  }

  /** End-to-end corpus tokenization with ONE pass over the text: the
    * (doc, word) explode is staged (Catalyst has no CSE across DataFrame
    * reuse — unstaged, the text pass would run for the word counts AND
    * again for the doc rollup), word counts stage on top of it (train
    * collects them, encodeVocab scans them), and the result materializes
    * with its lineage cut before the staging blocks release. `mergeSink`
    * dumps the learned merge table — the oracle replays application from
    * it. */
  def tokenizeCorpus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 100000,
      mergeSink: Option[String] = None): DataFrame = {
    val docWords = docs
      .select(col(idCol), explode(wordsOf(textCol)).as("word"))
      .filter(length(col("word")) > 0)
      .persist()
    docWords.count(): Unit // the one pass over the text
    val wc = docWords.groupBy("word").agg(count(lit(1)).as("n")).persist()
    wc.count(): Unit // narrow (word, n) — Zipf-small
    val merges = train(wc, numMerges, maxVocab)
    mergeSink.foreach { path =>
      val spark = docs.sparkSession
      import spark.implicits._
      merges.map(m => (m.rank, m.left, m.right)).toDF("rank", "l", "r")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
    val out = docWords
      .join(encodeVocab(wc, merges)
        .select(col("word"), size(col("tokens")).cast("long").as("wt")), Seq("word"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum(col("wt")).as("n_bpe_tokens"))
    val result = out.localCheckpoint(eager = true)
    docWords.unpersist(false): Unit
    wc.unpersist(false): Unit
    result
  }
}
