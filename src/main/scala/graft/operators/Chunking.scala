package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split documents into fixed-size overlapping
  * character chunks — the step that turns a curated corpus into trainable
  * sequences (every pretraining pipeline ends here; the reference's corpus
  * prep delegates it to the consumer, cf. reference README.md:20-23's
  * training hand-off).
  *
  * Scale shape: map-only. `sequence` + `posexplode` + `substring` all live
  * in one WholeStageCodegen stage over the scan — zero exchanges, so a
  * 100 TB corpus chunks at scan throughput with no shuffle of text at all.
  * Chunk starts are 1, 1+stride, 1+2·stride, … while start ≤ length(text)
  * (empty text still yields one empty chunk, so no document silently
  * disappears); the last chunk may be shorter than `size`.
  */
object Chunking {

  /** One row per (doc, chunk): `idCol`, `chunk_id` (0-based), `chunk`. */
  def chunkByChars(docs: DataFrame, idCol: String, textCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size] (gaps would drop text), got $stride")
    docs
      .select(col(idCol), col(textCol).as("__text"),
        posexplode(sequence(lit(1), greatest(length(col(textCol)), lit(1)), lit(stride))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("__text").substr(col("col"), lit(size)).as("chunk"))
  }
}
