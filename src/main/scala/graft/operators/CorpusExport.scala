package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{hashSplitBucket, portableHash60}

/** Sharded corpus export with an ENGINE-REPLAYABLE integrity manifest — the
  * last step of a training-data pipeline ("write the corpus for the trainer")
  * and the first question asked afterwards ("did all of it land?"). At 100 TB
  * an export is thousands of files over flaky object storage; row counts
  * alone miss corruption and duplication, and re-reading both sides to
  * diff is another full pass. The manifest makes verification O(shards):
  *
  *  - shard assignment is the q164 content-addressed rule (md5 bucket of the
  *    key): any engine re-derives WHERE each row must live, and corpus
  *    growth never reshuffles existing keys the way round-robin does;
  *  - each shard carries `(n_rows, checksum)` where the checksum is an
  *    ORDER-INDEPENDENT sum of per-row digests — a commutative fold is the
  *    only checksum a distributed writer and an independent auditor can both
  *    produce without agreeing on an order;
  *  - the digest is the portable 60-bit md5 of `key <U+0001> payload`, reduced
  *    mod 1e6+3 so a BIGINT sum cannot overflow below ~9×10¹² rows/shard
  *    (ANSI-safe in Spark, and DuckDB's HUGEINT sum casts back losslessly).
  *
  * The manifest is computed FROM THE FILES AS WRITTEN (read-back, not from
  * the in-flight frame), so a lost task retry, short write, or duplicated
  * file shows up as a count/checksum mismatch against the source-side
  * recomputation — which is exactly what the q182 oracle is. */
object CorpusExport {

  private val DigestMod = 1000003L

  /** Per-row integrity digest — exposed so an auditor (or the oracle) can
    * recompute it from the source. */
  def rowDigest(key: org.apache.spark.sql.Column,
      payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(portableHash60(concat(key.cast("string"), lit("\u0001"), payload)),
      lit(DigestMod))

  /** Write `docs` into `shards` content-addressed shard directories under
    * `outPath` (+ `_manifest`), and return the manifest
    * `(shard, n_rows, checksum)` computed from the read-back files. */
  def exportShards(docs: DataFrame, id: String, text: String,
      outPath: String, shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = docs.sparkSession
    docs.withColumn("shard", hashSplitBucket(col(id), shards))
      .write.partitionBy("shard").mode("overwrite").parquet(outPath)
    val manifest = spark.read.parquet(outPath)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(rowDigest(col(id), col(text))).as("checksum"))
    manifest.write.mode("overwrite").parquet(s"$outPath/_manifest")
    spark.read.parquet(s"$outPath/_manifest")
  }

  /** Recompute the manifest from an arbitrary source frame — the audit side
    * of [[exportShards]] (run it on the source table, diff against the
    * stored `_manifest`; any lost, duplicated, or corrupted row moves a
    * count or a checksum). */
  def manifestOf(docs: DataFrame, id: String, text: String,
      shards: Int): DataFrame =
    docs.withColumn("shard", hashSplitBucket(col(id), shards))
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(rowDigest(col(id), col(text))).as("checksum"))

  /** Version diff between two corpus snapshots — the audit question after
    * every refresh ("what did yesterday's crawl actually change?"). One
    * full-outer join on the key with payloads reduced to [[rowDigest]]s
    * FIRST, so the wide text never enters the join's shuffle — both
    * exchanges carry (long, long) rows, and equality-of-digest stands in
    * for equality-of-payload at the family's documented collision noise
    * floor. Statuses: added / removed / changed / unchanged.
    *
    * @return (doc_id, status) for every key present in either snapshot */
  def diffCorpora(before: DataFrame, after: DataFrame, id: String,
      text: String): DataFrame = {
    val b = before.select(col(id).as("doc_id"),
      rowDigest(col(id), col(text)).as("__db"))
    val a = after.select(col(id).as("doc_id"),
      rowDigest(col(id), col(text)).as("__da"))
    b.join(a, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("__db").isNull, lit("added"))
          .when(col("__da").isNull, lit("removed"))
          .when(col("__da") === col("__db"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col("doc_id"), col("status"))
  }

  /** End-to-end export verification: recompute the manifest FROM THE
    * EXPORTED FILES AS THEY ARE NOW and compare to the source-side
    * recomputation — catches write-time corruption AND later object loss
    * (comparing the stored `_manifest` to the source would miss a file that
    * vanished after a clean export, since both sides still describe the
    * intact corpus; the stored artifact is for auditors WITHOUT source
    * access, this method is the one with it). One pass over each side. */
  def verifyExport(spark: SparkSession, source: DataFrame, id: String,
      text: String, outPath: String, shards: Int): Boolean = {
    val onDisk = spark.read.parquet(outPath)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(rowDigest(col(id), col(text))).as("checksum"))
    val recomputed = manifestOf(source, id, text, shards)
    onDisk.exceptAll(recomputed).isEmpty && recomputed.exceptAll(onDisk).isEmpty
  }
}
