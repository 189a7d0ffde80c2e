package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record-per-key (argmax by event time) — the semantic heart of the
  * online store (reference: update_feature_store.py:26-27,38-47 keeps one
  * visible record per customer_id, newest event_time wins; SURVEY.md §2.5 A1).
  *
  * Three equivalent forms, property-tested to agree (LatestPerKeySpec):
  *
  *  - [[viaMaxBy]] — `groupBy(key).agg(max_by(struct(*), struct(time, tiebreaks)))`.
  *    ONE hash shuffle with map-side partial aggregation; no per-partition
  *    sort. This is the scale path: at 100 TB the partial aggregate collapses
  *    each map partition to ≤ |distinct keys| rows before the exchange.
  *  - [[viaWindow]] — `row_number() over (partition by key order by time desc) = 1`.
  *    Shuffle + per-partition sort; kept because it generalizes to top-N and
  *    is the form most readers expect. Strictly more expensive than max_by.
  *  - a streaming form lives in [[graft.streaming.StreamingLatest]]
  *    (flatMapGroupsWithState keeping the max-event-time record per key),
  *    which unlike the reference is correct under out-of-order arrival
  *    (latent bug noted in SURVEY.md §2.8).
  *
  * Ties on event time break deterministically by `tiebreaks` (descending),
  * unlike the reference's arrival-order last-write-wins.
  */
object LatestPerKey {

  /** Scale path: single shuffle, map-side combine. */
  def viaMaxBy(df: DataFrame, keys: Seq[String], time: String, tiebreaks: Seq[String]): DataFrame = {
    val ord = struct((time +: tiebreaks).map(col): _*)
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("__latest"))
      .select(df.columns.map(c => col(s"__latest.`$c`").as(c)): _*)
  }

  /** Window form — shuffle + sort; generalizes to top-N per key. */
  def viaWindow(df: DataFrame, keys: Seq[String], time: String, tiebreaks: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy((col(time).desc +: tiebreaks.map(col(_).desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Top-N generalization of the window form (used by q06). */
  def topNPerKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Skew-guarded form of [[viaMaxBy]]: two-stage salted argmax for corpora
    * where a handful of hot keys dominate (at 100 TB a single celebrity key
    * can exceed one executor's partition). Stage 1 spreads each key over
    * `saltBuckets` sub-partitions (salt = hash of the ordering columns, so
    * it is deterministic and needs no RNG state on executors) and takes a
    * per-bucket argmax; stage 2 reduces the ≤`saltBuckets` survivors per key.
    * Both stages keep map-side combine; result is identical to [[viaMaxBy]]
    * (argmax is associative), property-tested in LatestPerKeySpec.
    *
    * Note: max_by's partial aggregation already collapses each MAP partition
    * to one row per key, so plain [[viaMaxBy]] survives skew in the common
    * case; salting additionally protects the REDUCE side when even the
    * post-combine per-key traffic (one row × n_map_partitions) concentrates —
    * the regime with hundreds of thousands of map tasks. */
  def viaMaxBySalted(
      df: DataFrame,
      keys: Seq[String],
      time: String,
      tiebreaks: Seq[String],
      saltBuckets: Int = 32): DataFrame = {
    val ord = struct((time +: tiebreaks).map(col): _*)
    val payload = struct(df.columns.map(col): _*)
    val salted = df.withColumn("__salt",
      pmod(xxhash64((time +: tiebreaks).map(col): _*), lit(saltBuckets.toLong)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(max_by(payload, ord).as("__latest"))
      .select(keys.map(col) :+ col("__latest"): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(max_by(col("__latest"),
        struct((time +: tiebreaks).map(c => col(s"__latest.`$c`")): _*)).as("__latest"))
      .select(df.columns.map(c => col(s"__latest.`$c`").as(c)): _*)
  }
}
