package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-guarded equi-join by explicit salting — for the regime AQE's
  * skew-join splitting does not reach: a HOT KEY on the probe side whose
  * matching build rows still fit nowhere (AQE splits oversized shuffle
  * partitions post-hoc, but a single key's rows always hash to ONE task
  * without a salt; and AQE only acts on sort-merge joins it can measure).
  * Classic remedy, composed from public Spark primitives: the probe side
  * gets a deterministic per-row salt, the build side is replicated once per
  * salt bucket, and the join key becomes (key, salt) — a hot key's rows now
  * spread over `saltBuckets` reduce tasks.
  *
  * Cost model: build side × saltBuckets rows through the shuffle — use ONLY
  * when the build side is too big to broadcast and the probe side is
  * skew-concentrated; otherwise `broadcast()` (small build) or the plain
  * join (uniform keys) wins. The salt is xxhash64 over the probe row's
  * columns — deterministic under task retry (a re-executed map task
  * re-derives identical salts; a row-position counter would not after a
  * repartition upstream).
  *
  * Semantics: exactly the plain inner/left join on `keys` (oracled as q79
  * against the unsalted SQL; property-tested for bit-equality in
  * SaltedJoinSpec).
  */
object SaltedJoin {

  def inner(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int = 16): DataFrame =
    joined(left, right, keys, saltBuckets, "inner")

  /** Left join: unmatched probe rows survive with nulls, exactly as unsalted. */
  def left(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int = 16): DataFrame =
    joined(left, right, keys, saltBuckets, "left")

  private def joined(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int, how: String): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltBuckets.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    l.join(r, keys :+ "__salt", how).drop("__salt")
  }
}
