package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom filter as relational algebra: the classic semi-join
  * pruning sketch (Bloom '70), built with nothing but a distinct over
  * md5-derived bit positions. Spark ships `bloom_filter_agg` internally,
  * but its bitmap is an opaque engine-specific blob; this one's "bitmap"
  * is a ≤ m-row table of SET bit positions — broadcastable, mergeable
  * (union), persistable as parquet, and reproducible bit-for-bit by any
  * engine that has md5 (the [[CountMin]] portability rationale). That
  * makes the filter's false-positive SET — not just its rate — exactly
  * verifiable cross-engine.
  *
  * At scale: `build` is one map-side-combinable distinct over k·|keys|
  * rows producing ≤ m rows; `mightContain` explodes each probe key into
  * its k bits and broadcast-joins the bit table — no shuffle of the probe
  * side beyond its own dedup. A probe passes iff all k bits are set
  * (one-sided error: members ALWAYS pass; non-members pass with
  * p ≈ (1 - e^(-k·n/m))^k).
  *
  * Null keys hash as absent (md5(null concat) semantics differ across
  * engines) — filter them upstream; membership of NULL is not a defined
  * Bloom question anyway.
  */
object Bloom {

  /** Guard shared by build/mightContain: m must be a usable modulus AND a
    * genuinely broadcastable table. The filter IS a ≤ m-row broadcast of
    * long positions, so the bound is set where the worst-case materialized
    * size (~8–16 B/row) stays safely inside Spark's 8 GB broadcast ceiling:
    * 2²⁸ ≈ 2.7×10⁸ positions ≈ 2–4 GB. (A 2³¹ bound would pass the require
    * and then OOM inside the broadcast exchange — the guard must fail
    * BEFORE the cluster does.) Need more bits? Shard: build one filter per
    * key-hash shard and union the verdicts — each shard stays broadcastable.
    * Long, not Int: sizing from a build-side `count()` (a Long) must not
    * silently wrap (8 × count overflows Int already at ~2.7×10⁸ keys,
    * turning `% m` into negative garbage positions). */
  private val maxReasonableBits = 1L << 28
  private def checkM(m: Long): Unit =
    require(m > 0 && m <= maxReasonableBits,
      s"bloom bitmap size m=$m out of range (0, $maxReasonableBits] — " +
        "shard the filter (one per key-hash shard) instead of growing m")

  /** Bit position of `key` under hash row `i`, in [0, m). */
  def bitPos(key: Column, i: Int, m: Long): Column =
    (conv(substring(md5(concat_ws(":", lit(i), key.cast("string"))), 1, 8),
      16, 10).cast("long") % m).cast("long")

  /** The filter: distinct set-bit positions — at most m rows. */
  def build(df: DataFrame, key: String, k: Int, m: Long): DataFrame = {
    checkM(m)
    (0 until k).map(i => df.select(bitPos(col(key), i, m).as("bit")))
      .reduce(_ unionAll _).distinct()
  }

  /** Per distinct probe key: `might_contain` = all k bits set. `bits` is
    * broadcast (≤ m rows by construction). */
  def mightContain(probes: DataFrame, key: String, bits: DataFrame,
      k: Int, m: Long): DataFrame = {
    checkM(m)
    val exploded = probes.select(col(key)).where(col(key).isNotNull).distinct()
      .select(col(key),
        explode(array((0 until k).map(i => bitPos(col(key), i, m)): _*)).as("bit"))
    exploded.join(broadcast(bits.withColumn("__set", lit(true))), Seq("bit"), "left")
      // duplicate bit positions among a key's k hashes stay consistent:
      // both rows match (or miss) together, so count==k iff all bits set
      .groupBy(key).agg((count(col("__set")) === k).as("might_contain"))
  }
}
