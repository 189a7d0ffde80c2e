package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: pairs (a, b) whose CLOSED intervals
  * [a_lo, a_hi] × [b_lo, b_hi] intersect. With no equi-key, Spark plans a
  * range-predicate join as BroadcastNestedLoop — quadratic row visits the
  * moment neither side fits a broadcast. The standard scale rewrite (used
  * by every production temporal/spatial join) is GRID BUCKETING:
  *
  *   1. explode each interval into the fixed-width grid cells it covers
  *      (`sequence` of cell ids — pure codegen, no UDF);
  *   2. hash equi-join on cell id — a plain shuffle join, AQE-skew-safe;
  *   3. re-check the exact overlap predicate (cell co-residence is a
  *      superset of overlap);
  *   4. de-duplicate pairs that co-reside in several cells WITHOUT a
  *      distinct shuffle: keep only the FIRST shared cell — each side's
  *      first cell ≥ its own lo-cell, and a true overlap guarantees the
  *      pair shares cell max(lo_cell_a, lo_cell_b) — so the predicate
  *      `cell = greatest(a_lo_cell, b_lo_cell)` keeps exactly one copy.
  *
  * Cost is |cells per interval| × rows on each side — choose
  * `cellSeconds` near the typical interval length so that factor stays
  * small. Timestamps are compared in whole microseconds (exact integer
  * algebra end to end).
  */
object IntervalJoin {

  /** @param a     left intervals; columns `aLo`, `aHi` (TimestampType) plus payload
    * @param b     right intervals; columns `bLo`, `bHi` (TimestampType) plus payload
    * @param cellSeconds grid cell width, seconds
    * @return all overlapping (a, b) column pairs, exactly once each */
  def overlapJoin(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      cellSeconds: Long): DataFrame = {
    require(cellSeconds > 0, "cellSeconds must be positive")
    val cellUs = cellSeconds * 1000000L
    def cells(lo: String, hi: String) =
      explode(sequence(
        expr(s"unix_micros($lo) div $cellUs"),
        expr(s"unix_micros($hi) div $cellUs"))).as("__cell")
    val ae = a.select(col("*"), cells(aLo, aHi),
      expr(s"unix_micros($aLo) div $cellUs").as("__lo_cell_a"))
    val be = b.select(col("*"), cells(bLo, bHi),
      expr(s"unix_micros($bLo) div $cellUs").as("__lo_cell_b"))
    ae.join(be, Seq("__cell"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__cell") === greatest(col("__lo_cell_a"), col("__lo_cell_b")))
      .drop("__cell", "__lo_cell_a", "__lo_cell_b")
  }
}
