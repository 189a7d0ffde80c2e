package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, minimize both dimensions): keep the rows
  * no other row dominates, where `o` dominates `p` iff o.x ≤ p.x ∧
  * o.y ≤ p.y with at least one strict. The multi-objective "best
  * tradeoffs" operator (Börzsönyi et al., ICDE '01) — e.g. cheapest vs
  * smallest, fastest vs most accurate.
  *
  * The naive formulation is a quadratic self-join; the 2-D structure
  * admits a sort-sweep: scanning by ascending x, a row survives iff its y
  * beats the running min-y of everything before it. A single global
  * window would serialize that sweep onto one partition, so the sweep is
  * BUCKETED with a carry-in stitch (the
  * [[AsOfJoin.backwardBucketed]] trick):
  *
  *  1. bucket rows by x-range (`floor(x / bucketWidth)` — bucket order =
  *     x order);
  *  2. per-bucket min-y: a map-side-combinable groupBy, one tiny row per
  *     bucket;
  *  3. running min over STRICTLY earlier buckets — a window over ≤ a few
  *     thousand bucket rows (the only single-partition step, bounded by
  *     the bucket count, never by |rows|);
  *  4. within each bucket (parallel over buckets): min-y over x' < x via
  *     a RANGE frame, min-y among ties of x via a partition — seeded with
  *     the bucket's carry-in.
  *
  * Dominated iff min-y over {x' < x} ≤ y (x is strictly better, y no
  * worse) or min-y over {x' = x} < y (x ties, y strictly better). Exact
  * duplicate (x, y) pairs all survive together — no strict edge exists —
  * matching the NOT EXISTS relational definition.
  *
  * Dimensions must be integer-valued (cast currency to cents upstream):
  * the RANGE frame bound and bucket floor both need exact arithmetic.
  */
object Skyline {

  /** @param bucketWidth x-units per bucket: size so (x-range / width) is
    *   hundreds-to-thousands of buckets — enough parallelism for step 4,
    *   small enough that step 3's window stays trivially cheap. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pts = df.withColumn("__bucket", floor(col(xCol) / bucketWidth))
    val bmin = pts.groupBy("__bucket").agg(min(yCol).as("__bmin"))
    val wb = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    val carry = bmin.withColumn("__carry", min("__bmin").over(wb)).drop("__bmin")
    val wLt = Window.partitionBy("__bucket").orderBy(col(xCol).cast("long"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy("__bucket", xCol)
    pts.join(broadcast(carry), Seq("__bucket"))
      // least() ignores nulls: null iff NO row has smaller x (global min x)
      .withColumn("__minLt", least(min(col(yCol)).over(wLt), col("__carry")))
      .withColumn("__minEq", min(col(yCol)).over(wEq))
      .filter((col("__minLt").isNull || col("__minLt") > col(yCol)) &&
        col("__minEq") === col(yCol))
      .drop("__bucket", "__carry", "__minLt", "__minEq")
  }
}
