package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode-Muthukrishnan '05) as relational algebra: the
  * sub-linear frequency summary for heavy-hitter queries over streams and
  * corpora too large to hold exact per-key counts. The sketch is a d×w
  * integer grid: each key increments one bucket per hash row; an estimate
  * reads back min over its d buckets — always ≥ the true count, with
  * overestimate bounded by collisions (E ≤ N/w per row, min over d rows).
  *
  * Built with NOTHING but groupBy: the grid is a (row, bucket) → count
  * aggregate — d·w ≤ a few thousand result rows regardless of input size,
  * fully map-side combinable, mergeable across partitions/batches/days by
  * construction (counts add). Estimation joins the probe keys' buckets
  * against the tiny grid (broadcast) and takes min over d.
  *
  * Hashes are md5-derived — deterministic, seedless, ENGINE-PORTABLE (the
  * [[graft.functions.GraftFunctions.hashSplitBucket]] rationale): any
  * system can rebuild the identical grid, so estimates are exactly
  * reproducible, not merely bound-compliant.
  */
object CountMin {

  /** Bucket of `key` in hash row `i`, in [0, width). */
  def bucket(key: Column, i: Int, width: Int): Column =
    (conv(substring(md5(concat_ws(":", lit(i), key.cast("string"))), 1, 8),
      16, 10).cast("long") % width).cast("long")

  /** The sketch grid: one (row, bucket, c) tuple per non-empty cell. */
  def sketch(df: DataFrame, key: String, depth: Int, width: Int): DataFrame = {
    val rows = (0 until depth).map { i =>
      df.select(lit(i).as("row"), bucket(col(key), i, width).as("bucket"))
    }
    rows.reduce(_ unionAll _)
      .groupBy("row", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Point estimates for each distinct key in `probes`: min over the d
    * bucket counters. The grid side is bounded by d·w cells — broadcast. */
  def estimate(grid: DataFrame, probes: DataFrame, key: String,
      depth: Int, width: Int): DataFrame = {
    val perRow = probes.select(col(key)).distinct()
      .select(col(key), explode(array((0 until depth).map { i =>
        struct(lit(i).as("row"), bucket(col(key), i, width).as("bucket"))
      }: _*)).as("rb"))
      .select(col(key), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    // left join: a probe key absent from the data can hit an all-empty cell
    perRow.join(broadcast(grid), Seq("row", "bucket"), "left")
      .groupBy(key).agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }
}
