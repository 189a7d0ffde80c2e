package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT prefix scan (global running total over a total order) —
  * the primitive behind "take the best documents until the token budget is
  * spent". The naive Spark form — `Window.orderBy(...)` with no partition —
  * funnels the whole corpus through ONE task and is the canonical 100 TB
  * scale-killer; this is the three-step textbook alternative, all DataFrame:
  *
  *  1. range-repartition on the order key (one shuffle — the sort every
  *     global scan needs anyway) and PIN the layout (eager localCheckpoint:
  *     per-partition offsets and the final pass must see the SAME rows in
  *     the SAME partitions, and range partitioning re-samples per action);
  *  2. per-partition totals → driver (bounded by the PARTITION COUNT, never
  *     rows — the same boundedness class as a codebook collect), exclusive
  *     prefix offsets computed in driver-side integer math;
  *  3. within-partition running sums (a `partitionBy(pid)` window — every
  *     partition scans in parallel) + broadcast-joined offset.
  *
  * LONG values only, deliberately: integer prefix sums are exact and
  * order-independent, so an independent engine's single `sum() OVER` replays
  * them bit-for-bit (the money-in-cents rule); a double running sum is
  * order-dependent and could never be oracled. */
object PrefixScan {

  /** Add `outCol` = inclusive running total of `value` over the TOTAL order
    * `order` (include a unique tiebreaker — equal keys are otherwise split
    * arbitrarily across range-partition boundaries). `value` must be
    * integral (cast to long). */
  def runningTotal(df: DataFrame, order: Seq[Column], value: Column,
      outCol: String = "running_total",
      reliableDir: Option[String] = Staging.DefaultReliableDir): DataFrame = {
    val spark = df.sparkSession
    val staged = Staging.stage(df
      .withColumn("__v", value.cast("long"))
      .repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id()), reliableDir)
    val totals = staged.groupBy("__pid").agg(sum(col("__v")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged.join(broadcast(offDf), Seq("__pid"))
      .withColumn(outCol, sum(col("__v")).over(w) + col("__off"))
      .drop("__pid", "__v", "__off")
  }

  /** Greedy budgeted selection: keep rows in `order` while the INCLUSIVE
    * running total of `tokens` stays within `budget` (a row that would
    * overshoot is dropped, as is everything after it in the order) — the
    * corpus-curation step "best quality first until N tokens". One range
    * shuffle + parallel windows; nothing global-single-task. */
  def budgetedSelect(df: DataFrame, order: Seq[Column], tokens: Column,
      budget: Long): DataFrame =
    runningTotal(df, order, tokens).filter(col("running_total") <= budget)
}
