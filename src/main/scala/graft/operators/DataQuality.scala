package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ/Great-
  * Expectations capability, re-expressed as plain aggregates): a pipeline
  * gate that every production ingest runs BEFORE publishing a table. Each
  * check is one aggregate expression; all checks on a table evaluate in a
  * SINGLE scan (one agg row, unpivoted to one row per check) — at 100 TB
  * the scan is the cost and N checks must not mean N scans. Referential
  * integrity is the one check that genuinely needs a second table: a
  * left-anti count against the (usually broadcast-small) parent keys.
  *
  * Metrics are exact integer counts or ppm ratios — no doubles, so the
  * verdict is bit-identical on any engine and safe to alert on.
  */
object DataQuality {

  /** One single-table constraint: `violations` must evaluate to the COUNT
    * of violating rows (0 = clean) under a plain `agg`. */
  final case class Check(name: String, violations: Column)

  /** Count of rows in `child` whose `childKey` has no match in `parent` —
    * orphaned foreign keys. Null child keys are not orphans (SQL FK
    * semantics); catch those with a separate completeness check. */
  def referentialViolations(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))

  /** Run all `checks` against `df` in one scan; append any pre-computed
    * single-row (name, violations) frames (e.g. referential checks).
    * Output: (check_name, n_violations, n_rows, violation_ppm, pass). */
  def run(spark: SparkSession, df: DataFrame, checks: Seq[Check],
      extra: Seq[(String, DataFrame)] = Nil): DataFrame = {
    require(checks.nonEmpty || extra.nonEmpty, "no checks given")
    val aggs = count(lit(1)).as("__n") +:
      checks.map(c => c.violations.cast("long").as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = if (checks.isEmpty) Nil else Seq(
      one.select(col("__n"), expr(
        checks.map(c => s"'${c.name}', `${c.name}`")
          .mkString(s"stack(${checks.size}, ", ", ", ") AS (check_name, n_violations)")))
        .select("__n", "check_name", "n_violations"))
    val extras = extra.map { case (name, v) =>
      v.crossJoin(df.agg(count(lit(1)).as("__n")))
        .select(col("__n"), lit(name).as("check_name"),
          col("violations").cast("long").as("n_violations"))
    }
    (stacked ++ extras).reduce(_ unionByName _)
      .select(col("check_name"),
        col("n_violations"),
        col("__n").as("n_rows"),
        // integer `div`, not `/`: Column `/` is double division, and a
        // truncated double quotient can be 1 ppm off the exact integer
        // result once n_violations·10⁶ exceeds 2⁵³ — `div` keeps the
        // "bit-identical on any engine" contract exact at every scale
        expr("n_violations * 1000000 div __n").as("violation_ppm"),
        (col("n_violations") === 0).as("pass"))
  }

  /** Violation-count builders (each is a single agg expression). */
  def notNull(c: String): Check =
    Check(s"complete_$c", count(when(col(c).isNull, 1)))
  /** count(*) − countDistinct counts every duplicate occurrence beyond the
    * first AND every null row (countDistinct skips nulls) — i.e. the
    * violation count of "non-null unique key". */
  def unique(c: String): Check =
    Check(s"unique_$c", count(lit(1)) - countDistinct(col(c)))
  def inSet(c: String, allowed: Seq[String]): Check =
    Check(s"domain_$c", count(when(!col(c).isin(allowed: _*), 1)))
  def bound(c: String, pred: Column => Column): Check =
    Check(s"bound_$c", count(when(!pred(col(c)), 1)))

  /** One-scan all-columns EXACT profile (the data-catalog primitive):
    * per column — row count, null count, exact distinct count, min and max
    * rendered through `repr`. Everything evaluates in a SINGLE `agg`
    * (Catalyst plans the multi-column distinct as one Expand pass —
    * N columns must not mean N scans at 100 TB); the one agg row unpivots
    * via `stack` to a row per column.
    *
    * `repr` maps a VALUE column to its canonical cross-engine string form
    * (applied AFTER min/max — repr(min(x)), never min(repr(x)): string
    * order would put "10" before "9"). Default: plain string cast — exact
    * for integers/strings; give doubles and timestamps an explicit repr
    * (integer cents, a fixed datetime format) when the profile must be
    * engine-portable. */
  /** @param approxDistinct swap the EXACT distinct counts for HyperLogLog++
    *   `approx_count_distinct` (±~2.3%). The exact form plans the N-column
    *   multi-distinct as an Expand — an N× row multiplier feeding the
    *   aggregate, fine at survey scale but a real cost on a 100 TB scan;
    *   the approx form is a plain single-pass aggregate (no Expand, no row
    *   multiplication), which is what a catalog profile job should run at
    *   full scale. Oracled queries keep exact (DuckDB must match). */
  def profile(df: DataFrame,
      repr: Map[String, Column => Column] = Map.empty,
      approxDistinct: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    // source refs are backtick-escaped; internal agg aliases are keyed by
    // POSITION and the visible label rides as a lit() — a user column name
    // (quotes, backticks, dots) never enters a parsed SQL fragment
    def src(c: String): Column = col(s"`${c.replace("`", "``")}`")
    def rep(c: String)(v: Column): Column =
      repr.getOrElse(c, (x: Column) => x.cast("string"))(v)
    def nd(c: String): Column =
      if (approxDistinct) approx_count_distinct(src(c)) else countDistinct(src(c))
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(when(src(c).isNull, 1)).as(s"__nn_$i"),
        nd(c).as(s"__nd_$i"),
        rep(c)(min(src(c))).as(s"__mn_$i"),
        rep(c)(max(src(c))).as(s"__mx_$i"))
    }
    // unpivot: explode over an array of per-column structs — the same
    // single Generate the stack() string built, minus the string
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"),
        col(s"__nn_$i").cast("long").as("n_nulls"),
        col(s"__nd_$i").cast("long").as("n_distinct"),
        col(s"__mn_$i").as("min_repr"), col(s"__mx_$i").as("max_repr"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), explode(array(entries: _*)).as("__p"))
      .select(col("__p.column").as("column"), col("__n").as("n_rows"),
        col("__p.n_nulls").as("n_nulls"), col("__p.n_distinct").as("n_distinct"),
        col("__p.min_repr").as("min_repr"), col("__p.max_repr").as("max_repr"))
  }

  /** Population Stability Index per bucket — THE standard drift metric a
    * feature-monitoring pipeline computes between a baseline and a current
    * feature distribution before trusting a model on new data:
    * PSI = Σ_b (p_b − q_b) · ln(p_b / q_b), summed over the returned terms.
    *
    * Determinism choices (what makes this oracle-replayable and
    * layout-independent at 100 TB):
    *   - FIXED-WIDTH buckets over a caller-declared [lo, hi) — quantile
    *     buckets would make the metric depend on the union distribution
    *     AND the engine's quantile algorithm; out-of-range values clamp to
    *     the edge buckets so no finite value is silently dropped (NULL/NaN
    *     are excluded — a null is a missing observation, not a bucket-0 one);
    *   - Laplace-smoothed proportions (count+1)/(n+B) — exact rationals,
    *     empty buckets stay finite without an arbitrary epsilon;
    *   - one aggregation per side (combinable counts), a B-row join, and a
    *     B-row output: cost is two scans regardless of B.
    * The ln is the only irrational step; consumers sum `term` for total
    * PSI (round for cross-engine comparison — spec/oracle use 6 dp).
    *
    * @return one row per bucket: (bucket, n_base, n_cur, term)
    */
  def psiDrift(
      baseline: DataFrame,
      current: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      nBuckets: Int): DataFrame = {
    psiFromCounts(
      bucketCounts(baseline, valueCol, lo, hi, nBuckets, "n_base"),
      bucketCounts(current, valueCol, lo, hi, nBuckets, "n_cur"), nBuckets)
  }

  /** Fixed-width edge-clamped bucket histogram of `valueCol` — the LINEAR
    * summary PSI is computed from. Linearity is what makes the metric
    * streamable: per-micro-batch bucket counts sum to exactly the one-shot
    * histogram, so [[graft.streaming.StreamingDrift]] folds these and
    * defers the (nonlinear) PSI terms to read time. */
  def bucketCounts(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBuckets: Int, as: String): DataFrame = {
    require(nBuckets >= 2 && hi > lo, "need nBuckets >= 2 and hi > lo")
    val width = (hi - lo) / nBuckets
    // NULL/NaN values are EXCLUDED, not clamped: greatest() skips nulls, so
    // without this filter a null value would silently land in bucket 0 and a
    // null-rate spike (the classic upstream-breakage event) would read as a
    // low-bucket distribution shift. Excluding matches what a SQL replay of
    // floor((value-lo)/width) does naturally (NULL bucket drops at the join).
    val v = col(valueCol).cast("double")
    df.select(v.as("__v")).where(col("__v").isNotNull && !isnan(col("__v")))
      .select(least(lit(nBuckets - 1), greatest(lit(0),
        floor((col("__v") - lo) / width).cast("int"))).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(as))
  }

  /** PSI terms from pre-aggregated bucket counts `(bucket, n_base)` /
    * `(bucket, n_cur)` — the [[psiDrift]] tail shared with the streaming
    * monitor. */
  def psiFromCounts(baseCounts: DataFrame, curCounts: DataFrame,
      nBuckets: Int): DataFrame = {
    val spark = baseCounts.sparkSession
    import spark.implicits._
    // dense bucket spine: a bucket empty on BOTH sides must still appear
    // (its smoothed term is 0 — dropping it would change B and the smoothing)
    val spine = (0 until nBuckets).toDF("bucket")
    val joined = spine
      .join(baseCounts, Seq("bucket"), "left")
      .join(curCounts, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
    val totB = sum(col("n_base")).over(org.apache.spark.sql.expressions.Window.partitionBy())
    val totC = sum(col("n_cur")).over(org.apache.spark.sql.expressions.Window.partitionBy())
    joined
      .withColumn("__p", (col("n_base") + 1).cast("double") / (totB + nBuckets))
      .withColumn("__q", (col("n_cur") + 1).cast("double") / (totC + nBuckets))
      .select(col("bucket"), col("n_base"), col("n_cur"),
        ((col("__p") - col("__q")) * log(col("__p") / col("__q"))).as("term"))
  }
}
