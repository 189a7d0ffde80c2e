package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time ("as-of") join — the canonical feature-store retrieval the
  * reference degenerates to a plain time-range filter because its query asks
  * for ALL history in a window rather than per-entity as-of rows
  * (reference: historical_features.py:28-32; SURVEY.md §2.6 J2).
  *
  * Semantics: for each left row (entity, t_left), attach the single right row
  * with the same key and the greatest t_right <= t_left (backward as-of,
  * inclusive). Ties on t_right break by the greatest `rightTiebreak`.
  *
  * Implementation — the union-then-window ("piecewise merge") form:
  * tag both inputs, union, and run ONE window over (key, time) taking the
  * last non-null right payload at or before each left row. Cost: a single
  * hash shuffle on the key + one per-partition sort — the same shape as a
  * sort-merge join, with no row explosion. A naive
  * `left.join(right, key && t_r <= t_l)` + argmax produces |matches| =
  * O(rows_left × rows_right / keys) intermediate rows; at 100 TB that join
  * explodes while this form stays linear in |left| + |right|.
  *
  * Skew note: a hot key concentrates its partition; AQE's skew handling does
  * not split windows, so for pathological keys pre-bucket by
  * (key, coarse time bucket) — not needed at current scales.
  */
object AsOfJoin {

  /** Backward (<=) as-of join.
    *
    * @param rightValueCols right columns to attach (each emitted as `asofPrefix + name`)
    * @param rightTiebreak  right column breaking event-time ties (max wins)
    * @param tolerance      max staleness: a right row older than
    *                       `leftTime - tolerance` does not match (feature
    *                       stores bound how stale an attached feature may be).
    *                       SQL interval string, e.g. "7 days"; None = unbounded.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTiebreak: String,
      rightValueCols: Seq[String],
      asofPrefix: String = "asof_",
      tolerance: Option[String] = None): DataFrame = {

    val rightPayloadCols = (rightValueCols :+ rightTime).distinct
    val rightStruct = StructType(rightPayloadCols.map(c => right.schema(c)))

    val l = left.select(
      col(leftKey).cast(right.schema(rightKey).dataType).as("__key"),
      col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(right.schema(rightTiebreak).dataType).as("__tb"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rightStruct).as("__r"))

    val r = right.select(
      col(rightKey).as("__key"),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      col(rightTiebreak).as("__tb"),
      lit(null).cast(StructType(left.schema.fields)).as("__l"),
      struct(rightPayloadCols.map(col): _*).as("__r"))

    // Right rows sort BEFORE left rows at equal time (__side 0 < 1), making
    // the join inclusive; among right rows at equal time the max tiebreak
    // sorts last and wins `last(ignoreNulls)`.
    val w = Window
      .partitionBy("__key")
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val leftCols = left.columns.map(c => col(s"__l.`$c`").as(c))
    // tolerance: null out a match that is staler than allowed (applied after
    // the window pass — the windowed form can't skip stale-but-newer-than-
    // nothing rows without a second pass, and nulling matches the feature-
    // store semantic "no feature available within the window")
    val asofStruct = tolerance match {
      case None => col("__asof")
      case Some(t) => when(
        col(s"__asof.`$rightTime`") >= col("__t") - expr(s"INTERVAL $t"),
        col("__asof"))
    }
    val asofCols = rightPayloadCols.map(c => col(s"__asof_t.`$c`").as(asofPrefix + c))

    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__asof_t", asofStruct)
      .filter(col("__side") === 1)
      .select(leftCols ++ asofCols: _*)
  }

  /** [[backward]] with (key, coarse time-bucket) pre-partitioning — the
    * hot-key form. The plain union-then-window concentrates each key on one
    * task; a pathological key (one user producing 1% of 100 TB) becomes a
    * straggler that AQE cannot split, because skew handling does not split
    * windows. Here the window runs per (key, bucket), so a hot key's
    * timeline is processed by as many tasks as it spans buckets.
    *
    * The boundary stitch: a left row early in bucket B may need a right row
    * from an earlier bucket. Right rows are first reduced to one argmax row
    * per (key, bucket) — `max_by` over (time, tiebreak), one small shuffle —
    * and a per-key running window over those PER-BUCKET AGGREGATES (rows ∝
    * active buckets, not events — this window is what stays tiny for hot
    * keys) computes each bucket's carry-in: the latest right row from any
    * strictly earlier bucket. The carry-in is injected into each bucket as
    * one extra right row; within-bucket ordering then resolves exactly as in
    * [[backward]] (carry time < bucket start ≤ in-bucket times, so the carry
    * only wins when the bucket has no earlier in-bucket right row).
    *
    * Cost: two extra small shuffles vs [[backward]] — worth it only when a
    * key's per-partition row count is the bottleneck. Equivalence with
    * [[backward]] is property-tested (AsOfJoinSpec).
    *
    * @param bucketSeconds coarse bucket width; pick so a hot key's densest
    *                      bucket fits a task comfortably (e.g. 1 day)
    */
  def backwardBucketed(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTiebreak: String,
      rightValueCols: Seq[String],
      asofPrefix: String = "asof_",
      tolerance: Option[String] = None,
      bucketSeconds: Long = 86400L): DataFrame = {

    val rightPayloadCols = (rightValueCols :+ rightTime).distinct
    val rightStruct = StructType(rightPayloadCols.map(c => right.schema(c)))
    val tbType = right.schema(rightTiebreak).dataType
    def bucketOf(t: org.apache.spark.sql.Column) =
      floor(unix_micros(t) / lit(bucketSeconds * 1000000L)).as("__b")

    val l = left.select(
      col(leftKey).cast(right.schema(rightKey).dataType).as("__key"),
      col(leftTime).as("__t"),
      bucketOf(col(leftTime)),
      lit(1).as("__side"),
      lit(null).cast(tbType).as("__tb"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rightStruct).as("__r"))

    val r = right.select(
      col(rightKey).as("__key"),
      col(rightTime).as("__t"),
      bucketOf(col(rightTime)),
      lit(0).as("__side"),
      col(rightTiebreak).as("__tb"),
      lit(null).cast(StructType(left.schema.fields)).as("__l"),
      struct(rightPayloadCols.map(col): _*).as("__r"))

    // one argmax right row per (key, bucket) — map-side combining shuffle
    val perBucket = r.groupBy(col("__key"), col("__b"))
      .agg(max_by(struct(col("__t"), col("__tb"), col("__r")), struct(col("__t"), col("__tb")))
        .as("__best"))

    // per-key running carry over bucket aggregates: latest right row from any
    // STRICTLY earlier bucket, for every bucket either side touches
    val allBuckets = l.select(col("__key"), col("__b"))
      .unionByName(r.select(col("__key"), col("__b"))).distinct()
    val carryW = Window.partitionBy("__key").orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = allBuckets
      .join(perBucket, Seq("__key", "__b"), "left")
      .withColumn("__carry", last(col("__best"), ignoreNulls = true).over(carryW))
      .filter(col("__carry").isNotNull)
      .select(
        col("__key"), col("__b"),
        col("__carry.__t").as("__t"),
        lit(0).as("__side"),
        col("__carry.__tb").as("__tb"),
        lit(null).cast(StructType(left.schema.fields)).as("__l"),
        col("__carry.__r").as("__r"))

    // within-bucket resolution — identical ordering semantics to [[backward]]
    val w = Window
      .partitionBy("__key", "__b")
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val leftCols = left.columns.map(c => col(s"__l.`$c`").as(c))
    val asofStruct = tolerance match {
      case None => col("__asof")
      case Some(t) => when(
        col(s"__asof.`$rightTime`") >= col("__t") - expr(s"INTERVAL $t"),
        col("__asof"))
    }
    val asofCols = rightPayloadCols.map(c => col(s"__asof_t.`$c`").as(asofPrefix + c))

    l.unionByName(r).unionByName(carries)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__asof_t", asofStruct)
      .filter(col("__side") === 1)
      .select(leftCols ++ asofCols: _*)
  }

  /** Forward (>=) as-of join: attach the EARLIEST right row at or after each
    * left row ("next event after"). Same single-shuffle union-then-window
    * shape as [[backward]], with time order reversed; ties on t_right break
    * by the SMALLEST tiebreak.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTiebreak: String,
      rightValueCols: Seq[String],
      asofPrefix: String = "asof_"): DataFrame = {

    val rightPayloadCols = (rightValueCols :+ rightTime).distinct
    val rightStruct = StructType(rightPayloadCols.map(c => right.schema(c)))

    val l = left.select(
      col(leftKey).cast(right.schema(rightKey).dataType).as("__key"),
      col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(right.schema(rightTiebreak).dataType).as("__tb"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rightStruct).as("__r"))

    val r = right.select(
      col(rightKey).as("__key"),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      col(rightTiebreak).as("__tb"),
      lit(null).cast(StructType(left.schema.fields)).as("__l"),
      struct(rightPayloadCols.map(col): _*).as("__r"))

    // Descending time: right rows still sort before left at equal time
    // (inclusive >=); among equal-time right rows the MIN tiebreak sorts
    // last (desc) and wins last(ignoreNulls).
    val w = Window
      .partitionBy("__key")
      .orderBy(col("__t").desc, col("__side").asc, col("__tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val leftCols = left.columns.map(c => col(s"__l.`$c`").as(c))
    val asofCols = rightPayloadCols.map(c => col(s"__asof.`$c`").as(asofPrefix + c))

    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols ++ asofCols: _*)
  }
}
