package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE / CDC-apply: fold a batch of keyed change records
  * (upserts + deletes) onto a base snapshot — the Delta `MERGE INTO` /
  * Iceberg `apply_changes` semantic, expressed as plain relational algebra
  * so it runs on the parquet-backed store this environment allows
  * (reference: update_feature_store.py's put_record upsert loop is the
  * degenerate all-upserts case; SURVEY.md §2.4 K1).
  *
  * Sequential-apply semantics without sequential execution: the final state
  * of a key depends only on its LAST change in the batch (later changes
  * fully shadow earlier ones), so the batch first collapses to one net
  * change per key — ONE shuffle with map-side combine via max_by — then a
  * single key-equi full-outer join against the base decides kept / upserted
  * / deleted. No iteration, no driver state; both sides shuffle once on the
  * key (or zero times when base and changes are bucketed by key —
  * [[graft.sources.Bucketing]]).
  *
  * At 100 TB the base snapshot is the big side and the daily change batch
  * is orders of magnitude smaller: the join keys co-partition, AQE picks
  * the right side strategy, and nothing ever widens beyond one row per key.
  */
object CdcMerge {

  /** Apply `changes` to `base`.
    *
    * @param key      entity key column (same name both sides)
    * @param seqCols  change ordering; the max wins per key (ties must be
    *                 broken by the caller's column list to stay deterministic)
    * @param opCol    column on `changes` holding the operation
    * @param deleteOp `opCol` value meaning DELETE; anything else is UPSERT
    * @return one row per surviving key with the base schema (opCol dropped)
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      key: String,
      seqCols: Seq[String],
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val payloadCols = base.columns.toSeq
    require(payloadCols.contains(key), s"base lacks key column $key")
    require((payloadCols :+ opCol).forall(changes.columns.contains),
      s"changes must carry the base schema plus $opCol")

    // Net change per key: single shuffle, partial max_by combines map-side.
    val ord = struct(seqCols.map(col): _*)
    val payload = struct((payloadCols :+ opCol).map(col): _*)
    val net = changes.groupBy(col(key))
      .agg(max_by(payload, ord).as("__net"))
      .select(col(key).as("__k"), col(s"__net.$opCol").as("__op"),
        struct(payloadCols.map(c => col(s"__net.`$c`").as(c)): _*).as("__row"))

    base.join(net, col(key) === col("__k"), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= deleteOp)
      .select(payloadCols.map { c =>
        when(col("__op").isNotNull, col(s"__row.`$c`")).otherwise(col(c)).as(c)
      }: _*)
  }
}
