package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators for training-data governance.
  *
  * A corpus leaving the curation pipeline for a vendor, eval harness, or
  * public release must not let quasi-identifier combinations single out
  * individuals (Sweeney's k-anonymity): every released row must share its
  * quasi tuple with at least k−1 others. The PII scrub
  * ([[graft.functions.TextAnalysis]]) removes direct identifiers from
  * text; this removes INDIRECT identification through metadata columns.
  */
object Privacy {

  /** k-anonymize by a GENERALIZATION LADDER with residual cascade
    * (Samarati's generalization-with-suppression, local-recoding form):
    * rows whose level-0 quasi tuple reaches group size ≥ k are released
    * as-is; the RESIDUAL is re-grouped under the next (coarser) level and
    * re-tested; whatever survives every level is suppressed — emitted with
    * every quasi value `*` and `gen_level = levels.size` (suppression IS
    * total generalization, so the output stays total and auditable: every
    * input row appears exactly once).
    *
    * Local recoding (generalize only the residual, not the whole table)
    * releases strictly more data at the same k than global recoding — the
    * big level-0 groups keep full precision.
    *
    * Scale shape: per level, one aggregate over the (narrow, string-cast)
    * quasi columns, a semi-join of the projection against the ≥k group
    * table (group tables are ≤ distinct-combination rows — AQE broadcasts
    * them while they fit), and an id-only anti-join to form the residual.
    * Levels are few by construction (a ladder deeper than 3–4 has
    * generalized away its utility), so the chained lineage stays shallow.
    * The guarantee is exact, not probabilistic: group counts are plain
    * integer aggregates.
    *
    * @param levels each level maps the SAME quasi column names (same
    *   order) to progressively coarser value expressions; values are cast
    *   to string so `*` can stand for "generalized away"
    * @return (id, quasi columns at their released generalization,
    *   gen_level) — gen_level i = released at ladder level i,
    *   levels.size = suppressed
    */
  def kAnonymize(
      df: DataFrame,
      id: String,
      k: Int,
      levels: Seq[Seq[(String, Column)]]): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    require(levels.nonEmpty, "need at least one generalization level")
    val names = levels.head.map(_._1)
    require(levels.forall(_.map(_._1) == names),
      "every level must generalize the same quasi columns in the same order")

    var rem = df
    var released = Vector.empty[DataFrame]
    levels.zipWithIndex.foreach { case (lvl, i) =>
      val proj = rem.select(
        col(id) +: lvl.map { case (n, c) => c.cast("string").as(n) }: _*)
      val okGroups = proj.groupBy(names.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") >= k)
        .drop("__n")
      // the using-columns semi join fronts the join keys — re-project to
      // the declared (id, quasi..., gen_level) order
      val kept = proj.join(okGroups, names, "left_semi")
        .withColumn("gen_level", lit(i))
        .select(col(id) +: names.map(col) :+ col("gen_level"): _*)
      released :+= kept
      rem = rem.join(kept.select(col(id)), Seq(id), "left_anti")
    }
    val suppressed = rem.select(
      (col(id) +: names.map(n => lit("*").as(n))) :+
        lit(levels.size).as("gen_level"): _*)
    (released :+ suppressed).reduce(_.unionByName(_))
  }
}
