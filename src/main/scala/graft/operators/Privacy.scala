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
    * Scale shape (round 12 — one pass, not one pass PER level): the rows
    * shuffle ONCE, into a count of every distinct JOINT tuple (all levels'
    * quasi values side by side — at most distinct-level-0-tuple rows, and
    * the aggregation is map-side partial). The residual cascade then runs
    * entirely on that combo frame: level i's residual group size is a
    * windowed sum of combo counts over the level-i tuple, masked to combos
    * not released earlier — integer-exact and equal by construction to the
    * re-grouped residual counts of the level-at-a-time formulation (a
    * row's membership in level i's residual depends only on its joint
    * tuple). One join keyed on the joint tuple maps each input row to its
    * released level (AQE broadcasts the combo frame while it fits). The
    * per-level agg + semi-join + anti-join chain this replaces planned ~76
    * exchanges at 4 levels; this plans one full-data shuffle, L tiny
    * window exchanges, and the map-back join. The guarantee stays exact:
    * group counts are plain integer aggregates.
    *
    * Null semantics (unchanged): a tuple containing NULL at level i never
    * releases at that level — the old equality semi-join could not match
    * it; the cascade keeps that contract explicitly.
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
    val L = levels.size
    def qn(i: Int, j: Int) = s"__q_${i}_$j"
    val qCols = (0 until L).flatMap(i => names.indices.map(j => qn(i, j)))

    // every level's tuple, side by side, string-cast once per row
    val proj = df.select(col(id) +: levels.zipWithIndex.flatMap {
      case (lvl, i) => lvl.zipWithIndex.map {
        case ((_, c), j) => c.cast("string").as(qn(i, j))
      }
    }: _*)

    // ONE shuffle of the data: the joint-tuple histogram
    val combo = proj.groupBy(qCols.map(col): _*).agg(count(lit(1)).as("__cnt"))

    // residual cascade over the combo frame: tiny window per level
    import org.apache.spark.sql.expressions.Window
    var cur = combo
    var releasedEarlier: Column = lit(false)
    (0 until L).foreach { i =>
      val lvlCols = names.indices.map(j => col(qn(i, j)))
      val resid = sum(when(!releasedEarlier, col("__cnt")).otherwise(lit(0L)))
        .over(Window.partitionBy(lvlCols: _*))
      val allNonNull = lvlCols.map(_.isNotNull).reduce(_ && _)
      cur = cur.withColumn(s"__rel_$i",
        !releasedEarlier && allNonNull && resid >= k)
      releasedEarlier = releasedEarlier || col(s"__rel_$i")
    }
    val genLevel = (0 until L).foldRight(lit(L)) {
      case (i, els) => when(col(s"__rel_$i"), lit(i)).otherwise(els)
    }
    val gen = cur.select(qCols.map(c => col(c).as(s"__g_$c")) :+
      genLevel.as("gen_level"): _*)

    // map each row back to its combo's verdict (combos are distinct — no
    // fan-out); null-safe keys so NULL tuples reach their suppressed row
    val joinKey = qCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    val quasiOut = names.zipWithIndex.map { case (n, j) =>
      (0 until L).foldRight(lit("*")) {
        case (i, els) => when(col("gen_level") === i, col(qn(i, j))).otherwise(els)
      }.as(n)
    }
    proj.join(gen, joinKey)
      .select(col(id) +: quasiOut :+ col("gen_level"): _*)
  }
}
