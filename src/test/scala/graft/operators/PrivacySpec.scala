package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {

  private def people(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "zip", "age")
  }

  private val ladder = Seq(
    Seq("q_zip" -> col("zip"), "q_age" -> col("age")),
    Seq("q_zip" -> col("zip"), "q_age" -> lit("*")))

  test("every released group has >= k members; totality; residual cascade") {
    // zip A: 3 rows with same age (level-0 group of 3), zip B: 3 rows with
    // distinct ages (level-0 singletons that pool at level 1), zip C: 2
    // rows (fails both levels -> suppressed)
    val df = people(
      (1L, "A", "30"), (2L, "A", "30"), (3L, "A", "30"),
      (4L, "B", "20"), (5L, "B", "21"), (6L, "B", "22"),
      (7L, "C", "40"), (8L, "C", "41"))
    val out = Privacy.kAnonymize(df, "id", k = 3, levels = ladder)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)), r.getInt(3))).toMap
    assert(out.size == 8, "totality: every input row appears exactly once")
    assert((1L to 3L).forall(i => out(i) == (("A", "30"), 0)),
      s"zip-A trio released at level 0: $out")
    assert((4L to 6L).forall(i => out(i) == (("B", "*"), 1)),
      s"zip-B singletons pool at level 1: $out")
    assert(Seq(7L, 8L).forall(i => out(i) == (("*", "*"), 2)),
      s"zip-C pair suppressed (all-*, level = levels.size): $out")
    // the k-anonymity invariant itself: every non-suppressed (quasi, level)
    // group has >= k members
    val groups = out.values.groupBy(identity).view.mapValues(_.size)
    assert(groups.collect { case ((q, l), n) if l < ladder.size => n }.forall(_ >= 3))
  }

  test("local recoding beats global: big level-0 groups keep precision while small ones pool") {
    val df = people(
      (1L, "A", "30"), (2L, "A", "30"), (3L, "A", "30"),
      (4L, "A", "31"), (5L, "A", "32"), (6L, "A", "33"))
    val out = Privacy.kAnonymize(df, "id", k = 3, levels = ladder)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert((1L to 3L).forall(out(_) == 0) && (4L to 6L).forall(out(_) == 1),
      s"the exact-age trio stays precise, the singletons generalize: $out")
  }

  test("NULL quasi tuples never release — they cascade to suppression (the old semi-join contract, kept explicit)") {
    import spark.implicits._
    // 3 NULL-zip rows would form a >= k group, but NULL never matches an
    // equality release; 3 good rows release at level 0
    val df = Seq(
      (1L, Option("A"), "30"), (2L, Option("A"), "30"), (3L, Option("A"), "30"),
      (4L, None, "30"), (5L, None, "30"), (6L, None, "30"))
      .toDF("id", "zip", "age")
    val out = Privacy.kAnonymize(df, "id", k = 3, levels = ladder)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)), r.getInt(3))).toMap
    assert(out.size == 6, "totality holds with NULL tuples")
    assert((1L to 3L).forall(i => out(i) == (("A", "30"), 0)))
    // level 1 generalizes age away but zip stays NULL -> still no release
    assert((4L to 6L).forall(i => out(i) == (("*", "*"), 2)),
      s"NULL-zip rows must suppress, not release: $out")
  }

  test("mismatched level column names fail loudly; k < 2 rejected") {
    val df = people((1L, "A", "30"))
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(df, "id", k = 3, levels = Seq(
        Seq("q_zip" -> col("zip")), Seq("other" -> col("zip"))))
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(df, "id", k = 1, levels = ladder)
    }
  }
}
