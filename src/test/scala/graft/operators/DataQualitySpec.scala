package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), "a", 10.0),
    (Some(2L), "a", -5.0),   // bound violation
    (Some(2L), "b", 20.0),   // duplicate id
    (None, "zz", 30.0)       // null id + domain violation
  ).toDF("id", "cat", "v")

  test("single-table checks evaluate in one scan with exact counts") {
    val out = DataQuality.run(spark, df, Seq(
      DataQuality.notNull("id"),
      DataQuality.unique("id"),
      DataQuality.inSet("cat", Seq("a", "b")),
      DataQuality.bound("v", _ > 0))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("complete_id") == ((1L, 250000L, false)))
    // 4 rows − 2 distinct non-null ids = 2 (the dup occurrence + the null row)
    assert(out("unique_id") == ((2L, 500000L, false)))
    assert(out("domain_cat") == ((1L, 250000L, false)))
    assert(out("bound_v") == ((1L, 250000L, false)))
  }

  test("referential violations count orphans, not nulls, and a clean parent passes") {
    val parent = Seq(1L, 2L).toDF("pk")
    val ri = DataQuality.referentialViolations(df, "id", parent, "pk")
    val out = DataQuality.run(spark, df, Seq(DataQuality.notNull("id")),
      Seq("fk_id" -> ri)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("fk_id") == 0L) // null id is NOT an orphan
    val ri2 = DataQuality.referentialViolations(df, "id", Seq(1L).toDF("pk"), "pk")
    val out2 = DataQuality.run(spark, df, Nil, Seq("fk_id" -> ri2)).collect()
    assert(out2.head.getLong(1) == 2L) // both id=2 rows orphaned
    assert(!out2.head.getBoolean(4))
  }

  test("profile: exact distincts, null accounting, and repr(min) — never min(repr)") {
    val pdf = Seq((Some(9L), Some("b")), (Some(10L), None), (None, Some("a")))
      .toDF("k", "s")
    val rows = DataQuality.profile(pdf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(rows("k") == ((3L, 1L, 2L, "9", "10")),
      s"min over the VALUE then repr: lexical min('10','9') would be '10': ${rows("k")}")
    assert(rows("s") == ((3L, 1L, 2L, "a", "b")))
  }

  test("profile: hostile column names (quotes, backticks, dots) survive intact") {
    val hostile = Seq((1L, "x"), (2L, "y"))
      .toDF("a'b", "c`d.e")
    val rows = DataQuality.profile(hostile).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows.keySet == Set("a'b", "c`d.e"), s"labels mangled: ${rows.keySet}")
    assert(rows("a'b") == 2L && rows("c`d.e") == 2L)
  }

  test("profile approxDistinct: no Expand in the plan, counts within HLL tolerance") {
    val pdf = Seq.tabulate(2000)(i => (i.toLong % 500, s"v${i % 37}")).toDF("k", "s")
    val approx = DataQuality.profile(pdf, approxDistinct = true)
    // the exact multi-distinct plans an Expand (N× row multiplier); the
    // approx form must be a plain single-pass aggregate
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "approxDistinct=true must not plan an Expand")
    assert(DataQuality.profile(pdf).queryExecution.executedPlan.toString.contains("Expand"),
      "sanity: the exact form does plan an Expand")
    val got = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(got("k") - 500L) <= 25 && math.abs(got("s") - 37L) <= 4,
      s"approx distincts out of tolerance: $got")
  }
}
