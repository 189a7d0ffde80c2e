package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bit-identity pins for the streaming pair generators against the exact
  * composed `explode(flatten(transform(...)))` chains they replace —
  * including emission ORDER (the composed flatten is (i asc, j asc) /
  * outer-major), long, string and struct element types, empty and
  * single-element arrays, and null arrays. */
class SortedPairsSpec extends SparkSpec {
  import spark.implicits._

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def checkSame(label: String, fused: DataFrame, composed: DataFrame): Unit = {
    val f = rowsOf(fused)
    val c = rowsOf(composed)
    assert(f == c, s"$label mismatch:\nfused   =$f\ncomposed=$c")
  }

  test("SortedPairs over long arrays equals the composed chain, order included") {
    val df = Seq(
      (1L, Seq(3L, 1L, 2L)),
      (2L, Seq(5L)),          // single element: no pairs
      (3L, Seq.empty[Long]),  // empty: no pairs
      (4L, Seq(7L, 7L, 8L)),  // duplicates preserved
      (5L, (1L to 12L).toSeq)
    ).toDF("id", "ids")
    val fused = df.select(array_sort(col("ids")).as("s"))
      .select(SortedPairs(col("s")).as(Seq("id_a", "id_b")))
    val composed = df.select(array_sort(col("ids")).as("s"))
      .select(explode(flatten(transform(col("s"), (a, i) =>
        transform(slice(col("s"), i + lit(2), size(col("s"))),
          b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
    checkSame("sorted long pairs", fused, composed)
  }

  test("SortedPairs over struct arrays equals the composed chain") {
    val df = Seq(
      (1L, Seq((10L, true), (4L, false), (9L, true))),
      (2L, Seq((1L, false), (1L, true))),
      (3L, Seq.empty[(Long, Boolean)])
    ).toDF("id", "raw")
      .select(col("id"), transform(col("raw"),
        r => struct(r.getField("_1").as("doc_id"), r.getField("_2").as("is_new"))).as("ids"))
    val fused = df.select(array_sort(col("ids")).as("s"))
      .select(SortedPairs(col("s")).as(Seq("__a", "__b")))
      .select(col("__a.doc_id").as("id_a"), col("__b.doc_id").as("id_b"),
        col("__a.is_new").as("new_a"), col("__b.is_new").as("new_b"))
    val composed = df.select(array_sort(col("ids")).as("s"))
      .select(explode(flatten(transform(col("s"), (a, i) =>
        transform(slice(col("s"), i + lit(2), size(col("s"))),
          b => struct(
            a.getField("doc_id").as("id_a"), b.getField("doc_id").as("id_b"),
            a.getField("is_new").as("new_a"), b.getField("is_new").as("new_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.new_a"), col("p.new_b"))
    checkSame("sorted struct pairs", fused, composed)
  }

  test("SortedPairs over string arrays equals the composed chain") {
    val df = Seq(
      (1L, Seq("bob", "alice", "carol")),
      (2L, Seq("x", "x"))
    ).toDF("id", "ids")
    val fused = df.select(array_sort(col("ids")).as("ss"))
      .select(SortedPairs(col("ss")).as(Seq("name_a", "name_b")))
    val composed = df.select(array_sort(col("ids")).as("ss"))
      .select(explode(flatten(transform(col("ss"), (a, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))),
          b => struct(a.as("name_a"), b.as("name_b")))))).as("p"))
      .select(col("p.name_a"), col("p.name_b"))
    checkSame("sorted string pairs", fused, composed)
  }

  test("CrossPairs equals the composed outer-major chain") {
    val df = Seq(
      (1L, Seq((1L, 5L), (2L, 3L)), Seq((7L, 9L), (8L, 1L), (9L, 2L))),
      (2L, Seq.empty[(Long, Long)], Seq((7L, 9L))),  // empty outer: no rows
      (3L, Seq((1L, 1L)), Seq.empty[(Long, Long)])   // empty inner: no rows
    ).toDF("id", "rawp", "rawa")
      .select(col("id"),
        transform(col("rawp"), r => struct(r.getField("_1").as("doc_id"),
          r.getField("_2").as("sz"))).as("pref_ids"),
        transform(col("rawa"), r => struct(r.getField("_1").as("doc_id"),
          r.getField("_2").as("sz"))).as("all_ids"))
    val fused = df
      .select(CrossPairs(col("pref_ids"), col("all_ids")).as(Seq("__b", "__a")))
      .select(col("__a.doc_id").as("id_a"), col("__b.doc_id").as("id_b"),
        col("__a.sz").as("sz_a"), col("__b.sz").as("sz_b"))
    val composed = df
      .select(explode(flatten(transform(col("pref_ids"), b =>
        transform(col("all_ids"), a => struct(
          a.getField("doc_id").as("id_a"), b.getField("doc_id").as("id_b"),
          a.getField("sz").as("sz_a"), b.getField("sz").as("sz_b")))))).as("p"))
      .select(col("p.*"))
    checkSame("cross pairs", fused, composed)
  }

  test("null arrays emit nothing, like the composed chain") {
    val df = Seq((1L, Option.empty[Seq[Long]]), (2L, Some(Seq(1L, 2L))))
      .toDF("id", "ids")
    val fused = df.select(SortedPairs(col("ids")).as(Seq("a", "b")))
    val composed = df
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          b => struct(a.as("a"), b.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b"))
    checkSame("null arrays", fused, composed)
  }
}
