package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.GraftFunctions.wsTokens

/** Bit-identity pins for the fused LM/DSIR row generators against the
  * composed Column forms they replaced (order included). */
class PortableHashRowsSpec extends SparkSpec {
  import spark.implicits._

  private def composedHash60(s: org.apache.spark.sql.Column) =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  private val texts = Seq(
    "", "one", "one two", "the quick brown fox jumps over the lazy dog",
    "a a a a a a", "naïve café déjà ✓ vu", "x\ty\nz",
    (1 to 300).map(i => s"w${i % 13}").mkString(" "), null)

  private def tokd = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    .select(col("doc_id"), wsTokens(lower(col("text"))).as("toks"))

  test("Md5Prefix60 equals conv(substring(md5, 1, 15), 16, 10)") {
    val rows = texts.filter(_ != null).toDF("s")
      .select(PortableHashRows.md5Prefix60(col("s")).as("f"),
        composedHash60(col("s")).as("c")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // null in, null out
    val n = Seq[String](null).toDF("s")
      .select(PortableHashRows.md5Prefix60(col("s"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("lmBigramRows equals the composed transform") {
    val bgRowType = "array<struct<pos:int,bg_id:bigint,ctx_id:bigint>>"
    val composed = when(size(col("toks")) < 2, expr(s"CAST(array() AS $bgRowType)"))
      .otherwise(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(
          i.cast("int").as("pos"),
          composedHash60(concat(
            element_at(col("toks"), i + 1), lit(""),
            element_at(col("toks"), i + 2))).as("bg_id"),
          composedHash60(element_at(col("toks"), i + 1)).as("ctx_id"))))
    val rows = tokd.select(col("doc_id"),
        PortableHashRows.lmBigramRows(col("toks")).as("f"), composed.as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"doc ${r.getLong(0)}: ${r.getSeq[Any](1)} != ${r.getSeq[Any](2)}")
    }
  }

  test("dsirFeatureRows equals the composed uni ++ bi transform") {
    val buckets = 97
    val featRowType = "array<struct<pos:int,knd:int,fb:bigint>>"
    def bucketed(h: org.apache.spark.sql.Column) = pmod(h, lit(buckets.toLong))
    val uni = transform(
      sequence(lit(0), size(col("toks")) - 1),
      i => struct(i.cast("int").as("pos"), lit(0).as("knd"),
        bucketed(composedHash60(element_at(col("toks"), i + 1))).as("fb")))
    val bi = when(size(col("toks")) < 2, expr(s"CAST(array() AS $featRowType)"))
      .otherwise(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(i.cast("int").as("pos"), lit(1).as("knd"),
          bucketed(composedHash60(concat(
            element_at(col("toks"), i + 1), lit(""),
            element_at(col("toks"), i + 2)))).as("fb"))))
    val composed = when(size(col("toks")) === 0, expr(s"CAST(array() AS $featRowType)"))
      .otherwise(concat(uni, bi))
    val rows = tokd.select(col("doc_id"),
        PortableHashRows.dsirFeatureRows(col("toks"), buckets).as("f"),
        composed.as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"doc ${r.getLong(0)}: ${r.getSeq[Any](1)} != ${r.getSeq[Any](2)}")
    }
  }
}
