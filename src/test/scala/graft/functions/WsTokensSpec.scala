package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bit-identity pin for the fused [[WsTokens]] tokenizer against the exact
  * composition it replaces — token values AND array shape, including the
  * space-only trim, the empty/all-space branch, leading/trailing non-space
  * separators (Java split keeps those empty tokens at limit −1), multibyte
  * UTF-8, exotic Unicode whitespace (NOT in Java's `\s` — must stay inside
  * tokens), and null input. */
class WsTokensSpec extends SparkSpec {
  import spark.implicits._

  private def composed(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  test("fused tokenizer equals the composition on adversarial inputs") {
    val texts = Seq(
      "",                              // empty → empty array
      "   ",                           // all spaces → empty array
      "\t",                            // a tab survives the space-only trim
      "hello world",
      "  leading and trailing  ",
      "\tleads with tab",              // leading empty token
      "ends with tab\t",               // trailing empty token
      "a\t\n  b\r\nc",                 // mixed separator runs collapse
      "single",
      " x ",
      "naïve  café\tdéjà vu",     // U+00A0 is NOT \s — stays in-token
      "multi em spaces",     // unicode spaces stay in-token
      "tabvertical\fform",
      (1 to 200).map(i => s"tok$i").mkString("  "),
      null
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select(col("id"), WsTokens(col("text")).as("f"),
      composed(col("text")).as("c")).collect()
    rows.foreach { r =>
      val f = if (r.isNullAt(1)) null else r.getSeq[String](1)
      val c = if (r.isNullAt(2)) null else r.getSeq[String](2)
      assert(f == c, s"mismatch at id=${r.getLong(0)}: fused=$f composed=$c")
    }
  }

  test("fused tokenizer equals the composition after lower() on random text") {
    val rng = new scala.util.Random(7)
    val glyphs = "ab cd\tef\ngh\rij\fé∆ ".toCharArray
    val texts = (1L to 300L).map { i =>
      i -> Seq.fill(rng.nextInt(60))(glyphs(rng.nextInt(glyphs.length))).mkString
    }
    val df = texts.toDF("id", "text")
    val rows = df.select(col("id"), WsTokens(lower(col("text"))).as("f"),
      composed(lower(col("text"))).as("c")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"mismatch at id=${r.getLong(0)}: '${texts(r.getLong(0).toInt - 1)._2}'")
    }
  }
}
