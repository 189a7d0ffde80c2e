package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeTextSpec extends SparkSpec {

  private def norm(ss: String*): Seq[String] = {
    import spark.implicits._
    ss.toDF("s").select(NormalizeText(col("s")).as("n"))
      .as[String].collect().toSeq
  }

  test("line endings, control strip, whitespace collapse, edge trim, NFC last") {
    assert(norm("a\r\nb\rc") == Seq("a\nb\nc"), "CRLF and lone CR become LF")
    assert(norm("a\u0007b\u007Fcd") == Seq("abcd"), "C0 + DEL stripped")
    assert(norm("a\tb  \t c") == Seq("a b c"), "space/tab runs collapse to one space")
    assert(norm("  x \n\t") == Seq("x"), "edge whitespace trimmed")
    // NFC: decomposed e + combining acute composes; already-composed unchanged
    assert(norm("caf\u00e9", "cafe\u0301") == Seq("caf\u00e9", "caf\u00e9"))
    // NFC runs LAST: a control char BETWEEN base and mark is stripped first,
    // so the reunited pair still composes
    assert(norm("e\u0007\u0301") == Seq("\u00e9"))
  }

  test("nulls propagate; interpreted and codegen agree") {
    import spark.implicits._
    val df = Seq(Some("a\r\nb"), None).toDF("s")
    val out = df.select(NormalizeText(col("s")).as("n")).collect()
    assert(out(0).getString(0) == "a\nb" && out(1).isNullAt(0))
    // interpreted path (eval without codegen) matches the helper directly
    assert(NormalizeTextUtil.normalize("a\r\nb \t c ") == "a\nb c")
  }
}
