package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("langId routes clear-cut text by stopword ratio, CJK override, und fallback") {
    import spark.implicits._
    val rows = Seq(
      (1L, "the cat sat on the mat and it was happy with this"),
      (2L, "el perro corre por la calle y no se detiene para nada"),
      (3L, "der Hund läuft auf der Straße und die Katze ist im Haus"),
      (4L, "你好世界这是一个测试文档"),
      (5L, "xyzzy plugh qwerty asdf"),
      (6L, ""))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.langId(col("text")).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(rows(1L) == "en")
    assert(rows(2L) == "es")
    assert(rows(3L) == "de")
    assert(rows(4L) == "cjk")
    assert(rows(5L) == "und")
    assert(rows(6L) == "und")
  }

  test("qualityScore is bounded in [0,1] and orders clean text above junk") {
    import spark.implicits._
    val clean = Seq.fill(60)("sentence with reasonable words flowing naturally onward").mkString(" ")
    val junk = "!!! ??? *** @@@ ### $$$ %%% ^^^ &&&"
    val rows = Seq((1L, clean), (2L, junk), (3L, ""))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    rows.values.foreach(q => assert(q >= 0.0 && q <= 1.0))
    assert(rows(1L) > rows(2L))
  }
}
