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

  test("repetitionStats flags planted line- and bigram-repetition, keeps prose") {
    import spark.implicits._
    // 1: 4 lines, 2 identical after trim → dup_line_frac = 0.5 → drop
    // 2: "buy now" ×12 = 24 tokens, top bigram covers 12/24·2… count("buy now")=12 → frac=1.0 → drop
    // 3: prose, no repetition → keep; 4: one token → no bigrams, frac 0
    // 5: empty → all zeros, keep (length filters are qualityScore's job)
    val docs = Seq(
      (1L, "alpha beta\n  spam line  \nspam line\ngamma delta"),
      (2L, Seq.fill(12)("buy now").mkString(" ")),
      (3L, "the quick brown fox jumps over a lazy dog near the river bank"),
      (4L, "single"),
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 4 && got(1L)._4 == 0.25, "4 lines, one repeat → 1/4")
    assert(got(1L)._3 == 8, "newlines separate tokens")
    assert(got(1L)._5 == 2 && !got(1L)._7, "'spam line' ×2 of 8 tokens → frac 0.5 → drop")
    assert(got(2L)._3 == 24 && got(2L)._5 == 12 && got(2L)._6 == 1.0 && !got(2L)._7,
      "wall-to-wall bigram → drop")
    assert(got(3L)._7, "prose passes both thresholds")
    assert(got(4L)._3 == 1 && got(4L)._5 == 0 && got(4L)._6 == 0.0 && got(4L)._7)
    assert(got(5L)._2 == 0 && got(5L)._3 == 0 && got(5L)._4 == 0.0 && got(5L)._7)
  }
}
