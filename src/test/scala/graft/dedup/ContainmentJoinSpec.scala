package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Containment (quote-inclusion) join: the asymmetric relation Jaccard
  * dedup cannot see. k=1 (unigram shingles) in most cases so the set
  * algebra is controlled word-for-word. */
class ContainmentJoinSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame, k: Int = 1,
      tn: Int = 9, td: Int = 10, minSize: Int = 5): Map[(Long, Long), Double] =
    Dedup.containmentJoin(df, "doc_id", "text", k = k,
        thresholdNum = tn, thresholdDen = td, minSize = minSize)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap

  test("a short doc quoted wholesale is contained at 1.0; the reverse is not") {
    val contained = "alpha beta gamma delta epsilon zeta"
    val container = contained + " plus lots of extra framing words " +
      "one two three four five six seven eight nine ten eleven twelve"
    val out = pairs(docs(1L -> container, 2L -> contained))
    assert(out.get((1L, 2L)).contains(1.0), s"quote must be detected: $out")
    assert(!out.contains((2L, 1L)), "the long container is NOT inside the quote")
    // and Jaccard is blind to exactly this pair: 6 shared / 19 union << 0.5
    assert(out((1L, 2L)) == 1.0)
  }

  test("exact integer boundary: 9/10 kept, 8/10 dropped") {
    val b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10" // 10 distinct unigrams
    val keep9 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 x1 x2 x3 x4 x5"   // 9 of 10
    val drop8 = "w1 w2 w3 w4 w5 w6 w7 w8 y1 y2 y3 y4 y5 y6"   // 8 of 10
    val out = pairs(docs(1L -> keep9, 2L -> drop8, 3L -> b))
    assert(out.get((1L, 3L)).contains(0.9), s"9/10 is ON the threshold: $out")
    assert(!out.contains((2L, 3L)), "8/10 must be dropped")
  }

  test("minSize floor: tiny docs are never reported as contained") {
    val out = pairs(docs(
      1L -> "solo word appears here and there and everywhere again",
      2L -> "solo word"), minSize = 5)
    assert(!out.exists(_._1._2 == 2L), s"2-shingle doc below the floor: $out")
  }

  test("empty docs and self-pairs are excluded; symmetric dups contain both ways") {
    val t = "same exact text here five words more padding tokens extra"
    val out = pairs(docs(1L -> t, 2L -> t, 3L -> "", 4L -> "   "))
    assert(out.keySet == Set((1L, 2L), (2L, 1L)),
      s"exact dups contain each other, nothing else: $out")
    assert(out.values.forall(_ == 1.0))
  }

  test("3-word shingles: a composite detects its components") {
    val a = "the first component document has exactly these eight words"
    val b = "and a second component text with different content entirely"
    val out = pairs(docs(1L -> a, 2L -> b, 3L -> (a + " " + b)), k = 3)
    assert(out.get((3L, 1L)).contains(1.0) && out.get((3L, 2L)).contains(1.0),
      s"both components contained in the composite: $out")
    assert(!out.contains((1L, 2L)) && !out.contains((2L, 1L)))
  }
}
