package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.GraftFunctions._
import graft.functions.HashedShingles._

/** Bit-identity pins for the fused shingle-hash expressions: every
  * (kind, distinct, sorted) variant must equal the composed Column form it
  * replaces — including element ORDER (array_distinct keeps first
  * occurrence) and the short-input whole-text/whole-doc gram — on an
  * adversarial corpus (empty, shorter-than-n, exactly-n, multibyte UTF-8,
  * repeated grams, nulls). */
class HashedShinglesSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "",                       // empty: one whole-text gram of ""
    "ab",                     // shorter than n
    "abcdefgh",               // exactly n = 8
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaaaa", // heavy in-doc gram repetition
    "naïve café — déjà vu ✓ über",  // multibyte UTF-8
    "tab\tand\nnewline  and  double spaces",
    (1 to 50).map(i => s"tok$i word${i % 7}").mkString(" "),
    null
  )

  private def df = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  private def check(label: String, fused: org.apache.spark.sql.Column,
      composed: org.apache.spark.sql.Column): Unit = {
    val rows = df.select(col("id"), fused.as("f"), composed.as("c"))
      .collect()
    rows.foreach { r =>
      val f = if (r.isNullAt(1)) null else r.getSeq[Long](1)
      val c = if (r.isNullAt(2)) null else r.getSeq[Long](2)
      assert(f == c, s"$label mismatch at id=${r.getLong(0)}: fused=$f composed=$c")
    }
  }

  private def composedNgrams(n: Int, h: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      distinct: Boolean, sorted: Boolean) = {
    val base = transform(charNgrams(lower(col("text")), n), h)
    val d = if (distinct) array_distinct(base) else base
    if (sorted) array_sort(d) else d
  }

  test("hashedCharNgrams equals the composed transform for every variant") {
    for (n <- Seq(2, 8); distinct <- Seq(true, false); sorted <- Seq(true, false)) {
      check(s"xx64 n=$n d=$distinct s=$sorted",
        hashedCharNgrams(lower(col("text")), n, KindXx64, 17L, distinct, sorted),
        composedNgrams(n, g => xxhash64Seeded(17L, g), distinct, sorted))
      check(s"md5 n=$n d=$distinct s=$sorted",
        hashedCharNgrams(lower(col("text")), n, KindMd5Prefix60, 0L, distinct, sorted),
        composedNgrams(n, g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"),
          distinct, sorted))
    }
  }

  test("hashedWordShingles equals the composed transform for every variant") {
    for (k <- Seq(1, 3, 5); distinct <- Seq(true, false); sorted <- Seq(true, false)) {
      val toks = wsTokens(lower(col("text")))
      def comp(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
        val base = transform(wordShinglesFromTokens(toks, k), h)
        val d = if (distinct) array_distinct(base) else base
        if (sorted) array_sort(d) else d
      }
      check(s"ws xx64 k=$k d=$distinct s=$sorted",
        hashedWordShingles(toks, k, KindXx64, 31L, distinct, sorted),
        comp(g => xxhash64Seeded(31L, g)))
      check(s"ws md5 k=$k d=$distinct s=$sorted",
        hashedWordShingles(toks, k, KindMd5Prefix60, 0L, distinct, sorted),
        comp(g => conv(substring(md5(g), 1, 15), 16, 10).cast("long")))
    }
  }

  test("empty token array matches wordShinglesFromTokens' whole-doc shingle") {
    // wsTokens("") = [] → one shingle "" on both sides
    val d = Seq("", "one", "one two").toDF("text")
    val toks = wsTokens(col("text"))
    val rows = d.select(
        hashedWordShingles(toks, 3, KindXx64, 31L, distinct = true, sorted = true).as("f"),
        array_sort(array_distinct(transform(wordShinglesFromTokens(toks, 3),
          g => xxhash64Seeded(31L, g)))).as("c"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }
}
