package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic corpus with planted near-dups: base docs of random lowercase
    * text; every third doc gets a copy with a small edit appended. */
  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val bases = (0 until nDocs).map { i =>
      (i.toLong, (1 to 40).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    }
    bases ++ bases.collect { case (i, t) if i % 3 == 0 =>
      (1000L + i, t + ('a' + rnd.nextInt(6)).toChar)
    }
  }

  private def bruteJaccard(docs: Seq[(Long, String)], n: Int): Set[(Long, Long)] = {
    def grams(t: String): Set[String] =
      if (t.length <= n) Set(t)
      else (0 to t.length - n).map(i => t.substring(i, i + n)).toSet
    val g = docs.map { case (i, t) => (i, grams(t.toLowerCase)) }
    (for {
      (ia, ga) <- g; (ib, gb) <- g if ia < ib
      inter = (ga & gb).size
      if 9L * inter >= 4L * (ga.size + gb.size) // J >= 4/5 in rational form
    } yield (ia, ib)).toSet
  }

  test("finds exactly the brute-force J>=0.8 pairs (losslessness of all three prunes)") {
    for (seed <- Seq(1, 2, 3)) {
      val docs = corpus(seed, 45)
      val got = Dedup.prefixFilterJaccard(docs.toDF("doc_id", "text"), "doc_id", "text")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == bruteJaccard(docs, 8), s"seed $seed")
    }
  }

  test("exact duplicates and disjoint docs behave at the extremes") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"))
    val got = Dedup.prefixFilterJaccard(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(got.toSeq.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(got.head._3 == 1.0)
  }

  test("a pair at EXACTLY the rational threshold J = 4/5 is kept (integer-exact verification)") {
    // A and B are 16 chars differing only in the last: their 8-gram sets
    // share positions 1..8 (chars 1..15 identical) and differ at position 9
    // → |A| = |B| = 9, inter = 8, union = 10, J = 8/10 = 4/5 EXACTLY.
    // The old double-arithmetic filter (inter·(1+t) >= t·tot) sat ~0.25 ulp
    // from the boundary here; the rational long compare (9·inter >= 4·tot)
    // keeps the pair unconditionally — mirroring the oracle's integer `//`
    val docs = Seq((1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnoq"))
    val got = Dedup.prefixFilterJaccard(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(got.toSeq.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"exact-boundary pair must be kept: ${got.toSeq}")
    assert(got.head._3 == 0.8)
    // one gram further apart (15 shared chars → inter 7, union 11) is below
    // threshold and must be dropped: the boundary is sharp on both sides
    val below = Seq((1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnqr"))
    assert(Dedup.prefixFilterJaccard(below.toDF("doc_id", "text"), "doc_id", "text").count() == 0)
  }

  test("maxBucket cap drops flooded buckets (documented recall trade), never crashes") {
    // 30 identical docs: every prefix bucket holds all 30 — cap 5 drops them
    val docs = (1L to 30L).map(i => (i, "aaaabbbbccccddddeeee"))
    val pairs = Dedup.prefixFilterJaccard(docs.toDF("doc_id", "text"), "doc_id", "text",
      maxBucket = 5)
    assert(pairs.count() == 0)
    // with a roomy cap all 435 pairs verify at J = 1.0
    val full = Dedup.prefixFilterJaccard(docs.toDF("doc_id", "text"), "doc_id", "text",
      maxBucket = 200)
    assert(full.count() == 435)
  }
}
