package graft.operators

import scala.util.Random

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(ss: Seq[String]): Set[(String, String)] = {
    val ds = ss.distinct
    (for { a <- ds; b <- ds if a < b && lev(a, b) <= 1 } yield (a, b)).toSet
  }

  test("deletion-neighborhood blocking finds exactly the brute-force ED<=1 pairs") {
    for (seed <- Seq(7, 21, 42)) {
      val rnd = new Random(seed)
      // small alphabet + short strings → dense near-pairs, all edit kinds
      val ss = Seq.fill(120)((1 to (2 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val got = FuzzyJoin.edit1SelfJoin(ss.toDF("k"), "k")
        .as[(String, String)].collect().toSet
      assert(got == brute(ss), s"seed $seed")
    }
  }

  test("each edit kind matches; distance-2 does not; single chars join") {
    val ss = Seq("abc", "abd", "ab", "abcd", "xyz", "a", "b", "abe")
    val got = FuzzyJoin.edit1SelfJoin(ss.toDF("k"), "k").as[(String, String)].collect().toSet
    assert(got == brute(ss))
    assert(got.contains(("abc", "abd")), "substitution")
    assert(got.contains(("ab", "abc")), "insertion/deletion")
    assert(got.contains(("a", "b")), "two single chars are one substitution apart")
    assert(!got.contains(("abc", "xyz")))
  }

  test("maxBucket caps a flooded variant bucket (documented recall trade)") {
    // 50 keys sharing the variant "k" (all are "k"+digit-ish singles): cap 5
    // drops the flooded bucket entirely
    val ss = (0 until 50).map(i => s"k${('a' + i % 26).toChar}$i")
    val capped = FuzzyJoin.edit1SelfJoin(ss.toDF("k"), "k", maxBucket = 2)
    val full = FuzzyJoin.edit1SelfJoin(ss.toDF("k"), "k", maxBucket = 1000)
    assert(capped.count() <= full.count())
  }
}
