package graft.functions

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  test("train learns the classic Sennrich merges on the low/lower/newest/widest fixture") {
    import spark.implicits._
    // the worked example from Sennrich et al. 2016 §3.2: counts make
    // (e,s) and (es,t) the first two merges; (e,s) wins round 1 on the
    // lexicographic tie-break against (s,t) at equal count 9
    val docs = Seq(
      ("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3)
    ).toDF("text")
    val merges = Bpe.train(Bpe.wordCounts(docs, "text"), numMerges = 2)
    assert(merges.map(m => (m.left, m.right)) == Seq(("e", "s"), ("es", "t")))
  }

  test("applyMerge is left-to-right: aaa under (a,a) is [aa, a], never [a, aa]") {
    assert(Bpe.applyMerge(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.applyMerge(Vector("a", "a", "a", "a"), "a", "a") == Vector("aa", "aa"))
    // a merged token does not re-merge within the same pass
    assert(Bpe.applyMerge(Vector("x", "a", "a", "y"), "a", "a") == Vector("x", "aa", "y"))
  }

  test("encodeWord applies merges in rank order and token concatenation recovers the word") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val toks = Bpe.encodeWord("lowest", merges)
    assert(toks.mkString == "lowest", "BPE is a partition of the word — lossless by construction")
    assert(toks == Vector("lo", "w", "est"))
  }

  test("training twice on the same corpus yields the identical merge table (determinism)") {
    import spark.implicits._
    val docs = Seq.tabulate(50)(i => s"alpha beta gamma delta word$i alpha beta").toDF("text")
    val a = Bpe.train(Bpe.wordCounts(docs, "text"), numMerges = 10)
    val b = Bpe.train(Bpe.wordCounts(docs, "text"), numMerges = 10)
    assert(a == b)
  }

  test("tokensPerDoc: token count is bounded by chars below and words above") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox"), (2L, "the the the"), (3L, "zzz"))
      .toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text")
    val merges = Bpe.train(wc, numMerges = 5)
    val rows = Bpe.tokensPerDoc(docs, "doc_id", "text", Bpe.encodeVocab(wc, merges))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (id, nWords, nToks) =>
      assert(nToks >= nWords, s"doc $id: every word is at least one token")
      val chars = docs.filter($"doc_id" === id).as[(Long, String)].head()._2
        .count(c => c.isLetter)
      assert(nToks <= chars, s"doc $id: tokens can never exceed letter count")
    }
    assert(rows.map(_._1).toSet == Set(1L, 2L, 3L))
  }
}
