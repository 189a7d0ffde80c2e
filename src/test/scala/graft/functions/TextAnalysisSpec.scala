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

  test("tfIdfTopK ranks a document's rare term above corpus-wide terms") {
    import spark.implicits._
    // "zebra" appears only in doc 1 (df=1); "common" in all 4 (df=4).
    // Both appear once in doc 1: score(zebra)=1·(5/2)=2.5 > score(common)=1·(5/5)=1.
    val docs = Seq(
      (1L, "common zebra words here"),
      (2L, "common words here again"),
      (3L, "common words here again"),
      (4L, "common words here again")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .select("token", "score").as[(String, Double)].collect()
    assert(top.head._1 == "zebra" && top.head._2 == 2.5)
    assert(top.forall(_._2 >= top.last._2), "ranks descend by score")
  }

  test("tfIdfTopK weights repeated terms by tf and caps output at k per doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple banana cherry"),
      (2L, "banana cherry date elderberry fig")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", k = 3).collect()
    assert(out.count(_.getAs[Long]("doc_id") == 1L) == 3)
    val d1top = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", k = 1)
      .filter(col("doc_id") === 1L).select("token").as[String].collect()
    assert(d1top.sameElements(Array("apple")), "tf=3 on an equally-rare term wins")
  }

  test("charBigramCoverage scores in-distribution prose 1.0 and gibberish lower") {
    import spark.implicits._
    // 8 copies of one prose line (each of its ≤42 distinct bigrams has corpus
    // count 8) + one gibberish doc of 95 DISTINCT count-1 bigrams. topN=60:
    // every prose bigram outranks every count-1 gibberish bigram → prose
    // coverage is exactly 1.0; gibberish gets at most the leftover slots
    // (60 − prose distinct ≤ 25 of 95) → coverage well under 0.5.
    val prose = (1L to 8L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val gibberish = (0x2200 until 0x2260).map(_.toChar).mkString
    val docs = (prose :+ ((9L, gibberish))).toDF("doc_id", "text")
    val got = TextAnalysis.charBigramCoverage(docs, "doc_id", "text", topN = 60)
      .select("doc_id", "coverage").as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.0, "every prose bigram is in the top table")
    assert(got(9L) < 0.5, "symbol soup falls outside the corpus model")
  }

  test("charBigramCoverage: short and empty docs take the whole-text bigram path") {
    import spark.implicits._
    val docs = Seq((1L, "ab"), (2L, ""), (3L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.charBigramCoverage(docs, "doc_id", "text", topN = 10)
      .select("doc_id", "n_bigrams").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L,
      "length<=2 contributes the whole text as its single 'bigram'")
  }

  test("wordBigramNovelty: rare-rate from corpus counts; short docs report 0") {
    import spark.implicits._
    // "a b" occurs in docs 1,2,3 (count 3 > rareMax=1); "b c" only in doc 1;
    // doc 3 repeats "a b" twice (multiplicity); doc 4 has 1 token → 0 bigrams
    val docs = Seq(
      (1L, "a b c"),      // bigrams: (a b) common, (b c) rare → 1/2
      (2L, "a b"),        // (a b) → 0/1
      (3L, "a b a b"),    // (a b), (b a), (a b): (b a) rare → 1/3
      (4L, "solo"),
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.wordBigramNovelty(docs, "doc_id", "text", rareMax = 1L)
      .select("doc_id", "n_bigrams", "n_rare", "novelty")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0L, 0.0)))
    assert(got(3L) == ((3L, 3L, 1L, 0.333333)))
    assert(got(4L) == ((4L, 0L, 0L, 0.0)))
    assert(got(5L) == ((5L, 0L, 0L, 0.0)))
  }

  test("bm25TopK: matches a driver-side recompute of the exact formula") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark window spark hash extra words here"),
      (2L, "spark only once padded padded padded"),
      (3L, "window window window window short"),
      (4L, "nothing relevant at all in here now"),
      (5L, "hash spark"))
    val docs = corpus.toDF("doc_id", "text")
    val terms = Seq("spark", "window", "hash")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .select("rank", "doc_id", "score").as[(Long, Long, Double)].collect()

    // driver-side recompute with the same expression shape
    val toks = corpus.map { case (i, t) => i -> t.split("\\s+").toSeq }.toMap
    val nDocs = corpus.size.toDouble
    val sumDl = toks.values.map(_.size).sum.toDouble
    def tf(d: Long, t: String) = toks(d).count(_ == t).toDouble
    val dfm = terms.map(t => t -> corpus.count { case (i, _) => tf(i, t) > 0 }.toDouble).toMap
    val (k1, b) = (1.2, 0.75)
    def score(d: Long): Double = {
      val dl = toks(d).size.toDouble
      val s = terms.map { t =>
        val f = tf(d, t)
        if (f == 0) 0.0
        else ((nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5)) * (f * (k1 + 1.0)) /
          (f + k1 * ((1.0 - b) + b * (dl / (sumDl / nDocs))))
      }.reduceLeft(_ + _)
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = corpus.map(_._1).filter(d => terms.exists(t => tf(d, t) > 0))
      .map(d => d -> score(d)).sortBy { case (d, s) => (-s, d) }
      .zipWithIndex.map { case ((d, s), i) => (i + 1L, d, s) }
    assert(got.toSeq == expected, s"got ${got.toSeq} expected $expected")
  }

  test("removeBoilerplateLines drops cross-doc chrome, keeps order, spares empties") {
    import spark.implicits._
    // chrome line in 4 docs (> maxDocs=3), rare line in 1, empty lines everywhere
    val rows = (1L to 4L).map(d =>
      d -> s"  CHROME LINE  \n\nbody $d one\nbody $d two") :+
      (5L -> "CHROME LINE\nrare line\n\nrare line")
    val out = TextAnalysis.removeBoilerplateLines(
      rows.toDF("doc_id", "text"), "doc_id", "text", maxDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1: 4 lines, chrome removed (trim-matched), empty line kept
    assert(out(1L) == (4L, 1L, "\nbody 1 one\nbody 1 two"))
    // doc 5: chrome removed; the WITHIN-doc duplicate "rare line" stays
    // (df counts distinct docs, not occurrences)
    assert(out(5L) == (4L, 1L, "rare line\n\nrare line"))
  }

  test("dedupParagraphs: canonical occurrence survives, repeats cut, whitespace immune") {
    import spark.implicits._
    val shared = "the shared paragraph content"
    val rows = Seq(
      1L -> s"unique one\n\n$shared",              // canonical home of `shared` (doc 1, pos 1)
      2L -> s"$shared\n\nunique two",              // later doc: occurrence cut
      3L -> s"self\n\nself\n\n  \n\nself",         // within-doc repeats: keep FIRST, spare blank
      4L -> shared)                                // whole doc was a dup paragraph -> empties out
    val out = TextAnalysis.dedupParagraphs(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == (2L, 0L, s"unique one\n\n$shared"), s"canonical kept: ${out(1L)}")
    assert(out(2L) == (2L, 1L, "unique two"), s"non-canonical cut: ${out(2L)}")
    assert(out(3L) == (4L, 2L, "self\n\n  "), s"within-doc repeats cut, blank immune: ${out(3L)}")
    assert(out(4L) == (1L, 1L, ""), s"fully-duplicated doc empties out: ${out(4L)}")
    // trim-matching: leading/trailing spaces do not make a paragraph distinct
    val out2 = TextAnalysis.dedupParagraphs(
      Seq(1L -> s"  $shared  ", 2L -> shared).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out2 == Map(1L -> 0L, 2L -> 1L), s"trim-matched canonical: $out2")
  }

  test("incremental paragraph dedup: index hits, batch canonical, cross-batch via fold-in") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("para_inc_").toString
    val idx = s"$root/idx"
    TextAnalysis.buildParagraphIndex(
      Seq(1L -> "seed paragraph alpha\n\nseed paragraph beta").toDF("doc_id", "text"),
      "doc_id", "text", idx)
    // batch 1: an index hit, fresh content, and a batch-internal repeat
    val b1 = TextAnalysis.dedupParagraphsIncremental(Seq(
        10L -> "seed paragraph alpha\n\nfresh gamma",
        11L -> "fresh gamma\n\nfresh delta").toDF("doc_id", "text"),
      "doc_id", "text", idx, "b1")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(b1(10L) == (1L, "fresh gamma"), s"index hit cut, fresh kept: ${b1(10L)}")
    assert(b1(11L) == (1L, "fresh delta"),
      s"batch-internal repeat cut (10 holds the canonical): ${b1(11L)}")
    // batch 2: repeats batch 1's fresh content — only the fold-in catches it
    val b2 = TextAnalysis.dedupParagraphsIncremental(
        Seq(20L -> "fresh delta\n\nnever seen epsilon").toDF("doc_id", "text"),
      "doc_id", "text", idx, "b2")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(b2(20L) == (1L, "never seen epsilon"), s"cross-batch repeat cut: ${b2(20L)}")
    // compaction preserves membership
    TextAnalysis.compactParagraphIndex(spark, idx)
    val b3 = TextAnalysis.dedupParagraphsIncremental(
        Seq(30L -> "never seen epsilon").toDF("doc_id", "text"),
      "doc_id", "text", idx, "b3")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(b3(30L) == "", s"post-compaction membership intact: $b3")
  }

  test("removeBoilerplateLines overflow cap fails loudly") {
    import spark.implicits._
    val rows = (1L to 4L).map(d => d -> "common one\ncommon two")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.removeBoilerplateLines(
        rows.toDF("doc_id", "text"), "doc_id", "text",
        maxDocs = 3, maxBoilerLines = 1)
    }
    assert(e.getMessage.contains("boilerplate vocabulary exceeds"))
  }
}
