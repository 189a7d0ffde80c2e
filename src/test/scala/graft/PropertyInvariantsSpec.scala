package graft

import org.apache.spark.sql.functions._

import graft.functions.LexicalRetrieval
import graft.operators.{CorpusExport, PrefixScan}
import graft.similarity.Similarity

/** Randomized invariants — seeded, so failures reproduce — pitting the
  * distributed operators against tiny driver-side references across many
  * generated shapes (the property-testing discipline without needing the
  * scalatest-scalacheck bridge on the classpath). Each case uses a SMALL
  * alphabet / corpus so the interesting collisions (tied keys at partition
  * boundaries, overlapping phrase starts, shared ranks) actually occur. */
class PropertyInvariantsSpec extends SparkSpec {

  test("prefix scan equals the sequential fold across random shapes") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val n = 50 + rng.nextInt(400)
      val keyRange = 1 + rng.nextInt(6) // few distinct keys -> boundary ties
      val rows = Seq.tabulate(n)(i =>
        (i.toLong, rng.nextInt(keyRange).toDouble, rng.nextInt(50).toLong))
      val got = PrefixScan.runningTotal(
          rows.toDF("id", "k", "v").repartition(1 + rng.nextInt(9)),
          Seq(col("k").desc, col("id").asc), col("v"))
        .select("id", "running_total").as[(Long, Long)].collect().toMap
      var acc = 0L
      val want = rows.sortBy { case (id, k, _) => (-k, id) }
        .map { case (id, _, v) => acc += v; id -> acc }.toMap
      assert(got == want, s"seed $seed: n=$n keys=$keyRange")
    }
  }

  test("phrase counts equal the naive sliding-window scan on random token strings") {
    import spark.implicits._
    val alphabet = Seq("a", "b", "c")
    (1 to 5).foreach { seed =>
      val rng = new scala.util.Random(100 + seed)
      val docs = Seq.tabulate(30)(i =>
        (i.toLong, Seq.fill(3 + rng.nextInt(25))(
          alphabet(rng.nextInt(alphabet.size))).mkString(" ")))
      val idx = java.nio.file.Files.createTempDirectory("prop_idx_").toString
      LexicalRetrieval.buildBm25Index(docs.toDF("doc_id", "text"),
        "doc_id", "text", idx, buckets = 4)
      val phrase = Seq.fill(2 + rng.nextInt(2))(alphabet(rng.nextInt(alphabet.size)))
      val got = LexicalRetrieval.phraseTopK(spark, idx, phrase, k = 1000)
        .select("doc_id", "n_phrase").as[(Long, Long)].collect().toMap
      val want = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").toSeq
        val c = toks.sliding(phrase.size).count(_ == phrase)
        if (c > 0) Some(id -> c.toLong) else None
      }.toMap
      assert(got == want, s"seed $seed phrase=$phrase")
    }
  }

  test("indexed BM25 equals the exact reference across random corpora and caps") {
    import spark.implicits._
    val alphabet = Seq("w1", "w2", "w3", "w4", "w5")
    (1 to 4).foreach { seed =>
      val rng = new scala.util.Random(200 + seed)
      val docs = Seq.tabulate(20)(i =>
        (i.toLong, Seq.fill(rng.nextInt(15))(
          alphabet(rng.nextInt(alphabet.size))).mkString(" ")))
      val idx = java.nio.file.Files.createTempDirectory("prop_idx_").toString
      LexicalRetrieval.buildBm25Index(docs.toDF("doc_id", "text"),
        "doc_id", "text", idx, buckets = 4)
      val qTerms = rng.shuffle(alphabet).take(1 + rng.nextInt(3))
      val ppm = Seq(1000000L, 600000L)(rng.nextInt(2))
      val got = LexicalRetrieval.bm25TopKIndexed(spark, idx,
          Seq((1L, qTerms)).toDF("query_id", "terms"), k = 100, maxDfPpm = ppm)
        .select("doc_id", "score").as[(Long, Double)].collect().toMap
      // reference: exclude capped terms, then the exact ordered-fold BM25
      def toks(t: String) = if (t.trim.isEmpty) Seq.empty[String]
        else t.trim.split("\\s+").toSeq
      val nDocs = docs.size.toLong
      val surviving = qTerms.filter { t =>
        val df = docs.count(d => toks(d._2).contains(t)).toLong
        df * 1000000L <= ppm * nDocs
      }
      val want = exactBm25(docs, surviving)
      assert(got == want, s"seed $seed terms=$qTerms ppm=$ppm")
    }
  }

  test("corpus diff equals set algebra across random edit scripts") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val rng = new scala.util.Random(300 + seed)
      val before = Seq.tabulate(40)(i => (i.toLong, s"text $i ${rng.nextInt(5)}"))
      val after = before
        .filterNot { case (id, _) => id % (2 + rng.nextInt(4)) == 0 } // removals
        .map { case (id, t) =>
          if (rng.nextInt(4) == 0) (id, t + " edited") else (id, t) // changes
        } ++ Seq.tabulate(rng.nextInt(6))(j => (1000L + j, s"added $j"))
      val got = CorpusExport.diffCorpora(before.toDF("doc_id", "text"),
          after.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, String)].collect().toMap
      val bm = before.toMap
      val am = after.toMap
      val want = (bm.keySet ++ am.keySet).map { id =>
        id -> ((bm.get(id), am.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(x), Some(y)) if x == y => "unchanged"
          case _ => "changed"
        })
      }.toMap
      assert(got == want, s"seed $seed")
    }
  }

  test("rrf fusion equals the driver fold across random arm sets") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val rng = new scala.util.Random(400 + seed)
      val nArms = 2 + rng.nextInt(3)
      val arms = Seq.fill(nArms) {
        // per query: a random subset of docs ranked 1..m
        (1L to 3L).flatMap { q =>
          rng.shuffle((1L to 12L).toList).take(rng.nextInt(8))
            .zipWithIndex.map { case (d, i) => (q, d, (i + 1).toLong) }
        }
      }
      val got = Similarity.rrfFuse(
          arms.map(_.toDF("query_id", "doc_id", "rank")), k = 100)
        .select("query_id", "doc_id", "rrf")
        .as[(Long, Long, Double)].collect()
        .map { case (q, d, s) => (q, d) -> s }.toMap
      val want = arms.flatten.map(r => (r._1, r._2)).distinct
        .map { case (q, d) =>
          val raw = arms.map(_.collectFirst { case (`q`, `d`, r) => 1.0 / (60.0 + r) }
            .getOrElse(0.0)).foldLeft(0.0)(_ + _)
          (q, d) -> BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }.toMap
      assert(got == want, s"seed $seed arms=$nArms")
    }
  }

  /** Exact BM25 reference: same literals, ascending-term_id ordered fold. */
  private def exactBm25(docs: Seq[(Long, String)], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    def toks(t: String) = if (t.trim.isEmpty) Seq.empty[String]
      else t.trim.toLowerCase.split("\\s+").toSeq
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val nDocs = docs.size.toLong
    val sumDl = docs.map(d => toks(d._2).size.toLong).sum
    val avgdl = sumDl.toDouble / nDocs.toDouble
    val dfm = terms.map(t => t -> docs.count(d => toks(d._2).contains(t)).toLong).toMap
    docs.flatMap { case (did, text) =>
      val tl = toks(text)
      val contribs = terms.flatMap { t =>
        val tf = tl.count(_ == t).toLong
        if (tf == 0 || dfm(t) == 0) None
        else {
          val idf = (nDocs.toDouble - dfm(t).toDouble + 0.5) / (dfm(t).toDouble + 0.5)
          Some((h60(t), idf * (tf.toDouble * (k1 + 1.0)) /
            (tf.toDouble + k1 * ((1.0 - b) + b * (tl.size.toDouble / avgdl)))))
        }
      }
      if (contribs.isEmpty) None
      else {
        val raw = contribs.sortBy(_._1).foldLeft(0.0)(_ + _._2)
        Some(did -> BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toMap
  }
}
