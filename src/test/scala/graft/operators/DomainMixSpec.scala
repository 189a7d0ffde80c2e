package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

class DomainMixSpec extends SparkSpec {

  test("sampleByDomain: exact at the extremes, near-target in between, deterministic") {
    import spark.implicits._
    val docs = (0L until 3000L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val rates = Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5)
    val kept = DomainMix.sampleByDomain(docs, "doc_id", "source", rates)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("src0") == 1000, "rate 1.0 keeps every row")
    assert(!kept.contains("src1"), "rate 0.0 keeps none")
    val half = kept("src2").toDouble / 1000
    assert(half > 0.42 && half < 0.58, s"rate 0.5 realized $half")

    // a pure function of content: re-running yields the identical id set
    val a = DomainMix.sampleByDomain(docs, "doc_id", "source", rates)
      .select("doc_id").as[Long].collect().toSet
    val b = DomainMix.sampleByDomain(docs.repartition(13), "doc_id", "source", rates)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("topFractionPerDomain keeps the exact per-domain rank prefix, ties by id") {
    import spark.implicits._
    // domain a: 5 docs, quality = id (desc rank: 5,4,3,2,1); keep 60% of 5
    // -> rank*1e6 <= 600000*5 -> rank <= 3 -> docs 5,4,3.
    // domain b: 2 docs with TIED quality -> rank by id; keep 60% of 2 ->
    // rank <= 1 (1*1e6 <= 1.2e6, 2*1e6 > 1.2e6) -> only the LOWER id.
    val docs = (Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", 4.0), (5L, "a", 5.0), (10L, "b", 7.0), (11L, "b", 7.0)))
      .toDF("doc_id", "source", "q")
    val got = DomainMix.topFractionPerDomain(docs, "doc_id", "source",
        col("q"), keepPpm = 600000L)
      .select("doc_id", "q_rank", "n_domain", "kept")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(5L) == ((5L, 1L, 5L, true)))
    assert(got(3L) == ((3L, 3L, 5L, true)), "rank 3 of 5 is inside 60%")
    assert(got(2L) == ((2L, 4L, 5L, false)), "rank 4 of 5 is outside 60%")
    assert(got(10L) == ((10L, 1L, 2L, true)), "tie broken toward lower id")
    assert(got(11L) == ((11L, 2L, 2L, false)))
    // boundary exactness: keep 40% of 5 -> 2*1e6 <= 2e6 keeps rank 2 EXACTLY
    val b = DomainMix.topFractionPerDomain(docs.filter(col("source") === "a"),
        "doc_id", "source", col("q"), keepPpm = 400000L)
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    assert(b == Set(5L, 4L), "integer ppm boundary is inclusive at equality")
  }

  test("mix decision is independent of the q52 split bucket (salted hash)") {
    import spark.implicits._
    val docs = (0L until 4000L).map(i => (i, "s")).toDF("doc_id", "source")
    val joint = docs
      .withColumn("in_train", GraftFunctions.hashSplitBucket(col("doc_id"), 100) < 50)
      .withColumn("kept", DomainMix.keepFlag(col("doc_id"), col("source"), Map.empty, 0.5))
      .groupBy("in_train", "kept").count()
      .as[(Boolean, Boolean, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // unsalted hashes would make kept ≡ in_train (count(true,false) = 0);
    // salted, every quadrant is populated near 1000
    assert(joint.size == 4 && joint.values.forall(c => c > 800 && c < 1200), joint.toString)
  }

  test("temperatureSample: √n weights up-weight small domains; rates match driver math") {
    import spark.implicits._
    // 6400 / 1600 / 400 docs: α=1/2 weights 80 / 40 / 20 → shares 4/7, 2/7, 1/7
    val docs = ((0L until 6400L).map(i => (i, "big")) ++
      (10000L until 11600L).map(i => (i, "mid")) ++
      (20000L until 20400L).map(i => (i, "small"))).toDF("doc_id", "source")
    val budget = 4200L
    val out = DomainMix.temperatureSample(docs, "doc_id", "source", budget)
    // driver-side replay of the exact rate math
    val ns = Map("big" -> 6400L, "mid" -> 1600L, "small" -> 400L)
    val ssum = ns.toSeq.sortBy(_._1).map { case (_, n) => math.sqrt(n.toDouble) }
      .foldLeft(0.0)(_ + _)
    val expectPpm = ns.map { case (d, n) =>
      d -> math.min(1000000L, math.floor(1000000.0 *
        ((budget.toDouble * (math.sqrt(n.toDouble) / ssum)) / n.toDouble)).toLong)
    }
    val gotPpm = out.select("source", "keep_ppm").distinct()
      .as[(String, Long)].collect().toMap
    assert(gotPpm == expectPpm, s"got $gotPpm expected $expectPpm")
    // small domains keep a HIGHER fraction than their share (the point of α<1)
    assert(expectPpm("small") > expectPpm("mid") && expectPpm("mid") > expectPpm("big"))
    // realized counts concentrate near target ppm (binomial, ±5 σ-ish slack)
    val kept = out.filter(col("kept")).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    ns.foreach { case (d, n) =>
      val exp = n.toDouble * expectPpm(d) / 1e6
      assert(math.abs(kept(d) - exp) < 5 * math.sqrt(exp) + 10,
        s"$d kept ${kept(d)} vs expected ~$exp")
    }
  }

  test("temperatureSample: over-allocated domain clamps at ppm 1e6 (keeps everything)") {
    import spark.implicits._
    val docs = ((0L until 5000L).map(i => (i, "big")) ++
      (9000L until 9010L).map(i => (i, "tiny"))).toDF("doc_id", "source")
    // budget big enough that tiny's allocation exceeds its size
    val out = DomainMix.temperatureSample(docs, "doc_id", "source", budget = 4000L)
    val tiny = out.filter(col("source") === "tiny")
    assert(tiny.filter(col("keep_ppm") === 1000000L).count() == 10L)
    assert(tiny.filter(col("kept")).count() == 10L, "clamped domain keeps every row")
  }

  test("temperatureSample: null-domain docs are sampled as their own domain, not dropped") {
    import spark.implicits._
    val docs = ((0L until 900L).map(i => (i, Some("big"))) ++
      (2000L until 2400L).map(i => (i, Option.empty[String]))).toDF("doc_id", "source")
    val out = DomainMix.temperatureSample(docs, "doc_id", "source", budget = 600L)
    // EVERY doc gets a row — null domains included (the @return contract)
    assert(out.count() == 1300L, "null-domain docs must not vanish from the output")
    val nullRows = out.filter(col("source").isNull)
    assert(nullRows.count() == 400L)
    // and the null group's rate follows the same √n math as any domain
    val ssum = math.sqrt(900.0) + math.sqrt(400.0)
    val expectNullPpm = math.min(1000000L, math.floor(1000000.0 *
      ((600.0 * (math.sqrt(400.0) / ssum)) / 400.0)).toLong)
    val gotNullPpm = nullRows.select("keep_ppm").distinct().as[Long].collect().toSeq
    assert(gotNullPpm == Seq(expectNullPpm), s"got $gotNullPpm expected $expectNullPpm")
  }
}
