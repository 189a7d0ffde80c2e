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
}
