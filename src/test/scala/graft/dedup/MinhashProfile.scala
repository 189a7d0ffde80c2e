package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions._

/** Minhash pipeline on the real sf0.01 corpus — stage-level smoke + a
  * regression canary for the planning blowup fixed by materializing the
  * signature index (full pipeline used to take ~50s of pure Catalyst
  * re-optimization; now seconds). */
class MinhashProfile extends SparkSpec {
  test("minhash pipeline stages run and verified pairs respect the threshold") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val shingled = docs.select(col("doc_id"),
      array_distinct(wordShingles(col("text"), 5)).as("shingles"))
    val sig = shingled.withColumn("sig", minhashSignature(col("shingles"), 64))
    assert(sig.select(size(col("sig"))).head().getInt(0) == 64)

    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5).collect()
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
    assert(pairs.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
  }
}
