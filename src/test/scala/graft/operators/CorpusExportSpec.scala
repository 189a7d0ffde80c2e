package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusExportSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (0L until 40L).map(i => (i, s"document body number $i with words"))
      .toDF("doc_id", "text")
  }

  test("exportShards writes a manifest that matches the source recomputation") {
    val out = Files.createTempDirectory("export_spec_").toString + "/corpus"
    val manifest = CorpusExport.exportShards(corpus, "doc_id", "text", out, 4)
    assert(manifest.agg(sum(col("n_rows"))).collect().head.getLong(0) == 40L)
    assert(CorpusExport.verifyExport(spark, corpus, "doc_id", "text", out, 4))
    // the manifest is read-back state, not a copy of the in-flight frame:
    // shard assignment on disk agrees with the content-addressed rule
    val onDisk = spark.read.parquet(out)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.hashSplitBucket(col("doc_id"), 4)
          .as("expected"), col("shard").cast("long").as("shard"))
    assert(onDisk.filter(col("expected") =!= col("shard")).isEmpty)
  }

  test("diffCorpora classifies added / removed / changed / unchanged exactly") {
    import spark.implicits._
    val before = Seq((1L, "same"), (2L, "old text"), (3L, "going away"))
      .toDF("doc_id", "text")
    val after = Seq((1L, "same"), (2L, "new text"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val got = CorpusExport.diffCorpora(before, after, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("a lost shard file breaks verification; a changed row breaks the checksum") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("export_spec_").toString
    val out = s"$root/corpus"
    CorpusExport.exportShards(corpus, "doc_id", "text", out, 4)
    // tamper 1: drop one data file (a "lost object" in the store)
    val victim = Files.walk(Paths.get(out)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        p.toString.contains("shard="))
      .toSeq.head
    Files.delete(victim)
    assert(!CorpusExport.verifyExport(spark, corpus, "doc_id", "text", out, 4),
      "a missing file must fail verification")
    // tamper 2: same counts, different content — checksum must catch it
    val altered = corpus.withColumn("text",
      when(col("doc_id") === 7L, lit("corrupted")).otherwise(col("text")))
    val out2 = s"$root/corpus2"
    CorpusExport.exportShards(corpus, "doc_id", "text", out2, 4)
    assert(!CorpusExport.verifyExport(spark, altered, "doc_id", "text", out2, 4),
      "an altered row with identical counts must fail the checksum")
  }
}
