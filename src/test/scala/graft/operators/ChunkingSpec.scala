package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  test("chunks cover the document exactly: stride prefixes + final chunk reassemble") {
    val docs = Seq(
      (1L, "a" * 1000),
      (2L, (0 until 700).map(i => ('a' + i % 26).toChar).mkString),
      (3L, "short"),
      (4L, "x" * 256),  // exactly one full chunk
      (5L, "y" * 257)   // one char spills into a second chunk
    ).toDF("doc_id", "text")
    val chunks = Chunking.chunkByChars(docs, "doc_id", "text", size = 256, stride = 192)
      .orderBy("doc_id", "chunk_id").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    docs.collect().foreach { r =>
      val (id, text) = (r.getAs[Long]("doc_id"), r.getAs[String]("text"))
      val cs = chunks(id).sortBy(_.getAs[Long]("chunk_id")).map(_.getAs[String]("chunk"))
      // non-final chunks contribute their first `stride` chars; final chunk all of it
      val rebuilt = cs.init.map(_.take(192)).mkString + cs.last
      assert(rebuilt == text, s"doc $id reassembly mismatch")
      // consecutive chunks overlap by size - stride chars
      cs.sliding(2).foreach {
        case Array(a, b) if a.length == 256 =>
          assert(a.drop(192) == b.take(a.length - 192), s"doc $id overlap mismatch")
        case _ => ()
      }
    }
  }

  test("empty text still yields one (empty) chunk — no document disappears") {
    val out = Chunking.chunkByChars(Seq((9L, "")).toDF("doc_id", "text"),
      "doc_id", "text", size = 64, stride = 32).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("chunk_id") == 0L)
    assert(out.head.getAs[String]("chunk") == "")
  }

  test("a stride wider than the chunk size is rejected (it would drop text)") {
    intercept[IllegalArgumentException] {
      Chunking.chunkByChars(Seq((1L, "abc")).toDF("doc_id", "text"),
        "doc_id", "text", size = 10, stride = 11)
    }
  }
}
