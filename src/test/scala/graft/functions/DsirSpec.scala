package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("importance scores target-like docs above alien docs; n_feats = 2n-1") {
    val target = docs(
      1L -> "alpha beta gamma delta alpha beta",
      2L -> "beta gamma alpha beta gamma delta")
    val pool = docs(
      10L -> "alpha beta gamma delta", // pure target vocabulary
      11L -> "zork quux blarg wibble", // alien vocabulary
      12L -> "")                       // unscoreable
    val out = Dsir.importance(target, pool, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(10L)._1 == 7L) // 4 unigrams + 3 bigrams
    assert(out(11L)._1 == 7L)
    assert(out(12L) == (0L -> None))
    assert(out(10L)._2.get > out(11L)._2.get,
      "target-vocabulary doc must out-score the alien doc")
  }

  test("dsirSelect keeps exactly the top keepPpm slice with contiguous ranks") {
    val target = docs(1L -> "alpha beta gamma alpha beta gamma")
    val pool = docs(
      10L -> "alpha beta gamma",
      11L -> "alpha beta zork",
      12L -> "zork quux blarg",
      13L -> "wibble wobble zap",
      14L -> "")
    val out = Dsir.dsirSelect(target, pool, "doc_id", "text",
      keepPpm = 500000L, buckets = 256)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toMap
    val ranks = out.values.flatMap(_._1).toSeq.sorted
    assert(ranks == Seq(1L, 2L, 3L, 4L), s"ranks must be 1..4, got $ranks")
    // 4 scoreable docs, keep 50% => exactly ranks 1 and 2 selected
    assert(out.values.count(_._2) == 2)
    assert(out(10L)._1.contains(1L) && out(10L)._2,
      "the pure-target doc must rank first and be selected")
    assert(out(14L) == (None -> false), "empty doc: null rank, unselected")
  }

  test("keepPpm boundaries: 10^6 keeps every scoreable doc, 0 keeps none") {
    val target = docs(1L -> "alpha beta")
    val pool = docs(10L -> "alpha beta", 11L -> "zork quux", 12L -> "")
    val all = Dsir.dsirSelect(target, pool, "doc_id", "text",
      keepPpm = 1000000L, buckets = 64).collect()
    assert(all.count(_.getBoolean(4)) == 2)
    val none = Dsir.dsirSelect(target, pool, "doc_id", "text",
      keepPpm = 0L, buckets = 64).collect()
    assert(none.count(_.getBoolean(4)) == 0)
  }

  test("empty target fails loudly") {
    val target = docs(1L -> "")
    val pool = docs(10L -> "alpha beta")
    val e = intercept[IllegalArgumentException] {
      Dsir.importance(target, pool, "doc_id", "text", buckets = 64)
    }
    assert(e.getMessage.contains("non-empty target"))
  }
}
