package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Property test: the sharded aggregate-HOF packing equals a sequential
  * greedy reference run per shard on the driver, and packed sequences
  * respect the budget (except single over-budget docs, which sit alone). */
class SequencePackingSpec extends SparkSpec {

  private def shardOf(id: Long, n: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % n
  }

  test("packSequences == sequential greedy reference on a random corpus") {
    import spark.implicits._
    val rng = new Random(11)
    val budget = 100L
    val docs = (0L until 400L).map(i => (i, Seq.fill(rng.nextInt(120))("w").mkString(" ")))
    val got = SequencePacking
      .packSequences(docs.toDF("doc_id", "text"), "doc_id", "text", budget, nShards = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

    val expected = docs
      .map { case (id, text) => (id, shardOf(id, 8), if (text.isEmpty) 0L else text.split("\\s+").length.toLong) }
      .groupBy(_._2).flatMap { case (shard, ds) =>
        var (seq, fill) = (0L, 0L)
        ds.sortBy(_._1).map { case (id, _, t) =>
          if (fill + t > budget && fill > 0) { seq += 1; fill = 0 }
          val off = fill; fill += t
          id -> ((shard, seq, off, t))
        }
      }
    assert(got == expected.toMap)

    // budget invariant: a sequence's total tokens fit, or it is one oversized doc
    got.groupBy { case (_, (sh, sq, _, _)) => (sh, sq) }.foreach { case (_, ms) =>
      val total = ms.values.map(_._4).sum
      assert(total <= budget || ms.size == 1, s"overfull multi-doc sequence: $ms")
    }

    // multi-doc sequences exist (the packer actually packs at this budget)
    assert(got.groupBy { case (_, (sh, sq, _, _)) => (sh, sq) }.exists(_._2.size > 1))
  }
}
