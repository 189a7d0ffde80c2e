package graft.functions

import scala.util.Random

import org.apache.spark.sql.{Encoders, functions => F}

import graft.SparkSpec

/** BottomK (typed Aggregator UDAF): bounded-state bottom-k == the unbounded
  * brute force, independent of partitioning and replay. */
class BottomKSpec extends SparkSpec {

  private def bk(k: Int) = F.udaf(new BottomK(k), Encoders.product[BottomK.In])

  test("bottom-k == brute force; partitioning-independent; replay-idempotent") {
    import spark.implicits._
    val rng = new Random(31)
    // skewed groups, duplicate payloads, hash-ordered keys
    val rows = Seq.tabulate(500) { i =>
      val g = if (i % 5 == 0) "hot" else s"g${rng.nextInt(4)}"
      (g, s"p${rng.nextInt(120)}")
    }
    val df = rows.toDF("g", "p")
      .select($"g", F.md5($"p").as("key"), $"p")

    def run(d: org.apache.spark.sql.DataFrame, k: Int) =
      d.groupBy("g").agg(bk(k)($"key", $"p").as("s"))
        .select($"g", F.explode($"s").as("p"))
        .as[(String, String)].collect().toSet

    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val brute = rows.distinct.map { case (g, p) => (g, md5hex(p), p) }
      .groupBy(_._1).toSeq.flatMap { case (g, es) =>
        es.map(e => (e._2, e._3)).distinct.sorted.take(3).map(e => (g, e._2))
      }.toSet

    assert(run(df, 3) == brute)
    assert(run(df.repartition(7, $"p"), 3) == brute, "merge tree must not matter")
    assert(run(df.unionAll(df), 3) == brute, "re-delivery must collapse (idempotent)")
    // k beyond the group size degrades to the full distinct group
    val all = run(df, 100000)
    assert(all == rows.distinct.toSet)
  }

  test("buffer never exceeds k elements (the bounded-state claim)") {
    val agg = new BottomK(4)
    val rng = new Random(7)
    var buf = agg.zero
    (0 until 1000).foreach { i =>
      buf = agg.reduce(buf, BottomK.In(f"${rng.nextInt(100000)}%06d", s"p$i"))
      assert(buf.keys.length <= 4 && buf.payloads.length <= 4)
      assert(buf.keys.zip(buf.payloads) == buf.keys.zip(buf.payloads).sorted,
        "buffer must stay sorted")
    }
    // merging two full buffers stays bounded and sorted
    var other = agg.zero
    (0 until 100).foreach(i => other = agg.reduce(other, BottomK.In(f"$i%06d", "q")))
    val merged = agg.merge(buf, other)
    assert(merged.keys.length <= 4)
  }
}
