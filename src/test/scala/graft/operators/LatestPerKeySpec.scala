package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Property test (SURVEY.md §5.1): for random (key, ts, seq, value) sets with
  * duplicate keys and duplicate timestamps, the two batch forms of
  * latest-per-key agree with each other and with a naive in-memory argmax
  * (max event_time, tie → max seq). The streaming form is covered by
  * [[graft.streaming.StreamingSpec]].
  */
case class LpkRec(key: Long, ts: java.sql.Timestamp, seq: Long, value: Double)

class LatestPerKeySpec extends SparkSpec {
  import graft.operators.{LpkRec => Rec}

  private def randomRecs(rng: Random, n: Int): Seq[Rec] =
    Seq.tabulate(n) { i =>
      Rec(
        key = rng.nextInt(8).toLong,
        // coarse second grid to force plenty of exact-timestamp ties
        ts = new java.sql.Timestamp(1700000000000L + rng.nextInt(5) * 1000L),
        seq = i.toLong,
        value = rng.nextInt(1000) / 10.0)
    }

  private def naiveLatest(recs: Seq[Rec]): Map[Long, Rec] =
    recs.groupBy(_.key).map { case (k, rs) =>
      k -> rs.maxBy(r => (r.ts.getTime, r.seq))
    }

  test("viaMaxBy == viaWindow == naive argmax over 30 random datasets") {
    import spark.implicits._
    val rng = new Random(42)
    for (round <- 1 to 30) {
      val recs = randomRecs(rng, 1 + rng.nextInt(60))
      val df = recs.toDF()
      val expected = naiveLatest(recs).map { case (k, r) => (k, r.ts, r.seq, r.value) }.toSet

      val got1 = LatestPerKey.viaMaxBy(df, Seq("key"), "ts", Seq("seq"))
        .as[Rec].collect().map(r => (r.key, r.ts, r.seq, r.value)).toSet
      val got2 = LatestPerKey.viaWindow(df, Seq("key"), "ts", Seq("seq"))
        .as[Rec].collect().map(r => (r.key, r.ts, r.seq, r.value)).toSet
      val got3 = LatestPerKey.viaMaxBySalted(df, Seq("key"), "ts", Seq("seq"), saltBuckets = 4)
        .as[Rec].collect().map(r => (r.key, r.ts, r.seq, r.value)).toSet

      assert(got1 == expected, s"viaMaxBy mismatch in round $round")
      assert(got2 == expected, s"viaWindow mismatch in round $round")
      assert(got3 == expected, s"viaMaxBySalted mismatch in round $round")
    }
  }

  test("topNPerKey returns ranked prefix per key") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rng = new Random(7)
    val recs = randomRecs(rng, 80)
    val df = recs.toDF()
    val got = LatestPerKey.topNPerKey(df, Seq("key"), Seq(col("value").desc, col("seq").asc), 3)
      .select("key", "rn", "seq").as[(Long, Int, Long)].collect()

    val expected = recs.groupBy(_.key).flatMap { case (k, rs) =>
      rs.sortBy(r => (-r.value, r.seq)).take(3).zipWithIndex.map { case (r, i) => (k, i + 1, r.seq) }
    }.toSet
    assert(got.toSet == expected)
    // ranks are 1..min(3, groupSize) with no gaps
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
    }
  }
}
