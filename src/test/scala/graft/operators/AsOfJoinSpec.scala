package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Property test: the union-then-window as-of join agrees with a naive
  * in-memory backward as-of (greatest right ts <= left ts, inclusive;
  * tie → greatest tiebreak) on random keyed event sets, including keys
  * with no right-side rows (null attach).
  */
case class AsofL(lid: Long, key: Long, t: java.sql.Timestamp)
case class AsofR(rid: Long, key: Long, t: java.sql.Timestamp, v: Double)

class AsOfJoinSpec extends SparkSpec {
  import graft.operators.{AsofL => L, AsofR => R}

  test("backward as-of join == naive argmax over 20 random datasets") {
    import spark.implicits._
    val rng = new Random(1234)
    for (round <- 1 to 20) {
      val lefts = Seq.tabulate(1 + rng.nextInt(40)) { i =>
        L(i.toLong, rng.nextInt(5).toLong, new java.sql.Timestamp(1700000000000L + rng.nextInt(10) * 1000L))
      }
      val rights = Seq.tabulate(rng.nextInt(40)) { i =>
        R(i.toLong, rng.nextInt(5).toLong, new java.sql.Timestamp(1700000000000L + rng.nextInt(10) * 1000L),
          rng.nextInt(100) / 4.0)
      }

      val got = AsOfJoin.backward(lefts.toDF(), rights.toDF(),
          leftKey = "key", rightKey = "key", leftTime = "t", rightTime = "t",
          rightTiebreak = "rid", rightValueCols = Seq("rid", "v"))
        .select("lid", "asof_rid", "asof_v")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toSet

      val expected = lefts.map { l =>
        val best = rights.filter(r => r.key == l.key && !r.t.after(l.t))
          .sortBy(r => (r.t.getTime, r.rid)).lastOption
        (l.lid, best.map(_.rid), best.map(_.v))
      }.toSet

      assert(got == expected, s"as-of mismatch in round $round")
      assert(got.size == lefts.size, "as-of join must not change left cardinality")
    }
  }

  test("forward as-of join == naive argmin over 20 random datasets") {
    import spark.implicits._
    val rng = new Random(5678)
    for (round <- 1 to 20) {
      val lefts = Seq.tabulate(1 + rng.nextInt(40)) { i =>
        L(i.toLong, rng.nextInt(5).toLong, new java.sql.Timestamp(1700000000000L + rng.nextInt(10) * 1000L))
      }
      val rights = Seq.tabulate(rng.nextInt(40)) { i =>
        R(i.toLong, rng.nextInt(5).toLong, new java.sql.Timestamp(1700000000000L + rng.nextInt(10) * 1000L),
          rng.nextInt(100) / 4.0)
      }
      val got = AsOfJoin.forward(lefts.toDF(), rights.toDF(),
          "key", "key", "t", "t", "rid", Seq("rid", "v"))
        .select("lid", "asof_rid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      val expected = lefts.map { l =>
        val best = rights.filter(r => r.key == l.key && !r.t.before(l.t))
          .sortBy(r => (r.t.getTime, r.rid)).headOption // min time, tie → min rid
        (l.lid, best.map(_.rid))
      }.toSet
      assert(got == expected, s"forward as-of mismatch in round $round")
    }
  }

  test("bucketed form == plain form across widths, hot keys and tolerance") {
    import spark.implicits._
    val rng = new Random(9012)
    // hot key 0 gets ~10× the rows of the others; timestamps span several
    // buckets at the small widths so the boundary stitch is exercised
    for ((bucketSeconds, round) <- Seq(2L, 5L, 3600L, 86400L).zipWithIndex) {
      val lefts = Seq.tabulate(120) { i =>
        val key = if (i % 2 == 0) 0L else rng.nextInt(5).toLong
        L(i.toLong, key, new java.sql.Timestamp(1700000000000L + rng.nextInt(30) * 1000L))
      }
      val rights = Seq.tabulate(120) { i =>
        val key = if (i % 2 == 0) 0L else rng.nextInt(5).toLong
        R(i.toLong, key, new java.sql.Timestamp(1700000000000L + rng.nextInt(30) * 1000L),
          rng.nextInt(100) / 4.0)
      }
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "asof_rid", "asof_v", "asof_t").collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
            if (r.isNullAt(2)) None else Some(r.getDouble(2)),
            Option(r.get(3)).map(_.toString))).toSet
      for (tol <- Seq(None, Some("10 SECONDS"))) {
        val plain = canon(AsOfJoin.backward(lefts.toDF(), rights.toDF(),
          "key", "key", "t", "t", "rid", Seq("rid", "v"), tolerance = tol))
        val bucketed = canon(AsOfJoin.backwardBucketed(lefts.toDF(), rights.toDF(),
          "key", "key", "t", "t", "rid", Seq("rid", "v"), tolerance = tol,
          bucketSeconds = bucketSeconds))
        assert(bucketed == plain,
          s"bucketed(width=${bucketSeconds}s, tol=$tol) diverges in round $round")
      }
    }
  }

  test("tolerance nulls out matches staler than the window") {
    import spark.implicits._
    val l = Seq(
      L(1L, 1L, ts("2024-01-10 00:00:00")),
      L(2L, 2L, ts("2024-01-10 00:00:00"))).toDF()
    val r = Seq(
      R(10L, 1L, ts("2024-01-09 23:00:00"), 1.0),  // 1h old — inside 1 day
      R(20L, 2L, ts("2024-01-05 00:00:00"), 2.0)). // 5 days old — outside
      toDF()
    val rows = AsOfJoin.backward(l, r, "key", "key", "t", "t", "rid", Seq("rid", "v"),
        tolerance = Some("1 DAY"))
      .select("lid", "asof_rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(rows(1L).contains(10L))
    assert(rows(2L).isEmpty, "stale match must be nulled by tolerance")
  }

  test("inclusive at equal timestamps") {
    import spark.implicits._
    val t0 = ts("2024-01-01 00:00:00")
    val l = Seq(L(1L, 1L, t0)).toDF()
    val r = Seq(R(10L, 1L, t0, 5.0), R(11L, 1L, t0, 7.0)).toDF()
    val row = AsOfJoin.backward(l, r, "key", "key", "t", "t", "rid", Seq("rid", "v")).collect().head
    // equal ts rows match (inclusive); tie broken by max rid
    assert(row.getAs[Long]("asof_rid") == 11L)
    assert(row.getAs[Double]("asof_v") == 7.0)
  }
}
