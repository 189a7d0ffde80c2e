package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Property test: gap-based sessionization agrees with a naive per-key scan
  * (sorted by (ts, tiebreak), session increments when gap > threshold).
  */
case class SessE(eid: Long, key: Long, t: java.sql.Timestamp)

class SessionizeSpec extends SparkSpec {
  import graft.operators.{SessE => E}

  test("byGap == naive scan over 20 random datasets") {
    import spark.implicits._
    val rng = new Random(99)
    val gapSec = 10L
    for (round <- 1 to 20) {
      val events = Seq.tabulate(1 + rng.nextInt(50)) { i =>
        E(i.toLong, rng.nextInt(4).toLong,
          new java.sql.Timestamp(1700000000000L + rng.nextInt(120) * 1000L))
      }
      val got = Sessionize.byGap(events.toDF(), "key", "t", "eid", gapSec)
        .select("eid", "session_id").as[(Long, Long)].collect().toMap

      val expected = events.groupBy(_.key).flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e.t.getTime, e.eid))
        var sess = 0L
        var prev: Option[Long] = None
        sorted.map { e =>
          if (prev.forall(p => e.t.getTime - p > gapSec * 1000)) sess += 1
          prev = Some(e.t.getTime)
          e.eid -> sess
        }
      }

      assert(got == expected, s"sessionize mismatch in round $round")
    }
  }

  test("session boundary is strict >gap (exactly gap stays in session)") {
    import spark.implicits._
    val events = Seq(
      E(1, 1, ts("2024-01-01 00:00:00")),
      E(2, 1, ts("2024-01-01 00:00:10")), // exactly 10s → same session
      E(3, 1, ts("2024-01-01 00:00:21"))) // 11s → new session
    val got = Sessionize.byGap(events.toDF(), "key", "t", "eid", 10L)
      .select("eid", "session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
