package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mkDf(iv: Seq[(Long, Long, Long)], id: String, lo: String, hi: String) =
    iv.toDF(id, "__l", "__h")
      .select(col(id), expr("timestamp_micros(__l)").as(lo), expr("timestamp_micros(__h)").as(hi))

  test("matches the quadratic overlap join exactly, at several cell widths") {
    val rnd = new Random(7)
    val a = (1L to 120L).map { i =>
      val lo = rnd.nextInt(1000000) * 1000000L; (i, lo, lo + rnd.nextInt(7200) * 1000000L)
    }
    val b = (1L to 80L).map { i =>
      val lo = rnd.nextInt(1000000) * 1000000L; (i, lo, lo + rnd.nextInt(7200) * 1000000L)
    }
    val expected = (for {
      (ia, la, ha) <- a; (ib, lb, hb) <- b if la <= hb && lb <= ha
    } yield (ia, ib)).toSet
    for (cell <- Seq(60L, 3600L, 86400L)) {
      val got = IntervalJoin.overlapJoin(
          mkDf(a, "a_id", "a_lo", "a_hi"), "a_lo", "a_hi",
          mkDf(b, "b_id", "b_lo", "b_hi"), "b_lo", "b_hi", cell)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"cell=$cell produced duplicate pairs")
      assert(got.toSet == expected, s"cell=$cell")
    }
  }

  test("touching endpoints count as overlap (closed intervals); disjoint do not") {
    val a = mkDf(Seq((1L, 0L, 1000000L)), "a_id", "a_lo", "a_hi")
    val touch = mkDf(Seq((1L, 1000000L, 2000000L)), "b_id", "b_lo", "b_hi")
    val apart = mkDf(Seq((2L, 1000001L, 2000000L)), "b_id", "b_lo", "b_hi")
    assert(IntervalJoin.overlapJoin(a, "a_lo", "a_hi", touch, "b_lo", "b_hi", 60L).count() == 1)
    assert(IntervalJoin.overlapJoin(a, "a_lo", "a_hi", apart, "b_lo", "b_hi", 60L).count() == 0)
  }

  test("an interval spanning many cells still pairs exactly once") {
    val a = mkDf(Seq((1L, 0L, 86400L * 1000000L)), "a_id", "a_lo", "a_hi") // 1 day
    val b = mkDf((1L to 24L).map(h => (h, h * 3600000000L, h * 3600000000L + 1L)),
      "b_id", "b_lo", "b_hi")
    val got = IntervalJoin.overlapJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi", 3600L)
    assert(got.count() == 24)
  }
}
