package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, ox, oy) =>
        ox <= x && oy <= y && (ox < x || oy < y)
      }
    }.map(_._1).toSet

  test("matches the quadratic dominance definition on random point sets") {
    val rnd = new Random(42)
    for (trial <- 1 to 8) {
      val pts = (1L to 200L).map(id =>
        (id, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      val got = Skyline.skyline2d(pts.toDF("id", "x", "y"), "x", "y",
          bucketWidth = if (trial % 2 == 0) 100L else 7L)
        .select("id").as[Long].collect().toSet
      assert(got == brute(pts), s"trial $trial")
    }
  }

  test("duplicate points survive together; a dominated duplicate pair is dropped together") {
    val pts = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 9L, 9L), (4L, 9L, 9L), (5L, 1L, 20L))
    val got = Skyline.skyline2d(pts.toDF("id", "x", "y"), "x", "y", 3L)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 5L))
  }

  test("ties on one dimension: only the min-y row(s) of an x-tie survive") {
    val pts = Seq((1L, 5L, 2L), (2L, 5L, 3L), (3L, 7L, 1L))
    val got = Skyline.skyline2d(pts.toDF("id", "x", "y"), "x", "y", 100L)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("a single global-min point dominates everything else") {
    val pts = (1L to 50L).map(id => (id, id + 10L, id + 10L)) :+ (99L, 1L, 1L)
    val got = Skyline.skyline2d(pts.toDF("id", "x", "y"), "x", "y", 5L)
      .select("id").as[Long].collect().toSet
    assert(got == Set(99L))
  }
}
