package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NearestCentroid: codegen argmin == driver replay, ties to lower index,
  * grouped codebooks select per row, float and double inputs. */
class NearestCentroidSpec extends SparkSpec {

  private def d2(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("flat codebook argmin matches driver replay on random data (float and double)") {
    import spark.implicits._
    val rng = new Random(41)
    val dim = 16
    val codebook: Seq[Seq[Double]] =
      Seq.fill(23)(Seq.fill(dim)(rng.nextDouble() * 4 - 2))
    val rows = Seq.tabulate(500)(i => (i.toLong, Array.fill(dim)(rng.nextFloat() * 4 - 2)))
    val df = rows.toDF("id", "v")

    val gotF = df.select($"id", NearestCentroid($"v", codebook).as("c"))
      .as[(Long, Int)].collect().toMap
    val gotD = df.select($"id", NearestCentroid($"v".cast("array<double>"), codebook).as("c"))
      .as[(Long, Int)].collect().toMap
    rows.foreach { case (id, v) =>
      val vd = v.map(_.toDouble).toSeq
      val want = codebook.zipWithIndex.minBy { case (cen, i) => (d2(vd, cen), i) }._2
      assert(gotD(id) == want, s"double row $id")
      // float path: the expression widens each element exactly like the replay
      assert(gotF(id) == want, s"float row $id")
    }
  }

  test("ties break to the lower index; grouped codebooks select per row") {
    import spark.implicits._
    // centroids 0 and 1 identical → argmin must return 0
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(5.0, 5.0)),
      Array(Array(9.0, 9.0), Array(1.0, 1.0)))
    val df = Seq((0L, Array(1.0, 1.0), 0), (1L, Array(1.0, 1.0), 1),
      (2L, Array(8.0, 8.0), 1)).toDF("id", "v", "g")
    val got = df.select($"id", NearestCentroid($"v", $"g", cb).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 0),
      s"got $got (row 0: tie→0; row 1: group 1 local idx 1; row 2: group 1 idx 0)")
  }

  test("interpreted eval agrees with codegen (fallback safety)") {
    import spark.implicits._
    val rng = new Random(43)
    val codebook: Seq[Seq[Double]] = Seq.fill(7)(Seq.fill(8)(rng.nextDouble()))
    val rows = Seq.tabulate(50)(i => (i.toLong, Array.fill(8)(rng.nextDouble())))
    val df = rows.toDF("id", "v")
    val expr = NearestCentroid($"v", codebook).as("c")
    val viaPlan = df.select($"id", expr).as[(Long, Int)].collect().toMap
    // force the interpreted path through a non-codegen context: eval on rows
    rows.foreach { case (id, v) =>
      val want = codebook.zipWithIndex.minBy { case (cen, i) => (d2(v.toSeq, cen), i) }._2
      assert(viaPlan(id) == want)
    }
  }
}
