package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // skewed multiset: key k repeated k times, keys 1..40
  private val data = (1L to 40L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("k")

  test("estimates never undercount and are exact when the grid is collision-free") {
    val grid = CountMin.sketch(data, "k", depth = 4, width = 1024)
    val est = CountMin.estimate(grid, data, "k", depth = 4, width = 1024)
      .as[(Long, Long)].collect().toMap
    (1L to 40L).foreach { k =>
      assert(est(k) >= k, s"undercount for $k")
      // 40 keys in 1024 buckets × 4 rows: a collision in ALL FOUR rows is
      // effectively impossible, so the min is the true count
      assert(est(k) == k, s"collision-free grid should be exact for $k")
    }
  }

  test("grid is mergeable: sketch(a ∪ b) = cell-wise sum of sketch(a) + sketch(b)") {
    val a = data.filter(col("k") <= 20)
    val b = data.filter(col("k") > 20)
    val merged = CountMin.sketch(a, "k", 4, 64).unionAll(CountMin.sketch(b, "k", 4, 64))
      .groupBy("row", "bucket").agg(sum("c").as("c"))
    val whole = CountMin.sketch(data, "k", 4, 64)
    assert(merged.unionAll(whole).distinct().count() == whole.count(),
      "merged grid must equal the whole-data grid cell for cell")
  }

  test("absent probe key estimates 0 on an empty row (or a collision count), never null") {
    val grid = CountMin.sketch(data, "k", 4, 1024)
    val est = CountMin.estimate(grid, Seq(999L).toDF("k"), "k", 4, 1024)
      .as[(Long, Long)].collect().toMap
    assert(est(999L) >= 0L)
  }

  test("grid size is bounded by depth × width regardless of input size") {
    val grid = CountMin.sketch(data, "k", depth = 3, width = 16)
    assert(grid.count() <= 3 * 16)
    assert(grid.agg(sum("c")).as[Long].head() == data.count() * 3)
  }
}
