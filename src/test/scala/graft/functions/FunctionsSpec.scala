package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions._

class FunctionsSpec extends SparkSpec {

  test("wsTokens / token counts handle empty, blank and multi-space text") {
    import spark.implicits._
    val rows = Seq("", "   ", "one", "a  b\tc\nd", "héllo wörld")
      .toDF("text")
      .select(tokenCountWs(col("text")).as("ws"), tokenCountBpeish(col("text")).as("bpe"))
      .as[(Int, Int)].collect()
    assert(rows.map(_._1).toSeq == Seq(0, 0, 1, 4, 2))
    assert(rows(2)._2 == 1) // "one" → one ≤4-char letter run
  }

  test("wordShingles and charNgrams cover short inputs without dropping content") {
    import spark.implicits._
    val df = Seq("a b c d e", "a b", "abcdef").toDF("text")
    val sh = df.select(wordShingles(col("text"), 3).as("s")).as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d", "c d e"))
    assert(sh(1) == Seq("a b")) // fewer than k tokens → single shingle
    val ng = df.select(charNgrams(col("text"), 4).as("g")).as[Seq[String]].collect()
    assert(ng(2) == Seq("abcd", "bcde", "cdef"))
  }

  test("simhash: identical tokens → hamming 0; near dup closer than unrelated") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "spark catalyst expression codegen shuffle partition"))
      .toDF("id", "text")
      .select(col("id"), simhash64(wsTokens(lower(col("text")))).as("h"))
    val h = df.as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) == 0)
    assert(ham(h(1L), h(3L)) < ham(h(1L), h(4L)))
  }

  test("winnowing fingerprint is robust to a local edit") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog and keeps running through the field"
    val b = a.replace("jumps", "leaps") // one local edit
    val c = "completely different text with nothing shared at all between documents"
    val fps = Seq(a, b, c).toDF("text")
      .select(winnowingFingerprint(col("text"), n = 8, w = 4).as("fp"))
      .as[Seq[Long]].collect()
    def overlap(x: Seq[Long], y: Seq[Long]) =
      x.toSet.intersect(y.toSet).size.toDouble / math.max(x.toSet.union(y.toSet).size, 1)
    assert(overlap(fps(0), fps(1)) > 0.5, "local edit keeps most fingerprints")
    assert(overlap(fps(0), fps(2)) < 0.1, "unrelated docs share almost none")
  }

  test("native CosineSimilarity expression == HOF cosine == scala loop") {
    import spark.implicits._
    val rng = new Random(3)
    val vecs = Seq.tabulate(30)(i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() * 2 - 1), Array.fill(16)(rng.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "a", "b")
    val rows = df.select(
        col("id"),
        CosineSimilarity(col("a"), col("b")).as("native"),
        cosineHof(col("a"), col("b")).as("hof"))
      .as[(Long, Double, Double)].collect()
    val naive = vecs.map { case (id, a, b) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      id -> dot / (math.sqrt(na) * math.sqrt(nb))
    }.toMap
    rows.foreach { case (id, nat, hof) =>
      assert(nat == hof, s"native vs HOF differ for $id") // identical op order → bit-equal
      assert(math.abs(nat - naive(id)) < 1e-12)
    }
  }

  test("CosineSimilarity edge cases: zero norm and length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 1.0f, 5.0f), Array(1.0f, 1.0f))) // common-prefix semantics
      .toDF("a", "b")
      .select(CosineSimilarity(col("a"), col("b")).as("c")).as[Double].collect()
    assert(df(0) == 0.0)
    assert(math.abs(df(1) - 1.0) > 0 || df(1) <= 1.0) // prefix [1,1]·[1,1] normalized by |[1,1,5]|
  }

  test("hyperplaneLshKey: deterministic, and equal vectors share a bucket") {
    import spark.implicits._
    val v = Array(0.3f, -0.7f, 0.2f, 0.9f)
    val df = Seq((1L, v), (2L, v), (3L, Array(-0.3f, 0.7f, -0.2f, -0.9f))).toDF("id", "v")
      .select(col("id"), hyperplaneLshKey(col("v"), 8).as("b")).as[(Long, Long)].collect().toMap
    assert(df(1L) == df(2L))
    // antipodal vector flips every sign bit
    assert(df(3L) == (~df(1L) & 0xFFL))
  }

  test("SortedIntersectSize == size(array_intersect) on random sorted-distinct sets") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      def set() = Seq.fill(rng.nextInt(40))(rng.nextInt(60).toLong).distinct.sorted
      (i.toLong, set(), set())
    }
    val got = rows.toDF("id", "a", "b")
      .select(col("id"),
        SortedIntersectSize(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .as[(Long, Int, Int)].collect()
    got.foreach { case (id, fast, ref) => assert(fast == ref, s"row $id") }
    // edges: empty vs non-empty, disjoint, identical
    val edge = Seq(
      (Seq.empty[Long], Seq(1L, 2L)), (Seq(1L, 3L), Seq(2L, 4L)), (Seq(5L, 6L), Seq(5L, 6L)))
      .toDF("a", "b")
      .select(SortedIntersectSize(col("a"), col("b"))).as[Int].collect()
    assert(edge.sameElements(Array(0, 0, 2)))
  }

  test("zOrder2 matches the reference Morton interleave on exhaustive small inputs") {
    import spark.implicits._
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val pairs = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), zOrder2(col("a"), col("b"), bits = 4).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == morton(a, b, 4), s"($a,$b)") }
    assert(got.map(_._3).distinct.length == 256, "Morton code is a bijection on the grid")
  }

  test("zOrderN: n=2 reproduces zOrder2 bit-for-bit; n=3 is a bijection with the reference layout") {
    import spark.implicits._
    // n = 2 delegation: identical codes on the exhaustive grid
    val pairs = (for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)).toDF("a", "b")
    val same = pairs.select(
        (zOrder2(col("a"), col("b"), bits = 4) ===
          zOrderN(Seq(col("a"), col("b")), bits = 4)).as("eq"))
      .as[Boolean].collect()
    assert(same.forall(identity), "zOrderN(2 cols) must equal zOrder2")
    // n = 3 reference: bit i of column j at position 3i + j
    def morton3(a: Long, b: Long, c: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (3 * i)) |
        (((b >> i) & 1L) << (3 * i + 1)) | (((c >> i) & 1L) << (3 * i + 2)))
        .reduce(_ | _)
    val triples = (for (a <- 0L until 8L; b <- 0L until 8L; c <- 0L until 8L)
      yield (a, b, c)).toDF("a", "b", "c")
    val got = triples.select(col("a"), col("b"), col("c"),
        zOrderN(Seq(col("a"), col("b"), col("c")), bits = 3).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, c, z) => assert(z == morton3(a, b, c, 3), s"($a,$b,$c)") }
    assert(got.map(_._4).distinct.length == 512, "3-d Morton code is a bijection on the grid")
    intercept[IllegalArgumentException](zOrderN(Seq(col("a")), bits = 4))
    intercept[IllegalArgumentException](zOrderN(Seq(col("a"), col("b"), col("c")), bits = 22))
  }

  test("zOrder2 range partitioning clusters BOTH dimensions (bounding boxes shrink)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.spark_partition_id
    // 64×64 grid, 16 range partitions on the z-value: the z-curve visits the
    // grid in 16×16 blocks, so each partition's bounding box covers ~1/16 of
    // the area; partitioning on a single column can only shrink ONE side
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    val parts = grid
      .withColumn("z", zOrder2(col("a"), col("b"), bits = 6))
      .repartitionByRange(16, col("z"))
      .groupBy(spark_partition_id().as("pid"))
      .agg((org.apache.spark.sql.functions.max("a") - org.apache.spark.sql.functions.min("a"))
          .as("da"),
        (org.apache.spark.sql.functions.max("b") - org.apache.spark.sql.functions.min("b"))
          .as("db"))
      .as[(Int, Long, Long)].collect()
    val avgArea = parts.map(p => (p._2 + 1.0) * (p._3 + 1.0)).sum / parts.length
    assert(avgArea <= 64 * 64 / 8.0,
      s"z-partitions must bound small 2-d boxes, got avg area $avgArea of ${64 * 64}")
  }

  test("z-order layout prunes parquet row groups on a 2-d box; round-robin cannot") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    // the payoff the bounding boxes buy: each z-clustered FILE carries tight
    // (a, b) min/max footer stats, so a 2-d box predicate skips most row
    // groups at scan time — a round-robin layout holds matching rows in
    // EVERY file, so its stats prune nothing. This is the OPTIMIZE ZORDER
    // read path at 100 TB: the same filter, orders less IO.
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    val zDir = java.nio.file.Files.createTempDirectory("zorder_files_").toString
    val rDir = java.nio.file.Files.createTempDirectory("rrobin_files_").toString
    grid.withColumn("z", zOrder2(col("a"), col("b"), bits = 6))
      .repartitionByRange(16, col("z")).drop("z")
      .write.mode("overwrite").parquet(zDir)
    grid.repartition(16).write.mode("overwrite").parquet(rDir)

    def scanned(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir).filter(col("a") < 8 && col("b") < 8)
      // drive THIS queryExecution (count() would plan a separate one whose
      // metrics never land on the plan object inspected below)
      val n = df.collect().length.toLong
      val finalPlan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scan = finalPlan.collect { case s: FileSourceScanExec => s }.head
      (n, scan.metrics("numOutputRows").value)
    }
    val (nZ, rowsZ) = scanned(zDir)
    val (nR, rowsR) = scanned(rDir)
    assert(nZ == 64 && nR == 64, "same answer from both layouts")
    assert(rowsZ <= 64 * 64 / 8,
      s"z layout must skip most row groups (scan emitted $rowsZ of ${64 * 64})")
    assert(rowsR == 64 * 64,
      s"control: round-robin stats cover the whole grid, nothing skips ($rowsR)")
  }

  test("weightedKeep: weight 0 never keeps, weight max always keeps, rate tracks w/max") {
    import spark.implicits._
    val ids = (1L to 4000L).toSeq.toDF("id")
    assert(ids.filter(GraftFunctions.weightedKeep(col("id"), lit(0L), lit(100L))).count() == 0)
    assert(ids.filter(GraftFunctions.weightedKeep(col("id"), lit(100L), lit(100L))).count() == 4000)
    val kept = ids.filter(GraftFunctions.weightedKeep(col("id"), lit(25L), lit(100L))).count()
    assert(kept > 800 && kept < 1200, s"~25% expected, got $kept/4000")
    // deterministic: same draw on a rerun
    val again = ids.filter(GraftFunctions.weightedKeep(col("id"), lit(25L), lit(100L))).count()
    assert(kept == again)
  }
}
