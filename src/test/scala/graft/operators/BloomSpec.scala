package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val members = (1L to 100L).map(_ * 7).toDF("k")

  test("no false negatives: every member passes, at any sizing") {
    for ((k, m) <- Seq((1, 64), (2, 256), (3, 8192))) {
      val bits = Bloom.build(members, "k", k, m)
      val verdict = Bloom.mightContain(members, "k", bits, k, m)
        .as[(Long, Boolean)].collect()
      assert(verdict.length == 100)
      assert(verdict.forall(_._2), s"false negative at k=$k m=$m")
    }
  }

  test("non-members mostly fail at a sane sizing; a tiny bitmap saturates") {
    val probes = (1L to 1000L).filter(_ % 7 != 0).toDF("k")
    val roomy = Bloom.mightContain(probes, "k",
      Bloom.build(members, "k", 2, 2048), 2, 2048)
      .filter(col("might_contain")).count()
    assert(roomy < 100, s"fp count $roomy out of ${probes.count()} is not selective")
    // m=32 bits for 100 keys: essentially every bit set → everything passes
    val saturated = Bloom.mightContain(probes, "k",
      Bloom.build(members, "k", 2, 32), 2, 32)
      .filter(col("might_contain")).count()
    assert(saturated > 800, "a saturated filter should pass nearly everything")
  }

  test("filters merge by union: bits(a ∪ b) == bits(a) ∪ bits(b)") {
    val a = members.filter(col("k") <= 350)
    val b = members.filter(col("k") > 350)
    val merged = Bloom.build(a, "k", 2, 512)
      .unionAll(Bloom.build(b, "k", 2, 512)).distinct()
    val whole = Bloom.build(members, "k", 2, 512)
    assert(merged.unionAll(whole).distinct().count() == whole.count())
  }

  test("null probe keys are dropped, not passed") {
    val bits = Bloom.build(members, "k", 2, 512)
    val verdict = Bloom.mightContain(
      Seq[Option[Long]](Some(7L), None).toDF("k"), "k", bits, 2, 512)
    assert(verdict.count() == 1)
  }
}
