package graft.dedup

import scala.util.Random

import graft.SparkSpec

/** Property test: distributed min-label CC equals a naive union-find on
  * random sparse graphs (incl. chains, which need >1 propagation round). */
class ConnectedComponentsSpec extends SparkSpec {

  private final class UnionFind(n: Int) {
    private val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    def union(a: Int, b: Int): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
  }

  test("connectedComponents == union-find over 10 random graphs") {
    import spark.implicits._
    val rng = new Random(77)
    for (round <- 1 to 10) {
      val n = 30 + rng.nextInt(40)
      val edges = Seq.fill(n / 2)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val uf = new UnionFind(n)
        edges.foreach { case (a, b) => uf.union(a.toInt, b.toInt) }
        val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        val expected = nodes.map(v => v -> uf.find(v.toInt).toLong).toMap

        val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        assert(got == expected, s"CC mismatch in round $round")
      }
    }
  }

  test("a long chain converges to a single component") {
    import spark.implicits._
    val chain = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Dedup.connectedComponents(chain.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L until 12L).toSet)
  }

  test("reliable-checkpoint staging mode produces identical components") {
    import spark.implicits._
    val rng = new Random(41)
    val edges = Seq.fill(60)((rng.nextInt(50).toLong, rng.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
    val local = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
      reliableDir = None).as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt_").toString
    val reliable = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
      reliableDir = Some(dir)).as[(Long, Long)].collect().toMap
    assert(reliable == local)
  }

  test("adversarial 300-node path converges in O(log n) rounds (pointer jumping)") {
    import spark.implicits._
    // a 300-edge path is the worst case for hop-only min-label propagation
    // (299 rounds); with per-round path halving the label reaches the far end
    // in ~log2(300) rounds. maxRounds = 12 would FAIL hop-only propagation —
    // this is the regression gate on the pointer-jump step.
    val n = 300L
    val path = (0L until n).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Dedup.connectedComponents(path.toDF("id_a", "id_b"), maxRounds = 12)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == (0L until n).toSet)
    assert(got.values.toSet == Set(0L), "every node must carry the path-min label")
  }
}
