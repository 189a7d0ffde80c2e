package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: brute-force triangle enumeration over the canonical edge set. */
  private def bruteNodeCounts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if es((a, b)) && es((b, c)) && es((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  test("triangleCounts matches brute force on random graphs") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 12 + trial * 3
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
      } yield (a, b)) ++ Seq((3L, 3L)) // self-loop must be dropped
      val got = Graph.triangleCounts(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == bruteNodeCounts(edges), s"trial $trial")
    }
  }

  test("triangleCounts shuffle-join fallback: same counts, plan-gated SMJ probes") {
    val rnd = new Random(7)
    val n = 20
    val edges = (for {
      a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
    } yield (a, b))
    // broadcastMaxBytes = 0 forces the over-threshold path: the two
    // adjacency probes must become shuffle joins, and the counts must not
    // change (same plan SHAPE, different exchange strategy). The returned
    // frame is checkpoint-staged (joins invisible in ITS plan), so the gate
    // reads the SQL status store, which records every staged execution.
    val store = spark.sharedState.statusStore
    // compare by executionId, NOT by list position: the status store
    // retains only the newest N executions, so in a long suite
    // executionsList() is shorter than executionsCount() and a positional
    // drop() discards the very executions this gate is looking for
    val before = store.executionsList().lastOption.map(_.executionId).getOrElse(-1L)
    val df = Graph.triangleCounts(edges.toDF("a", "b"), broadcastMaxBytes = 0L)
    val got = df.as[(Long, Long)].collect().toMap
    assert(got == bruteNodeCounts(edges), "fallback path must agree with brute force")
    def sawSmj() = store.executionsList().filter(_.executionId > before)
      .exists(_.physicalPlanDescription.contains("SortMergeJoin"))
    val deadline = System.currentTimeMillis() + 10000 // status bus is async
    while (!sawSmj() && System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(sawSmj(), "adjacency probes must shuffle-join under the size gate")
  }

  test("triangleCounts: triangle-free graph returns no rows; duplicate and reversed input edges collapse") {
    // a path plus duplicates/reversals — no triangles anywhere
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 1L), (3L, 2L))
    assert(Graph.triangleCounts(edges.toDF("x", "y")).count() == 0)
    // one triangle listed twice in both orientations still counts once
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 1L), (2L, 1L))
    val got = Graph.triangleCounts(tri.toDF("x", "y")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: hub star plus one cross edge — orientation caps the hub's wedge work") {
    // star center 0 with 50 leaves, plus edge (1,2): exactly one triangle
    val edges = (1L to 50L).map(i => (0L, i)) :+ (1L, 2L)
    val got = Graph.triangleCounts(edges.toDF("a", "b")).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("pagerankInt: a regular graph is a fixed point — every score stays at scale") {
    // cycle of 12: deg = 2 everywhere; 17/20 damping returns exactly scale
    val cyc = (0L until 12L).map(i => (i, (i + 1) % 12))
    val got = Graph.pagerankInt(cyc.toDF("a", "b"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 12 && got.values.forall(_ == 1000000L))
  }

  test("pagerankInt: star center outranks leaves; scores are rerun-deterministic") {
    val star = (1L to 20L).map(i => (0L, i))
    val r1 = Graph.pagerankInt(star.toDF("a", "b")).as[(Long, Long)].collect().toMap
    val r2 = Graph.pagerankInt(star.toDF("a", "b")).as[(Long, Long)].collect().toMap
    assert(r1 == r2, "integer PR must be bit-deterministic")
    assert(r1(0L) > r1(1L), "hub must outrank a leaf")
    assert((1L to 20L).map(r1).toSet.size == 1, "symmetric leaves tie exactly")
  }

  test("pagerankIntConverged: regular graph certifies its fixed point in one step") {
    // cycle of 12: x0 = scale IS the fixed point, so the first iterate
    // equals x0 and the probe certifies convergence immediately
    val cyc = (0L until 12L).map(i => (i, (i + 1) % 12))
    val r = Graph.pagerankIntConverged(cyc.toDF("a", "b"), maxIters = 10)
    assert(r.converged && !r.cycled && r.iters == 1,
      s"expected certification on iteration 1, got $r")
    val got = r.scores.as[(Long, Long)].collect().toMap
    assert(got.size == 12 && got.values.forall(_ == 1000000L))
  }

  test("pagerankIntConverged: irregular graph settles under the cap, certified honestly") {
    // star + tail: mixed degrees, so scores genuinely move before settling
    val edges = ((1L to 20L).map(i => (0L, i)) ++ Seq((20L, 21L), (21L, 22L))).toDF("a", "b")
    val r = Graph.pagerankIntConverged(edges, maxIters = 60, dampNum = 1L, dampDen = 2L)
    assert(r.converged || r.cycled, s"neither pinned nor cycled within the cap: $r")
    val cur = r.scores.as[(Long, Long)].collect().toMap
    val prev = r.prevScores.as[(Long, Long)].collect().toMap
    if (r.converged) assert(cur == prev, "certified fixed point must equal its predecessor")
    else assert(cur != prev, "a 2-cycle's frames must differ")
    // the stop verdict is rerun-deterministic
    val again = Graph.pagerankIntConverged(edges, maxIters = 60, dampNum = 1L, dampDen = 2L)
    assert(cur == again.scores.as[(Long, Long)].collect().toMap
      && r.converged == again.converged && r.cycled == again.cycled)
  }

  test("reliable-checkpoint staging mode produces identical pagerank results") {
    val edges = ((1L to 20L).map(i => (0L, i)) ++ Seq((20L, 21L), (21L, 22L))).toDF("a", "b")
    val local = Graph.pagerankIntConverged(edges, maxIters = 60,
      dampNum = 1L, dampDen = 2L, reliableDir = None)
    val ckptDir = java.nio.file.Files.createTempDirectory("pr_ckpt_").toString
    val reliable = Graph.pagerankIntConverged(edges, maxIters = 60,
      dampNum = 1L, dampDen = 2L, reliableDir = Some(ckptDir))
    assert(reliable.scores.as[(Long, Long)].collect().toMap ==
      local.scores.as[(Long, Long)].collect().toMap)
    assert(reliable.converged == local.converged && reliable.iters == local.iters)
    // the reliable mode actually wrote durable iterates
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
    val nFiles = try wrote.filter(p => java.nio.file.Files.isRegularFile(p)).count()
    finally wrote.close()
    assert(nFiles > 0, "reliable mode must persist iterates to the checkpoint dir")
  }
}
