package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps
import scala.util.Random

class GraphOpsSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  import spark.implicits._

  /** Union-find reference (driver-side, test-only). */
  private def ufComponents(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], maxRounds: Int = 40) = {
    val nodesDf = nodes.toDF("n")
    val edgesDf = edges.toDF("a", "b")
    GraphOps.connectedComponents(edgesDf, nodesDf, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches union-find on randomized graphs") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(70)
      val nodes = (0L until n).toSeq
      val edges = Seq.fill(rnd.nextInt(2 * n))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val expected = ufComponents(nodes, edges)
      assert(run(nodes, edges) === expected, s"trial $trial (n=$n, |E|=${edges.size})")
    }
  }

  test("isolated nodes are singleton components") {
    assert(run(Seq(1L, 2L, 3L), Seq((2L, 3L))) === Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("self-loops and duplicate edges are harmless") {
    assert(run(Seq(1L, 2L), Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L))) ===
      Map(1L -> 1L, 2L -> 1L))
  }

  test("a 256-node chain converges in O(log n) rounds, not O(n)") {
    // pointer jumping is the point: plain propagation needs 255 rounds
    // here; with path doubling the label-distance grows geometrically, so
    // 16 rounds must suffice (log2(256)=8, with slack for warmup+detect)
    val nodes = (0L until 256L).toSeq
    val edges = nodes.init.map(i => (i, i + 1))
    val got = run(nodes, edges, maxRounds = 16)
    assert(got === nodes.map(_ -> 0L).toMap)
  }

  test("empty node set returns an empty result, not an error") {
    assert(run(Seq.empty[Long], Seq.empty[(Long, Long)]) === Map.empty)
  }

  test("ids near Long.MaxValue resolve exactly (changed-count, not label-sum, convergence)") {
    // a label-sum convergence metric overflows here; the changed-row count
    // must stay exact for hashed 64-bit ids
    val big = Long.MaxValue
    val nodes = Seq(big, big - 1, big - 2, 5L)
    val edges = Seq((big, big - 1), (big - 1, big - 2))
    assert(run(nodes, edges) ===
      Map(big -> (big - 2), (big - 1) -> (big - 2), (big - 2) -> (big - 2), 5L -> 5L))
  }

  test("non-convergence inside the round budget throws, never returns wrong labels") {
    val nodes = (0L until 64L).toSeq
    val edges = nodes.init.map(i => (i, i + 1))
    assertThrows[IllegalStateException](run(nodes, edges, maxRounds = 2))
  }

  // ---- B119 fixed-point PageRank ----------------------------------------

  test("B119: on a planted star the hub outranks every spoke; ranks positive") {
    val spark = TestSession.spark
    import spark.implicits._
    // hub 0 ↔ spokes 1..20, symmetric (the b119 graph-shape contract)
    val e0 = (1L to 20L).map(i => (0L, i))
    val edges = (e0 ++ e0.map(_.swap)).toDF("src", "dst")
    val ranks = graft.operators.GraphOps.pageRank(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.keySet === (0L to 20L).toSet)
    assert(ranks.values.forall(_ > 0L), "a rank went non-positive")
    val hub = ranks(0L)
    assert((1L to 20L).forall(i => hub > ranks(i)),
      s"hub $hub does not dominate spokes ${ranks.filterNot(_._1 == 0L).values.max}")
    // symmetric spokes are exactly interchangeable → identical ranks
    assert((1L to 20L).map(ranks).toSet.size === 1,
      "identical spokes received different ranks — iteration is not order-independent")
  }
}
