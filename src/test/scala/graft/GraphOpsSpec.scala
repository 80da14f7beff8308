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

  test("B119: the entry replays an independent sequential JVM PageRank " +
    "fold exactly (closing the generated-oracle blind spot)") {
    val spark = TestSession.spark
    val li = graft.sources.Tables.lineitem(spark, TestSession.sf0001)
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (for {
      (_, ps) <- li.groupBy(_._1).toSeq
      parts = ps.map(_._2).toSeq
      a <- parts; b <- parts if a != b
    } yield (a, b)).distinct
    val Scale = 1000000000000L
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = outdeg.size.toLong
    val base = 15L * (Scale / n) / 100L
    var rank = outdeg.keys.map(_ -> Scale / n).toMap
    for (_ <- 1 to 6) {
      val inflow = edges.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => rank(s) / outdeg(s) }.sum).toMap
      rank = inflow.map { case (node, in) => node -> (base + 85L * in / 100L) }
    }
    val got = SparkEntry.queries("b119_pagerank_copurchase")(
        spark, TestSession.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == rank)
  }

  // ---- B144 triangle counting -------------------------------------------

  private def triRun(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val spark = TestSession.spark
    import spark.implicits._
    graft.operators.GraphOps.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("B144: K4 has four triangles (three per node); a path has none; a " +
    "planted hub-heavy graph matches the brute-force JVM count") {
    // K4 on nodes 0..3: edges with src < dst
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(triRun(k4) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // a path 0-1-2-3-4: no triangles → empty result
    assert(triRun(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // random-ish deterministic graph incl. a hub: brute-force replay
    val edges = (for (i <- 1L to 30L) yield (0L, i)) ++ // hub 0
      (for (i <- 1L to 29L if i % 3 != 0) yield (i, i + 1)) ++
      Seq((5L, 11L), (7L, 19L), (2L, 28L))
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val eset = es.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val brute = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      k <- (j + 1) until nodes.length
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if eset((a, b)) && eset((b, c)) && eset((a, c))
    } { brute(a) += 1; brute(b) += 1; brute(c) += 1 }
    assert(triRun(es) === brute.toMap)
  }

  test("B144: degree-ordered orientation caps wedge fanout below the " +
    "unoriented spelling on the hub graph") {
    val spark = TestSession.spark
    import spark.implicits._
    // star hub 0 with 40 spokes + a few spoke-spoke edges: unoriented
    // wedges at the hub are C(40,2) = 780; oriented, the hub (highest
    // degree) enumerates none
    val edges = ((for (i <- 1L to 40L) yield (0L, i)) ++
      Seq((1L, 2L), (2L, 3L), (3L, 4L))).toDF("src", "dst")
    val deg = edges.select(col("src").as("n"))
      .unionByName(edges.select(col("dst").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unorientedWedges = deg.values.map(d => d * (d - 1) / 2).sum
    // oriented out-degree: edges point toward the higher-(deg, id) end
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    es.foreach { case (u, v) =>
      val uk = (deg(u), u); val vk = (deg(v), v)
      if (implicitly[Ordering[(Long, Long)]].lt(uk, vk)) out(u) += 1
      else out(v) += 1
    }
    val orientedWedges = out.values.map(d => d * (d - 1) / 2).sum
    assert(orientedWedges * 5 < unorientedWedges,
      s"orientation must collapse the hub's wedge fanout " +
        s"($orientedWedges vs $unorientedWedges)")
    assert(out(0L) == 0L, "the max-degree hub must enumerate no wedges")
  }

  // ---- B147 clustering coefficient --------------------------------------

  test("B147: K4 corners are fully clustered (10000 bp); path interiors " +
    "report 0; deg-1 nodes drop") {
    val spark = TestSession.spark
    import spark.implicits._
    def coeff(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
      val e = edges.toDF("src", "dst").localCheckpoint(true)
      val deg = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      deg.join(graft.operators.GraphOps.triangleCounts(e), Seq("node"), "left")
        .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
        .filter(col("deg") >= 2)
        .withColumn("coeff_bp", expr(
          "CAST(2 * n_triangles * 10000 div (deg * (deg - 1)) AS BIGINT)"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    }
    val k4 = coeff(for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j))
    assert(k4.values.forall { case (d, t, c) => d == 3 && t == 3 && c == 10000 })
    val path = coeff(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(path.keySet == Set(1L, 2L), "deg-1 endpoints must drop")
    assert(path.values.forall(_._3 == 0L))
  }

  // ---- B148 incremental triangle delta ----------------------------------

  test("B148: last-completing-edge attribution counts each triangle at " +
    "exactly one batch, across splits and same-batch ties") {
    val spark = TestSession.spark
    import spark.implicits._
    def delta(old: Seq[(Long, Long)], batch: Seq[(Long, Long)]): Map[Long, Long] = {
      val oldDf = old.toDF("src", "dst")
      val bDf = batch.toDF("src", "dst")
      graft.operators.GraphOps.triangleDelta(oldDf, bDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val k3 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    // whole triangle in one batch → counted once, all three corners
    assert(delta(Nil, k3) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // completion edge arrives later → counted only at completion
    assert(delta(Nil, k3.take(2)).isEmpty)
    assert(delta(k3.take(2), k3.drop(2)) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // two edges complete in the SAME batch → attributed to the max key,
    // counted exactly once
    assert(delta(k3.take(1), k3.drop(1)) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // replaying the fold over any chunking of K4 sums to the batch counts
    val k4 = (for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)).toSeq
    for (cut <- 1 until k4.length) {
      val (b1, b2) = k4.splitAt(cut)
      val total = (delta(Nil, b1).toSeq ++ delta(b1, b2).toSeq)
        .groupMapReduce(_._1)(_._2)(_ + _)
      assert(total === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
        s"cut at $cut diverged: $total")
    }
  }

  // ---- B149 k-core peel -------------------------------------------------

  test("B149: peel trajectory matches a sequential JVM peel on planted " +
    "graphs (full core, full cascade, staged cascade)") {
    val spark = TestSession.spark
    import spark.implicits._
    def jvmPeel(edges: Seq[(Long, Long)], k: Long): Map[Long, Int] = {
      val adj = collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
      edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
      var alive = adj.keySet.toSet
      val out = collection.mutable.Map.empty[Long, Int]
      var r = 0
      var changed = true
      while (changed) {
        r += 1
        val drop = alive.filter(n => (adj(n) & alive).size < k)
        changed = drop.nonEmpty
        if (changed) { drop.foreach(out(_) = r); alive --= drop }
      }
      alive.foreach(out(_) = 0)
      out.toMap
    }
    def sparkPeel(edges: Seq[(Long, Long)], k: Long): Map[Long, Int] =
      graft.operators.GraphOps.kCorePeel(edges.toDF("src", "dst"), k)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // K5 at k = 4: everyone is core
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(sparkPeel(k5, 4) === jvmPeel(k5, 4))
    assert(sparkPeel(k5, 4).values.forall(_ == 0))
    // path at k = 2: endpoints fall first, cascade eats inward round by
    // round — the trajectory IS the interesting output
    val path = (0L until 9L).map(i => (i, i + 1))
    val p = sparkPeel(path, 2)
    assert(p === jvmPeel(path, 2))
    assert(p(0L) == 1 && p(9L) == 1 && p(4L) == 5 && p.values.forall(_ > 0))
    // K4 with pendant vertices: pendants drop round 1, core survives
    val pend = (for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)) ++
      Seq((0L, 10L), (1L, 11L))
    val q = sparkPeel(pend, 3)
    assert(q === jvmPeel(pend, 3))
    assert(q(10L) == 1 && q(11L) == 1 &&
      (0L to 3L).forall(n => q(n) == 0))
  }

  test("B148 entry: same-JVM re-run is idempotent — the delta sink is " +
    "cleared per invocation") {
    val spark = TestSession.spark
    def run() = SparkEntry.queries("b148_stream_triangles")(
      spark, TestSession.sf0001).collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  test("B149: a cascade of depth exactly maxRounds converges — the " +
    "confirming empty round is free") {
    val spark = TestSession.spark
    import spark.implicits._
    // path of 10 nodes at k=2 peels in exactly 5 dropping rounds
    val path = (0L until 9L).map(i => (i, i + 1))
    val r = graft.operators.GraphOps.kCorePeel(path.toDF("src", "dst"), 2,
        maxRounds = 5)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r.values.max == 5 && r.values.forall(_ > 0))
  }

  test("B149: a cascade deeper than maxRounds throws, never ships a " +
    "wrong core") {
    val spark = TestSession.spark
    import spark.implicits._
    val path = (0L until 9L).map(i => (i, i + 1))
    assertThrows[IllegalStateException](
      graft.operators.GraphOps.kCorePeel(path.toDF("src", "dst"), 2,
        maxRounds = 2).collect())
  }

  // ---- B150 HITS --------------------------------------------------------

  test("B150: on the gate graph the max hub and max authority hit exactly " +
    "Scale, all scores positive, and symmetric nodes tie") {
    val spark = TestSession.spark
    val rows = SparkEntry.queries("b150_graph_hits")(spark, TestSession.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val custs = rows.filter(_._1 == "cust").map(_._3)
    val parts = rows.filter(_._1 == "part").map(_._3)
    assert(custs.nonEmpty && parts.nonEmpty)
    assert(custs.max == 1000000L && parts.max == 1000000L,
      "L-infinity normalization must pin the top score to Scale")
    assert(custs.forall(_ > 0) && parts.forall(_ > 0))
    // determinism: rerun is bit-identical
    val again = SparkEntry.queries("b150_graph_hits")(spark, TestSession.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("B150: the entry replays an independent sequential JVM HITS fold " +
    "exactly (closing the generated-oracle blind spot)") {
    val spark = TestSession.spark
    val edges = graft.sources.Tables.orders(spark, TestSession.sf0001)
      .select("o_orderkey", "o_custkey")
      .join(graft.sources.Tables.lineitem(spark, TestSession.sf0001)
        .select("l_orderkey", "l_partkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val S = 1000000L
    var h = edges.map(_._1).distinct.map(_ -> S).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 6) {
      val araw = edges.groupBy(_._2).view
        .mapValues(_.map(e => h(e._1)).sum).toMap
      val am = araw.values.max
      a = araw.view.mapValues(v => v * S / am).toMap
      val hraw = edges.groupBy(_._1).view
        .mapValues(_.map(e => a(e._2)).sum).toMap
      val hm = hraw.values.max
      h = hraw.view.mapValues(v => v * S / hm).toMap
    }
    val got = SparkEntry.queries("b150_graph_hits")(spark, TestSession.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected =
      h.map { case (c, v) => ("cust", c) -> v } ++
        a.map { case (p, v) => ("part", p) -> v }
    assert(got == expected)
  }

  test("B144 plan: no cartesian product anywhere in the triangle plan") {
    val spark = TestSession.spark
    import spark.implicits._
    val edges = (for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j))
      .toDF("src", "dst")
    val plan = graft.operators.GraphOps.triangleCounts(edges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(30).mkString("\n"))
  }

  test("B157: two planted cliques converge to their min-id labels; replay matches a JVM fold") {
    import spark.implicits._
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L, 14L)))
      .toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) === 1L),
      s"first clique did not converge to 1: $got")
    assert(Seq(11L, 12L, 13L, 14L).forall(got(_) === 11L),
      s"second clique did not converge to 11: $got")

    // independent sequential JVM replay of the synchronous min-tie rule,
    // on a randomized symmetric graph (the b119/b150 pinning discipline)
    val rnd = new Random(157)
    val rndPairs = (1 to 60).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }.distinct
    val sym = (rndPairs ++ rndPairs.map(_.swap)).distinct
    val symDf = sym.toDF("src", "dst")
    var labels = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      val next = sym.groupBy(_._2).map { case (node, es) =>
        val cnt = es.groupBy(e => labels(e._1)).view.mapValues(_.size)
        node -> cnt.toSeq.minBy { case (lbl, c) => (-c, lbl) }._1
      }
      labels = next.toMap
    }
    val gotRnd = GraphOps.labelPropagation(symDf, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotRnd === labels)
  }

  test("B157 distinctSymmetric fast first round (array_min) equals the " +
    "generic vote round on a randomized symmetric graph") {
    import spark.implicits._
    val rnd = new Random(207)
    val rndPairs = (1 to 80).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.distinct
    val sym = (rndPairs ++ rndPairs.map(_.swap)).distinct
    val adj = sym.toDF("src", "dst")
      .groupBy(col("src").as("node"))
      .agg(collect_list(col("dst")).as("nbrs"))
    for (rounds <- Seq(1, 3)) {
      val fast = GraphOps.labelPropagationAdj(adj, rounds, distinctSymmetric = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val slow = GraphOps.labelPropagationAdj(adj, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast === slow, s"fast/generic divergence at rounds=$rounds")
    }
  }

  test("B157/B119 grouped-adjacency wrappers preserve duplicate-edge " +
    "multiplicity (collect_list, not set: a planted dup edge votes twice)") {
    import spark.implicits._
    // node 3's in-neighborhood: labels {1, 1, 2} only if the duplicated
    // (1→3) edge keeps both votes — a set spelling would tie 1 vs 2 and
    // still pick 1, so make the dup DECISIVE: {1, 1, 2, 2} vs {1, 2, 2}
    val edges = Seq((1L, 3L), (1L, 3L), (2L, 3L), (10L, 3L),
      (3L, 1L), (3L, 2L), (3L, 10L), (10L, 1L), (1L, 10L))
      .toDF("src", "dst")
    // round 1 at node 3: votes 1×2 (dup), 2×1, 10×1 → label 1; a
    // deduped adjacency would see 1×1, 2×1, 10×1 and still pick 1 by
    // tie — so ALSO pin pageRank, where the dup changes the SUM: node 3
    // receives share(1) twice
    val lpa = GraphOps.labelPropagation(edges, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa(3L) === 1L)
    // sequential replay of one inflow round with multiplicity
    val pr = GraphOps.pageRank(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val outdeg = Map(1L -> 3L, 2L -> 1L, 3L -> 3L, 10L -> 2L)
    var rank = outdeg.keys.map(n => n -> GraphOps.PrScale / 4L).toMap
    val base = (15L * (GraphOps.PrScale / 4L)) / 100L
    for (_ <- 1 to GraphOps.PrIters) {
      val inflow = Seq((1L, 3L), (1L, 3L), (2L, 3L), (10L, 3L), (3L, 1L),
        (3L, 2L), (3L, 10L), (10L, 1L), (1L, 10L))
        .groupBy(_._2).view.mapValues(
          _.map { case (s, _) => rank(s) / outdeg(s) }.sum).toMap
      rank = rank.keys.map(n =>
        n -> (base + (85L * inflow.getOrElse(n, 0L)) / 100L)).toMap
    }
    assert(pr === rank.filter(_._2 > 0))
  }

  test("B207: hop distances equal an unbounded JVM BFS (within 4 hops) and " +
    "every level-d node has a level-(d-1) neighbor") {
    val sf = TestSession.sf0001
    val got = SparkEntry.queries("b207_graph_bfs_hops")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = li.groupBy(_._1).values.toSeq.flatMap { os =>
      val ps = os.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // unbounded BFS from the seed set in JVM
    val seeds = adj.keySet.filter(_ % 97 == 0)
    assert(seeds.nonEmpty, "no seeds in graph — BFS vacuous")
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      val next = frontier.flatMap(adj(_)).diff(dist.keySet)
      next.foreach(n => dist += n -> d)
      frontier = next
    }
    assert(got === dist.filter(_._2 <= 4))
    assert(got.values.toSet.size >= 2, "single-level BFS — vacuous")
    got.filter(_._2 > 0).foreach { case (n, dd) =>
      assert(adj(n).exists(m => got.get(m).contains(dd - 1)),
        s"node $n at level $dd has no level-${dd - 1} neighbor")
    }
  }

  test("B231: personalized PageRank equals a sequential JVM integer fold, " +
    "and every seed keeps the restart floor") {
    val sf = TestSession.sf0001
    val got = SparkEntry.queries("b231_personalized_pagerank")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sym = li.groupBy(_._1).values.toSeq.flatMap { os =>
      val ps = os.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.distinct
    val nodes = sym.map(_._1).distinct
    val outdeg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = nodes.filter(_ % 97 == 0).toSet
    val scale = 1000000000000L
    val base = nodes.map(n =>
      n -> (if (seeds(n)) scale / seeds.size else 0L)).toMap
    var rank = base
    for (_ <- 1 to 6) {
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      nodes.foreach { n =>
        val r = rank(n)
        if (r > 0) {
          val share = r / outdeg(n)
          adj(n).foreach(m => inflow(m) += share)
        }
      }
      rank = nodes.map(n =>
        n -> ((15 * base(n)) / 100 + (85 * inflow(n)) / 100)).toMap
    }
    assert(got === rank.filter(_._2 > 0))
    val floor = (15L * (scale / seeds.size)) / 100
    seeds.foreach(sd => assert(got(sd) >= floor, s"seed $sd below restart floor"))
    assert(got.keySet.exists(n => !seeds(n)), "no mass left the seed set")
  }

  test("Pack32 domain guard: ids ≥ 2³² take the struct/two-column " +
    "fallbacks and LPA (pull + push) and triangles equal the packed " +
    "small-id run shifted (r20 VERDICT item 1)") {
    import spark.implicits._
    val rnd = new Random(321)
    val pairs = (1 to 80)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.distinct
    val sym = (pairs ++ pairs.map(_.swap)).distinct
    val Big = 1L << 33 // every id and label leaves the packed domain
    def adjOf(es: Seq[(Long, Long)]) = es.toDF("src", "dst")
      .groupBy(col("src").as("node"))
      .agg(collect_list(col("dst")).as("nbrs"))
    // labels are node ids, and the (count DESC, label ASC) order is
    // shift-equivariant, so result(G + Big) must be result(G) + Big —
    // a wrongly-taken packed path would corrupt the recovered labels
    val small = GraphOps.labelPropagationAdj(adjOf(sym), 3,
        distinctSymmetric = true).collect()
      .map(r => (r.getLong(0) + Big) -> (r.getLong(1) + Big)).toMap
    val symBig = sym.map { case (a, b) => (a + Big, b + Big) }
    val bigPull = GraphOps.labelPropagationAdj(adjOf(symBig), 3,
        distinctSymmetric = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bigPush = GraphOps.labelPropagationAdj(adjOf(symBig), 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bigPull === small, "pull/struct fallback diverged under shift")
    assert(bigPush === small, "push/struct fallback diverged under shift")
    // triangle closing probe: orientation and the triangle set are
    // shift-equivariant (degrees unchanged, id order preserved), so the
    // two-column fallback probe must reproduce the packed counts
    val canon = sym.filter { case (a, b) => a < b }
    def tri(es: Seq[(Long, Long)]) =
      GraphOps.triangleCounts(es.toDF("src", "dst")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tSmall = tri(canon).map { case (n, c) => (n + Big) -> c }
    val tBig = tri(canon.map { case (a, b) => (a + Big, b + Big) })
    assert(tBig === tSmall, "closing-probe fallback diverged under shift")
  }

  test("AdjChunk degree cap: a planted hub (deg ≫ cap) chunks the " +
    "adjacency, and LPA pull ≡ push ≡ JVM replay, PageRank pull ≡ push " +
    "(r20 VERDICT item 2)") {
    import spark.implicits._
    val n = GraphOps.AdjChunk + 1200L // hub degree binds the cap
    val spokes = 1L to n
    val sym = (spokes.flatMap(i => Seq((0L, i), (i, 0L)))
      ++ Seq((1L, 2L), (2L, 1L))).distinct
    val edf = sym.toDF("src", "dst")
    val adj = edf.groupBy(col("src").as("node"))
      .agg(collect_list(col("dst")).as("nbrs"))
    assert(GraphOps.chunkAdj(adj).filter(col("ci") > 0).count() > 0,
      "hub row did not chunk — the cap is not binding")
    // LPA: 3 rounds, pull vs push vs a sequential JVM fold of the
    // synchronous min-tie rule (votes/argmax must merge across chunks)
    var labels = sym.map(_._1).distinct.map(x => x -> x).toMap
    for (_ <- 1 to 3) {
      labels = sym.groupBy(_._2).map { case (node, es) =>
        val cnt = es.groupBy(e => labels(e._1)).view.mapValues(_.size)
        node -> cnt.toSeq.minBy { case (lbl, c) => (-c, lbl) }._1
      }
    }
    val pull = GraphOps.labelPropagationAdj(adj, 3, distinctSymmetric = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val push = GraphOps.labelPropagationAdj(adj, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pull === labels, "chunked pull LPA diverged from the JVM fold")
    assert(push === labels, "chunked push LPA diverged from the JVM fold")
    // PageRank: the share denominator must be the FULL degree (od), not
    // a chunk width — pull and push must agree exactly
    val prPull = GraphOps.pageRankAdj(adj, symmetric = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prPush = GraphOps.pageRank(edf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prPull === prPush, "chunked PR pull/push divergence")
  }
}
