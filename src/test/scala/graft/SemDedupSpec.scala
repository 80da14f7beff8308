package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{SemDedup, Winnowing}
import graft.sources.Tables

/** B99 semantic dedup: an independent plain-JVM replay of all five stages
  * (quantize → polyfold seeds → argmin assignment → integer-threshold
  * edges → union-find closure) plus the map-side-assignment plan shape. */
class SemDedupSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private lazy val vecs: Array[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

  /** The whole operator, re-derived with no Spark and no SQL. */
  private lazy val jvmManifest: Map[Long, (Long, Long)] = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x * SemDedup.QuantScale + 0.5d).toLong)
    }
    val qq = q.map { case (id, qv) => id -> qv.map(x => x * x).sum }.toMap
    val seedIds = q.map(_._1)
      .sortBy(id => (Winnowing.polyFoldString(s"sem:$id"), id)).take(8)
    val seedVec = q.toMap
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cell = q.map { case (id, qv) =>
      id -> seedIds.map(c => ((d2(qv, seedVec(c)), c), c)).minBy(_._1)._2
    }.toMap
    val parent = scala.collection.mutable.Map(q.map(p => p._1 -> p._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for {
      (ida, qa) <- q; (idb, qb) <- q
      if ida < idb && cell(ida) == cell(idb)
      dp = qa.zip(qb).map { case (x, y) => x * y }.sum
      if dp > 0 && SemDedup.TauDen * dp * dp >= SemDedup.TauNum * qq(ida) * qq(idb)
    } {
      val (ra, rb) = (find(ida), find(idb))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    q.map { case (id, _) => id -> (cell(id), find(id)) }.toMap
  }

  private lazy val sparkRows =
    SparkEntry.queries("b99_dedup_semantic")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

  test("B99 ≡ plain-JVM five-stage replay (cells, reps, kept flags)") {
    assert(sparkRows.length === vecs.length)
    for ((id, cell, rep, kept) <- sparkRows) {
      val (jCell, jRep) = jvmManifest(id)
      assert(cell === jCell, s"vec $id cell $cell != jvm $jCell")
      assert(rep === jRep, s"vec $id rep $rep != jvm $jRep")
      assert(kept === (id == jRep))
    }
  }

  test("B99: the dedup path observably fires and reps are self-kept minima") {
    val dropped = sparkRows.filter(!_._4)
    assert(dropped.nonEmpty, "no semantic duplicate dropped — τ miscalibrated")
    assert(dropped.length < sparkRows.length)
    val byId = sparkRows.map(r => r._1 -> r).toMap
    for ((id, _, rep, _) <- sparkRows) {
      assert(rep <= id, "representative must be the component's min vec_id")
      assert(byId(rep)._4, s"representative $rep of $id is itself dropped")
    }
  }

  test("B99: raising τ only shrinks the dropped set (dedup monotone in τ)") {
    // a doc dropped at high τ has an edge to a smaller id; lowering τ
    // only adds edges, so components only merge and reps only decrease —
    // dropped(τ₂) ⊆ dropped(τ₁) for τ₂ > τ₁
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val strict = SemDedup.semDedup(emb, tauNum = 2500L, tauDen = 10000L) // τ=0.50
      .filter(!org.apache.spark.sql.functions.col("kept"))
      .collect().map(_.getLong(0)).toSet
    val loose = sparkRows.filter(!_._4).map(_._1).toSet // τ=0.43 default
    assert(strict.subsetOf(loose),
      s"strict-τ dropped ${strict -- loose} that loose τ kept")
    assert(strict.size < loose.size, "τ change had no observable effect")
  }

  test("B99: cell assignment is map-side — zero exchanges below it") {
    val q = SemDedup.quantize(
      Tables.embeddings(spark, sf).select("vec_id", "embedding"))
    val seedRows = SemDedup.seeds(q, 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    val cells = SemDedup.assignCells(q, seedRows)
    val plan = cells.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"assignment shuffled: ${plan.treeString.take(500)}")
  }
}
