package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{IntKMeans, SemDedup, Winnowing}
import graft.sources.Tables

/** B102 exact integer Lloyd: plain-JVM two-round replay, the Lloyd
  * objective drop from the degenerate polyfold seeds, and exactness of
  * the offset floor-div centroid update on negative sums. */
class KMeansSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  private val K = 8

  private lazy val q: Array[(Long, Array[Long])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 127 + 0.5d).toLong).toArray))
      .sortBy(_._1)

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def assign(cents: Seq[(Long, Array[Long])]): Map[Long, Long] =
    q.map { case (id, v) =>
      id -> cents.map(c => ((d2(v, c._2), c._1), c._1)).minBy(_._1)._2
    }.toMap

  private def step(cents: Seq[(Long, Array[Long])]): Seq[(Long, Array[Long])] = {
    val cellOf = assign(cents)
    val byCell = q.groupBy(p => cellOf(p._1))
    cents.map { case (cid, cv) =>
      byCell.get(cid) match {
        case Some(members) =>
          val n = members.length.toLong
          val dims = cv.indices.map { j =>
            IntKMeans.centroidDim(members.map(_._2(j)).sum, n)
          }.toArray
          (cid, dims)
        case None => (cid, cv)
      }
    }
  }

  private def ss(cents: Seq[(Long, Array[Long])]): Long = {
    val cellOf = assign(cents)
    val cm = cents.toMap
    q.map { case (id, v) => d2(v, cm(cellOf(id))) }.sum
  }

  private lazy val seeds0: Seq[(Long, Array[Long])] = {
    val qm = q.toMap
    q.map(_._1).sortBy(id => (Winnowing.polyFoldString(s"sem:$id"), id))
      .take(K).map(id => (id, qm(id)))
  }

  test("B102 ≡ plain-JVM two-round Lloyd replay") {
    val refined = step(step(seeds0))
    val jvm = assign(refined)
    val rows = SparkEntry.queries("b102_kmeans_cells")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length === q.length)
    for ((id, cell) <- rows)
      assert(cell === jvm(id), s"vec $id: spark $cell vs jvm ${jvm(id)}")
  }

  test("B102: refinement strictly drops the Lloyd objective on this corpus") {
    val ss0 = ss(seeds0)
    val ss2 = ss(step(step(seeds0)))
    assert(ss2 < ss0, s"SS $ss0 -> $ss2 did not improve")
  }

  test("centroidDim is exact round-half-up even for negative sums") {
    assert(IntKMeans.centroidDim(-7L, 2L) === -3L) // -3.5 rounds half-UP to -3
    assert(IntKMeans.centroidDim(7L, 2L) === 4L)
    assert(IntKMeans.centroidDim(-8L, 3L) === -3L)
    assert(IntKMeans.centroidDim(0L, 5L) === 0L)
    assert(IntKMeans.centroidDim(-127L * 4, 4L) === -127L)
    assert(IntKMeans.centroidDim(127L * 4, 4L) === 127L)
  }
}
