package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Retrieval

/** B275 proximity ranking: full JVM replay of the min-gap statistic
  * (the naive quadratic spelling) against the engine's sorted-merge
  * window, plus the merge identity on adversarial position lists. */
class ProximitySpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  test("the per-query top-K replays in the JVM from the naive quadratic" +
    " min-gap — the engine's one-pass merge window agrees") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val expected = Retrieval.ProximityPairs.flatMap { case (q, a, b) =>
      docs.flatMap { case (id, words) =>
        val pa = words.zipWithIndex.collect { case (w, i) if w == a => i + 1 }
        val pb = words.zipWithIndex.collect { case (w, i) if w == b => i + 1 }
        if (pa.isEmpty || pb.isEmpty) None
        else Some((q, id,
          (for (x <- pa; y <- pb) yield math.abs(x - y)).min.toLong))
      }.sortBy { case (_, id, gap) => (gap, id) }
        .take(Retrieval.ProxK.toInt).zipWithIndex
        .map { case ((qq, id, gap), i) =>
          (qq, (i + 1).toLong, id, gap, 10000L / (1 + gap))
        }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("b275_proximity_rank")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    // the statistic must be non-trivial: adjacency (gap 1) and spread
    // gaps must both occur, else the boost is a constant
    assert(got.map(_._4).distinct.length > 1, "all gaps equal — vacuous")
  }

  test("B278: the index-served ranking equals the scan ranking" +
    " row-for-row — write → prune → packed decode → merge loses nothing") {
    val scan = SparkEntry.queries("b275_proximity_rank")(spark, sf)
      .collect().map(_.toString).toSeq
    val served = SparkEntry.queries("b278_proximity_from_index")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(served === scan)
  }

  test("merge identity: the closest cross-list pair is adjacent in the" +
    " merged order (adversarial interleavings)") {
    // deterministic adversarial cases: nested, interleaved, disjoint,
    // duplicate-heavy
    val cases = Seq(
      (Seq(1, 100), Seq(50)),
      (Seq(1, 3, 5, 7), Seq(2, 4, 6, 8)),
      (Seq(1, 2, 3), Seq(90, 91)),
      (Seq(10, 20, 30), Seq(19, 21)),
      (Seq(5), Seq(4, 6)),
      (Seq(2, 40, 41, 80), Seq(42, 79)))
    for ((pa, pb) <- cases) {
      val naive = (for (x <- pa; y <- pb) yield math.abs(x - y)).min
      val merged = (pa.map(_ -> 0) ++ pb.map(_ -> 1)).sortBy(_._1)
      val viaMerge = merged.zip(merged.tail)
        .collect { case ((p1, s1), (p2, s2)) if s1 != s2 => p2 - p1 }
        .min
      assert(viaMerge === naive, s"lists $pa / $pb")
    }
  }
}
