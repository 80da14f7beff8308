package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** B110 contracts: a plain-JVM replay of the ENTIRE hybrid pipeline —
  * cosine tower (rounded-4dp rank keys), Jaccard tower (exact-integer
  * ratio, no rounding), RRF fusion and final ranking — compared
  * row-for-row against the Spark output, plus the rounding-boundary
  * margin measurement the semantic tower's determinism leans on
  * (Hybrid.scala's scaladoc; the b95/b107 pattern).
  */
class HybridSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private val NProbes = 10
  private val K = 50

  // ---- plain-JVM replay ---------------------------------------------------

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private lazy val tokenSets: Map[Long, Set[String]] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSet).toMap

  /** Left-to-right dot, mirroring dot_f64 / list_dot_product. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def round(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Raw cosines for every (probe, neighbor) pair — kept un-rounded for
    * the margin measurement; ranked on the rounded value. */
  private lazy val rawCos: Seq[(Long, Long, Double)] = {
    val norm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    for {
      p <- vecs.keys.toSeq.filter(_ < NProbes)
      c <- vecs.keys.toSeq if c != p
    } yield (p, c, dot(vecs(p), vecs(c)) / (norm(p) * norm(c)))
  }

  private def rankTower(scored: Seq[(Long, Long, Double)]): Map[(Long, Long), Int] =
    scored.groupBy(_._1).toSeq.flatMap { case (p, rows) =>
      rows.map { case (_, n, s) => (n, s) }
        .sortBy { case (n, s) => (-s, n) }
        .take(K).zipWithIndex
        .map { case ((n, _), i) => (p, n) -> (i + 1) }
    }.toMap

  private lazy val semRank: Map[(Long, Long), Int] =
    rankTower(rawCos.map { case (p, n, c) => (p, n, round(c, 4)) })

  private lazy val lexRank: Map[(Long, Long), Int] = {
    val pairs = for {
      p <- tokenSets.keys.toSeq.filter(_ < NProbes)
      n <- tokenSets.keys.toSeq if n != p
      i = (tokenSets(p) & tokenSets(n)).size if i > 0
    } yield (p, n,
      i.toDouble / (tokenSets(p).size + tokenSets(n).size - i))
    rankTower(pairs)
  }

  private lazy val jvmTop10: Seq[(Long, Int, Long, Double)] =
    (semRank.keySet ++ lexRank.keySet).toSeq
      .map { case (p, n) =>
        val s = semRank.get((p, n)).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          lexRank.get((p, n)).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (p, n, s)
      }
      .groupBy(_._1).toSeq.flatMap { case (p, rows) =>
        rows.map { case (_, n, s) => (n, s) }
          .sortBy { case (n, s) => (-s, n) }
          .take(10).zipWithIndex
          .map { case ((n, s), i) => (p, i + 1, n, round(s, 6)) }
      }.sortBy(t => (t._1, t._2))

  test("B110: Spark hybrid RRF top-10 ≡ plain-JVM replay, row for row") {
    val got = SparkEntry.queries("b110_hybrid_rrf")(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got == jvmTop10,
      s"spark=${got.take(5)}... jvm=${jvmTop10.take(5)}...")
  }

  test("B110: every cosine sits ≥ 1e-10 from its 4dp rounding boundary") {
    // the semantic tower ranks on round(cos, 4); engine-identity of those
    // keys needs every raw cosine far from a half-up boundary relative to
    // cross-engine drift (~1e-15 here: same-order dot, one division).
    // Round-9 DuckDB sweep: min margin 3.7e-9 (sf0.001), 3.6e-9 (sf0.01),
    // 1.0e-9 (sf0.1).
    val minMargin = rawCos.map { case (_, _, c) =>
      val scaled = c * 1e4
      math.abs(scaled - math.floor(scaled) - 0.5)
    }.min / 1e4
    assert(minMargin >= 1e-10,
      f"a cosine sits $minMargin%.3e from its 4dp boundary — drift could " +
        "flip a semantic rank; change NProbes/K or widen the rounding")
  }

  test("B110: fusion covers both towers (doc in exactly one tower ranked)") {
    // non-vacuity: the fused key set must contain keys unique to each
    // tower, otherwise the coalesce(…, 0) path never executes
    val onlySem = semRank.keySet -- lexRank.keySet
    val onlyLex = lexRank.keySet -- semRank.keySet
    assert(onlySem.nonEmpty, "every semantic key is also lexical — the " +
      "sem-only RRF path is untested on this corpus")
    assert(onlyLex.nonEmpty, "every lexical key is also semantic — the " +
      "lex-only RRF path is untested on this corpus")
  }
}
