package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{QualityClassifier, Winnowing}
import graft.sources.Tables

/** B243 quality-classifier inference: a third, test-local spelling of the
  * frozen model (salted codepoint fold → bucket → scrambled weight → dot
  * → threshold) replayed in plain Scala against the native expression,
  * plus the gate's plan shape (zero shuffles before the threshold). */
class QualityClassifierSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  import spark.implicits._

  // independent replay — deliberately NOT QualityScoreExpression.score
  private def replayScore(text: String): Long = {
    def w(salt: String, tok: String): Long = {
      val b = Winnowing.polyFoldString(salt + tok) % 4096L
      (((b * 2654435761L) % 2147483648L) % 2001L) - 1000L
    }
    val toks = text.split(" ", -1).filter(_.nonEmpty)
    val uni = toks.map(w("qc:", _)).sum
    val big = toks.sliding(2).filter(_.length == 2)
      .map(p => w("qc2:", p(0) + " " + p(1))).sum
    uni + big
  }

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text")).collect()
    .map(r => (r.getLong(0), r.getString(1)))

  test("B243: gate output equals the JVM replay of hash->dot->threshold") {
    val got = SparkEntry.queries("b243_quality_classifier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = docs.map { case (id, t) => (id, replayScore(t)) }
      .filter(_._2 > 0).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("B243: the threshold is non-vacuous in both directions") {
    val scores = docs.map { case (_, t) => replayScore(t) }
    assert(scores.count(_ > 0) > 0, "classifier keeps nothing")
    assert(scores.count(_ <= 0) > 0, "classifier drops nothing")
  }

  test("B243: edge cases — empty, all-space, single-token, astral plane") {
    val cases = Seq("", "   ", "word", "a b", "e😀f g",
      "x  y   z", " lead", "trail ")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = QualityClassifier.scored(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (((t, i)) <- cases.zipWithIndex)
      assert(got(i.toLong) === replayScore(t), s"case '$t'")
    assert(got(0L) === 0L && got(1L) === 0L, "no tokens -> score 0")
  }

  // ---- B245: Gopher repetition signals ----------------------------------

  // independent replay with plain Scala collections
  private def replayStats(text: String): (Long, Long, Long, Long, Long) = {
    val t = text.split(" ", -1).filter(_.nonEmpty)
    val n = t.length
    def mx(k: Int): Long =
      if (n < k) 0L
      else t.sliding(k).map(_.mkString(" ")).toSeq
        .groupBy(identity).values.map(_.size.toLong).max
    val cov = if (n < 2) 0L else {
      val c = t.sliding(2).map(_.mkString(" ")).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val m = Array.fill(n)(false)
      for (i <- 0 until n - 1 if c(t(i) + " " + t(i + 1)) >= 2) {
        m(i) = true; m(i + 1) = true
      }
      m.count(identity).toLong
    }
    (n.toLong, mx(2), mx(3), mx(4), cov)
  }

  test("B245: report equals the JVM replay of all five statistics") {
    val got = SparkEntry.queries("b245_repetition_filter")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    for ((id, text) <- docs) {
      val (n, m2, m3, m4, cov) = replayStats(text)
      val t2 = if (n >= 2) m2 * 10000 / (n - 1) else 0L
      val t3 = if (n >= 3) m3 * 10000 / (n - 2) else 0L
      val t4 = if (n >= 4) m4 * 10000 / (n - 3) else 0L
      val dc = if (n >= 2) cov * 10000 / n else 0L
      val kept = if (t2 <= QualityClassifier.Top2MaxBp &&
        t3 <= QualityClassifier.Top3MaxBp &&
        dc <= QualityClassifier.Dup2CovMaxBp) 1L else 0L
      assert(got(id) === ((n, t2, t3, t4, dc, kept)), s"doc $id")
    }
    val keptVals = got.values.map(_._6).toSet
    assert(keptVals === Set(0L, 1L), "gate must bind in both directions")
  }

  test("B245: constructed repetition extremes behave per the Gopher rules") {
    val cases = Seq(
      (1L, ("a b " * 40).trim),           // one 2-gram dominates -> dropped
      (2L, (1 to 80).map("u" + _).mkString(" ")), // all-unique -> kept
      (3L, ""), (4L, "solo"), (5L, "two toks"))
    val df = cases.toDF("doc_id", "text")
    val got = QualityClassifier.repetitionReport(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got(1L)._3 === 0L, "degenerate repetition must drop")
    assert(got(1L)._1 > QualityClassifier.Top2MaxBp)
    assert(got(1L)._2 === 10000L, "every token of 'a b a b ...' is covered")
    assert(got(2L) === ((126L, 0L, 1L)),
      "all-unique doc: 1*10000 div 79 = 126 top share, kept")
    assert(got(3L) === ((0L, 0L, 1L)) && got(4L) === ((0L, 0L, 1L)),
      "sub-gram docs default to 0 fractions, kept")
    // a 2-token doc's single 2-gram is a 100% top share — the repetition
    // rule drops it by construction; length floors are a separate pass
    // (b45/b94), not this one's job
    assert(got(5L) === ((10000L, 0L, 0L)))
  }

  test("B245 plan: zero exchanges before the presentation sort") {
    val plan = QualityClassifier.repetitionReport(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"within-doc statistics must not shuffle:\n$plan")
    assert(plan.contains("repetition_stats"), plan)
  }

  test("B243 plan: zero exchanges before the gate; scoring is codegen") {
    val gated = QualityClassifier.scored(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .filter(col("score") > 0)
    val plan = gated.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the classifier gate must run at scan bandwidth:\n$plan")
    // the executedPlan string marks whole-stage-codegen stages with *(n);
    // both the Filter and the Project must sit inside one — but the stage
    // NUMBER is Spark's internal counter, not part of the property
    // (ADVICE r15): match any *(n), not the literal *(1)
    assert("""\*\(\d+\) Filter""".r.findFirstIn(plan).isDefined, plan)
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("quality_score"), plan)
  }
  // ---- B250: score calibration deciles ----------------------------------

  test("B250: deciles are ANSI-sized, score-ordered, mass-conserving, and " +
    "the plan has no SinglePartition despite the corpus-scale rank") {
    val rows = SparkEntry.queries("b250_score_calibration")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === (1L to 10L))
    val n = rows.map(_._2).sum
    val (big, small) = (n / 10 + (if (n % 10 > 0) 1 else 0), n / 10)
    assert(rows.forall(r => r._2 == big || r._2 == small), "ANSI sizing")
    // score ranges are disjoint and ordered across deciles
    for (w <- rows.sliding(2); if w.length == 2; a = w(0); b = w(1))
      assert(a._4 <= b._3, s"decile ${a._1} max > decile ${b._1} min")
    assert(n === docs.length.toLong)
    for (r <- rows) assert(r._6 === r._5 / r._2, "tok_mean law")
    val plan = graft.llm.QualityClassifier.calibrationDeciles(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1200))
  }

  test("B265: the kept-mass curve is monotone in the threshold, replays" +
    " from the JVM scorer, and its theta=0 row IS the b243 gate") {
    val rows = SparkEntry.queries("b265_classifier_threshold_sweep")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq ===
      graft.llm.QualityClassifier.SweepThresholds)
    for (w <- rows.sliding(2); if w.length == 2) {
      assert(w(0)._2 >= w(1)._2, "kept_docs not nonincreasing in theta")
      assert(w(0)._4 >= w(1)._4, "kept_tokens not nonincreasing in theta")
    }
    // JVM replay of the whole curve off the independent scorer
    val scored = docs.map { case (id, t) =>
      (replayScore(t), t.split(" ", -1).count(_.nonEmpty).toLong) }
    for ((th, kd, _, kt, _) <- rows) {
      val keep = scored.filter(_._1 > th)
      assert(kd === keep.length.toLong, s"theta=$th kept_docs")
      assert(kt === keep.map(_._2).sum, s"theta=$th kept_tokens")
    }
    // theta = 0 is the frozen gate: same population as the b243 entry
    val gate = SparkEntry.queries("b243_quality_classifier")(spark, sf).count()
    assert(rows.find(_._1 == 0L).get._2 === gate)
  }
}

