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

  test("B243 plan: zero exchanges before the gate; scoring is codegen") {
    val gated = QualityClassifier.scored(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .filter(col("score") > 0)
    val plan = gated.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the classifier gate must run at scan bandwidth:\n$plan")
    // the executedPlan string marks whole-stage-codegen stages with *(n);
    // both the Filter and the Project must sit inside one
    assert(plan.contains("*(1) Filter"), plan)
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("quality_score"), plan)
  }
}
