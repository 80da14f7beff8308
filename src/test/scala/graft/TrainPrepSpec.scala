package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{MixtureResample, Perplexity, SequencePack}
import graft.sources.Tables

/** B101 training-data capstone: stage wiring, every stage observably
  * bites, and the manifest's packing invariants hold on the kept set. */
class TrainPrepSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"), col("lang"), col("source"))

  private lazy val manifest =
    SparkEntry.queries("b101_training_data_capstone")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("B101 ≡ independently composed stages (wiring is exactly B95→B98→B97)") {
    val report = Perplexity.perplexityReport(
      docs.select(col("doc_id"), col("text"), col("lang")))
    val qualityKept = report.filter(col("bucket") <= 2).select("doc_id")
    val surv = docs.join(qualityKept, "doc_id")
    val mixKept = MixtureResample.resampleManifest(
      surv.select(col("doc_id"), col("text"), col("source"))).select("doc_id")
    val expected = SequencePack
      .packManifest(docs.select(col("doc_id"), col("text")).join(mixKept, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(manifest === expected)
  }

  test("B101: every stage observably bites") {
    val all = docs.count()
    val scored = Perplexity.perplexityReport(
      docs.select(col("doc_id"), col("text"), col("lang"))).count()
    val surv = Perplexity.perplexityReport(
      docs.select(col("doc_id"), col("text"), col("lang")))
      .filter(col("bucket") <= 2).count()
    val packedDocs = manifest.map(_._2).distinct.length.toLong
    assert(scored < all, "held-out scoring did not restrict the corpus")
    assert(surv < scored, "quality tertile filter dropped nothing")
    assert(packedDocs < surv, "mixture rebalancing dropped nothing")
    assert(packedDocs > 0)
  }

  test("B101: packing invariants hold on the kept set") {
    val perDoc = manifest.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val tokOf = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, n) <- perDoc)
      assert(n === tokOf(id), s"doc $id packs $n of ${tokOf(id)} tokens")
    val bySeq = manifest.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val lastSeq = bySeq.keys.max
    for ((s, n) <- bySeq if s != lastSeq)
      assert(n === SequencePack.SeqLen.toLong, s"sequence $s holds $n tokens")
  }

  test("B286: the curriculum manifest replays in the JVM (rarity score," +
    " easy-first order, dense two-phase global rank)") {
    val got = SparkEntry.queries("b286_curriculum_order")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // JVM replay: difficulty = (sum of N div c_t) div n_tok
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0),
        r.getString(1).split(" ", -1).filter(_.nonEmpty)))
    val uni = docs.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val n = uni.values.sum
    val want = docs.map { case (id, ts) =>
      (id, ts.map(t => n / uni(t)).sum / ts.length.toLong)
    }.sortBy { case (id, dfc) => (dfc, id) }
      .zipWithIndex.map { case ((id, dfc), i) => (i + 1L, id, dfc) }.toSeq
    assert(got.toSeq === want, "manifest diverges from the JVM replay")
    // curriculum shape: every doc present exactly once, steps dense from
    // 1, difficulty nondecreasing in step
    assert(got.map(_._2).distinct.length === docs.length)
    assert(got.map(_._1).toSeq === (1L to docs.length.toLong))
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3, s"difficulty decreases at step ${b._1}")
    }
    // the score discriminates (a flat constant would order by doc_id)
    assert(got.map(_._3).distinct.length > 1, "difficulty is constant")
  }
}
