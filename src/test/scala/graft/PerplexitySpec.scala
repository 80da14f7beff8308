package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Perplexity
import graft.sources.Tables

/** B95 perplexity-proxy quality bucketing: surprisal semantics and the
  * tertile split. */
class PerplexitySpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"), col("lang"))

  test("tertile buckets are 1..3, balanced within 1 per lang, ordered by bits") {
    val out = Perplexity.perplexityReport(docs).cache()
    try {
      assert(out.filter(col("bucket") < 1 || col("bucket") > 3).count() === 0)
      val sizes = out.groupBy("lang", "bucket").count()
        .groupBy("lang").agg((max("count") - min("count")).as("spread"))
      assert(sizes.filter(col("spread") > 1).count() === 0,
        "ntile tertiles unbalanced by more than 1 within a language")
      // bucket ordering respects bits: max(bits) of bucket b <= min(bits)
      // of bucket b+1 within each lang (ties broken by doc_id can only
      // split EQUAL bits across a boundary)
      val bounds = out.groupBy("lang", "bucket")
        .agg(min("bits").as("lo"), max("bits").as("hi"))
      val crossed = bounds.as("a").join(bounds.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.bucket") + 1 === col("b.bucket") &&
          col("a.hi") > col("b.lo"))
      assert(crossed.count() === 0, "a higher bucket contains lower surprisal")
    } finally out.unpersist()
  }

  test("garbage-injected docs score strictly higher surprisal than their originals") {
    // append unseen control-char trigrams to some odd (test-split) docs:
    // every injected trigram is unseen by the trained model, so the
    // add-one-smoothed surprisal must rise
    val garbage = (1 to 60).map(i => ('\u0001' + i % 26).toChar).mkString
    val tainted = docs.filter(col("doc_id") % 2 === 1 && col("doc_id") % 10 === 1)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(col("text"), lit(" " + garbage)).as("text"), col("lang"))
    val out = Perplexity.perplexityReport(docs.unionByName(tainted))
    val pairs = out.filter(col("doc_id") >= 5000000L)
      .select((col("doc_id") - 5000000L).as("doc_id"), col("bits").as("tainted_bits"))
      .join(out.filter(col("doc_id") < 5000000L), "doc_id")
    assert(pairs.count() > 0, "no tainted pair materialized")
    assert(pairs.filter(col("tainted_bits") <= col("bits")).count() === 0,
      "garbage injection did not raise surprisal")
  }

  test("plan: the LM model and totals broadcast to the scoring join") {
    val plan = Perplexity.perplexityReport(docs).queryExecution.sparkPlan.toString
    // both small sides carry explicit broadcast hints; the corpus-side
    // trigram stream must never shuffle for the lookups
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"model/totals did not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the scoring join shuffled the corpus side:\n$plan")
  }

  test("surprisal equals an independent JVM recomputation of the trigram LM") {
    // definition-level oracle sharing nothing with either engine's SQL:
    // codepoint trigrams (c1*961 + c2*31 + c3), per-lang Laplace model
    // over even docs, -mean ln p / ln 2 over the odd docs' occurrences
    def tris(text: String): Seq[Int] = {
      val cps = text.codePoints().toArray
      if (cps.length < 3) Seq.empty
      else (0 to cps.length - 3).map(i => cps(i) * 961 + cps(i + 1) * 31 + cps(i + 2))
    }
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val model = rows.filter(t => t._1 % 2 == 0 && t._2.length >= 3)
      .flatMap { case (_, text, lang) => tris(text).map(lang -> _) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = model.groupBy(_._1._1).view
      .mapValues(m => (m.values.sum, m.size.toLong)).toMap
    val want = rows.filter(t => t._1 % 2 == 1 && t._2.length >= 3)
      .filter(t => totals.contains(t._3))
      .map { case (id, text, lang) =>
        val (total, vocab) = totals(lang)
        val lnps = tris(text).map(tri =>
          math.log((model.getOrElse((lang, tri), 0L) + 1).toDouble / (total + vocab)))
        val bits = BigDecimal(-lnps.sum / lnps.size / math.log(2.0))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        id -> ((lnps.size.toLong, bits))
      }.toMap
    val got = Perplexity.perplexityReport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === want.keySet)
    for ((id, (nTris, bits)) <- want) {
      assert(got(id)._1 === nTris, s"doc $id trigram count diverged")
      assert(math.abs(got(id)._2 - bits) < 1e-9,
        s"doc $id surprisal diverged: engine ${got(id)._2} vs JVM $bits")
    }
  }

  test("gramKeyedModel (the KenLM-order scale path) equals the broadcast path") {
    // result-identical by construction (same left join, different physical
    // strategy); pinned here at trigram order so flipping the flag at
    // 5-gram order cannot silently change scores
    val a = Perplexity.perplexityReport(docs).collect().map(_.toString).toSeq
    val b = Perplexity.perplexityReport(docs, gramKeyedModel = true)
      .collect().map(_.toString).toSeq
    assert(a === b, "gram-keyed scoring diverged from the broadcast path")
    // and the physical plan actually changed: the model join shuffles
    // (hash-keyed) instead of broadcasting — one fewer BroadcastHashJoin,
    // one ShuffledHashJoin in its place
    val plan = Perplexity.perplexityReport(docs, gramKeyedModel = true)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"gramKeyedModel did not shuffle the model join:\n$plan")
  }

  test("untrained-language test docs are DROPPED (the documented totals-join contract)") {
    // a lang appearing only in the test split (odd doc_ids) has no model
    // and no totals row → its docs must vanish from the report, matching
    // the oracle's inner totals join (documented in perplexityReport)
    val alien = Seq((4999999L, "zz qq xx vv ww yy kk jj", "xx_alien"))
    import spark.implicits._
    val out = Perplexity.perplexityReport(
      docs.unionByName(alien.toDF("doc_id", "text", "lang")))
    assert(out.filter(col("lang") === "xx_alien").count() === 0,
      "untrained-language doc leaked into the report")
    assert(out.filter(col("doc_id") === 4999999L).count() === 0)
  }

  test("report is rerun-deterministic") {
    val a = SparkEntry.queries("b95_text_perplexity")(spark, sf).collect()
    val b = SparkEntry.queries("b95_text_perplexity")(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.nonEmpty)
  }
}
