package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{LshCaps, MinHashLsh, SimHash, Similarity, TextDedup}
import graft.sources.Tables

/** Degenerate-corpus skew caps (SCALE.md §3.2): a corpus of 1 000
  * byte-identical documents collapses every LSH band into one bucket and
  * every shingle posting list into one hotspot — uncapped, candidate
  * generation goes quadratic (16 bands × C(1000,2) ≈ 8M pairs). The caps
  * must bound the candidate set, and exact-hash dedup (b42's groupBy
  * shape) must still collapse the corpus — identical docs are its job,
  * not LSH's. */
class SkewCapSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  import spark.implicits._

  private val NDocs = 1000
  private def degenerate =
    (0 until NDocs)
      .map(i => (i.toLong, "the same exact document text repeated verbatim every single time"))
      .toDF("doc_id", "text")

  test("MinHash LSH bucket cap bounds candidates on 1k identical docs") {
    val sigs = MinHashLsh.signatures(degenerate)
    val capped = MinHashLsh.candidatePairs(sigs, bucketCap = Some(100)).count()
    assert(capped === 0L, s"capped degenerate corpus must yield no LSH candidates, got $capped")
  }

  test("SimHash bucket cap bounds candidates on 1k identical docs") {
    val sigs = SimHash.signatures(degenerate)
    val capped = SimHash.candidatePairs(sigs, bucketCap = Some(100)).count()
    assert(capped === 0L)
  }

  test("sign-LSH bucket cap bounds candidates on 1k identical vectors") {
    val e = Tables.embeddings(spark, TestSession.sf0001).limit(1)
      .select(col("embedding")).crossJoin(spark.range(NDocs).select(col("id").as("vec_id")))
      .select(col("vec_id"), col("embedding"))
    val capped = Similarity.candidatePairs(e, bucketCap = Some(100)).count()
    assert(capped === 0L)
  }

  test("shingle df-cap empties hotspot posting lists on 1k identical docs") {
    val sh = TextDedup.shingles(degenerate)
    assert(sh.count() > 0)
    val capped = TextDedup.dfCapped(sh, cap = 100)
    assert(capped.count() === 0L,
      "every shingle of the degenerate corpus has df=1000 and must be capped away")
    // a unique doc's shingles survive the cap
    val mixed = degenerate.unionByName(
      Seq((999999L, "a genuinely different document about something else entirely here"))
        .toDF("doc_id", "text"))
    val survivors = TextDedup.dfCapped(TextDedup.shingles(mixed), cap = 100)
    assert(survivors.count() > 0)
    assert(survivors.select("doc_id").distinct().collect().map(_.getLong(0)).toSet === Set(999999L))
  }

  test("caps do not change results on a non-degenerate corpus") {
    val docs = Tables.documents(spark, TestSession.sf0001).select(col("doc_id"), col("text"))
    val sigs = MinHashLsh.signatures(docs)
    val capped = MinHashLsh.candidatePairs(sigs, bucketCap = Some(LshCaps.DefaultBucketCap))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = MinHashLsh.candidatePairs(sigs, bucketCap = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === uncapped)
  }

  test("exact dedup still collapses the degenerate corpus the caps skip") {
    val kept = degenerate
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("keep"), count(lit(1)).as("n"))
    val row = kept.collect()
    assert(row.length === 1 && row.head.getAs[Long]("n") === NDocs.toLong)
  }

  // ---- b110 lexical-tower stopword df-cap (VERDICT r9 item 6) ----

  private def tokenize(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), explode(split(col("text"), " ")).as("term")).distinct()

  test("b110 df-cap bounds per-term pair fan-out on a stopword-heavy corpus") {
    // 200 docs, ALL sharing the stopword "the" (df = ndocs), each with two
    // unique terms (df = 1). Uncapped, the inverted intersection keyed on
    // "the" alone generates |probes∩the| × |corpus| ≈ dense pairs; capped,
    // "the" is removed before pair generation and NOTHING intersects.
    val n = 200
    val docs = (0 until n)
      .map(i => (i.toLong, s"the unique${i}a unique${i}b"))
      .toDF("doc_id", "text")
    val toks = tokenize(docs)
    val kept = graft.llm.Hybrid.dfKeptTokens(toks)
    // the stopword is gone, the discriminative terms survive
    assert(kept.filter(col("term") === "the").count() === 0L)
    assert(kept.count() === 2L * n)
    // pair generation from capped tokens: per-term fan-out is bounded by
    // df(term) ≤ 0.9·ndocs; here every surviving term has df=1 → 0 pairs
    val probeToks = kept.filter(col("doc_id") < 10)
      .select(col("doc_id").as("probe_id"), col("term"))
    val pairs = kept.join(probeToks, "term")
      .filter(col("doc_id") =!= col("probe_id"))
    assert(pairs.count() === 0L,
      "capped stopword corpus must generate no cross-doc term pairs")
    // uncapped, the same corpus explodes: 10 probes × 199 others via "the"
    val pairsUncapped = toks.join(
      toks.filter(col("doc_id") < 10).select(col("doc_id").as("probe_id"), col("term")), "term")
      .filter(col("doc_id") =!= col("probe_id"))
    assert(pairsUncapped.count() === 10L * (n - 1))
  }

  test("b110 df-cap is non-binding on the real corpus (hash-stability witness)") {
    val toks = tokenize(
      Tables.documents(spark, TestSession.sf0001).select(col("doc_id"), col("text")))
    val kept = graft.llm.Hybrid.dfKeptTokens(toks)
    assert(kept.count() === toks.count(),
      "df-cap must drop nothing at sf0.001 (max df ≈ 0.8×ndocs, measured 2026-08-13)")
  }
}
