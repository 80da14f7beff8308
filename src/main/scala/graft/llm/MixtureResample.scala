package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** Data-dependent MIXTURE REBALANCING (SURVEY §2B round-7 row B98) — the
  * pre-training step that equalizes a corpus's per-source token budget
  * (the uniform-target special case of DoReMi-style domain reweighting,
  * Xie et al. 2023): every source is deterministically downsampled to
  * ≈ the SMALLEST source's token mass, so no domain dominates the
  * mixture. Unlike B59's stratified sampling the rates are NOT given —
  * they are DERIVED from the data:
  *
  *   1. per-source token totals T_s (one map-side-combinable aggregate,
  *      |sources| rows);
  *   2. keep-rate in integer basis points: thr_bp(s) = ⌊min(T)·10⁴/T_s⌋
  *      — all-BIGINT arithmetic, engine-exact (min(T)·10⁴ overflows only
  *      past ~9·10¹⁴ tokens per source, documented bound);
  *   3. map-side selector: keep doc iff polyhash("mix:"‖doc_id) mod 10⁴
  *      < thr_bp(source) — B56/B59's pure-function-of-the-key rule, so
  *      the draw is rerun-, engine- and partitioning-stable, and new
  *      rows join the sample incrementally. The "mix:" salt decorrelates
  *      from b56's split buckets and b59's strata.
  *
  * Scale posture: one |sources|-row aggregate broadcast back; the filter
  * itself is map-side inside the scan's codegen stage — the corpus never
  * shuffles to be sampled. Rate quantization is 1 bp (≤ 10⁻⁴ relative),
  * the price of exact cross-engine integer arithmetic. The smallest
  * source gets thr_bp = 10⁴ and is kept whole (spec-pinned, along with
  * kept-token-mass ≈ min(T) per source).
  */
object MixtureResample {

  private val Bp = 10000L

  /** Kept-doc manifest: (doc_id, source, n_tok) of every document that
    * survives equalization, in doc_id order. */
  def resampleManifest(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val tot = toks.groupBy("source").agg(sum("n_tok").as("t"))
    val mn = tot.agg(min(col("t")).as("mint"))
    val thr = tot.crossJoin(broadcast(mn))
      .select(col("source"), expr(s"mint * $Bp div t").as("thr_bp"))
    val key = "concat('mix:', CAST(doc_id AS STRING))"
    toks.join(broadcast(thr), "source")
      .filter(expr(s"${Winnowing.polyFoldSpark(key)} % $Bp") < col("thr_bp"))
      .select(col("doc_id"), col("source"), col("n_tok"))
      .orderBy("doc_id")
  }

  /** B98 — token-budget equalization across sources. */
  private val b98 = entry(
    "b98_mixture_resample",
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |tot AS (SELECT source, sum(n_tok) AS t FROM toks GROUP BY source),
       |mn AS (SELECT min(t) AS mint FROM tot),
       |thr AS (
       |  SELECT source, CAST(mint * $Bp // t AS BIGINT) AS thr_bp
       |  FROM tot, mn)
       |SELECT t.doc_id, t.source, t.n_tok
       |FROM toks t JOIN thr ON thr.source = t.source
       |WHERE ${Winnowing.polyFoldDuck("('mix:' || CAST(t.doc_id AS VARCHAR))")}
       |      % $Bp < thr.thr_bp
       |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    resampleManifest(Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source")))
  }

  val entries: Seq[Entry] = Seq(b98)
}
