package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** TRAINING-DATA CAPSTONE (SURVEY §2B round-7 row B101) — the composed
  * pass that turns a scored corpus into a model-ready packing manifest,
  * in the order a pre-training pipeline actually runs it:
  *
  *   1. QUALITY (B95): char-trigram-LM surprisal tertiles per lang over
  *      the held-out (odd doc_id) split; the worst tertile is dropped.
  *      B95's rounded-bits sort key keeps the tertile boundary — and
  *      therefore THIS stage's survivor set — engine-identical;
  *   2. MIXTURE (B98): token-budget equalization over the SURVIVORS —
  *      the keep-rates are re-derived from post-filter token masses
  *      (filtering shifts them, which is why order matters and why the
  *      composition hash is not implied by the stages' own rows);
  *   3. PACK (B97): the two-phase distributed prefix scan slices the
  *      kept docs into fixed-512-token sequences.
  *
  * Like B94 (the hygiene capstone) the value of this row is the
  * COMPOSITION: one DuckDB oracle replays all three stages as chained
  * CTEs, so a drift in any stage's semantics — or in their order —
  * flips the driver hash. Scale posture is inherited piecewise: B95's
  * broadcast model, B98's map-side selector, B97's bucketed scan; the
  * only cross-stage traffic is two doc_id-keyed semi joins.
  */
object TrainPrep {

  /** Manifest of (seq_id, doc_id, doc_off, n_toks) over the kept docs. */
  def trainingManifest(docs: DataFrame): DataFrame = {
    val report = Perplexity.perplexityReport(
      docs.select(col("doc_id"), col("text"), col("lang")))
    val qualityKept = report.filter(col("bucket") <= 2).select("doc_id")
    val survivors = docs.join(qualityKept, "doc_id")
    val mixKept = MixtureResample.resampleManifest(
      survivors.select(col("doc_id"), col("text"), col("source")))
      .select("doc_id")
    SequencePack.packManifest(docs.select(col("doc_id"), col("text"))
      .join(mixKept, "doc_id"))
  }

  /** B101 — quality-filter → rebalance → pack, one chained oracle. */
  private val b101 = entry(
    "b101_training_data_capstone",
    s"""WITH train_tri AS (
       |  SELECT lang, unnest(list_transform(generate_series(1, length(text) - 2),
       |         i -> ascii(substr(text, i, 1)) * 961
       |            + ascii(substr(text, i + 1, 1)) * 31
       |            + ascii(substr(text, i + 2, 1)))) AS tri
       |  FROM documents WHERE doc_id % 2 = 0 AND length(text) >= 3),
       |model AS (SELECT lang, tri, count(*) AS cnt FROM train_tri GROUP BY 1, 2),
       |totals AS (
       |  SELECT lang, sum(cnt) AS total, count(*) AS vocab FROM model GROUP BY lang),
       |test_tri AS (
       |  SELECT doc_id, lang, unnest(list_transform(generate_series(1, length(text) - 2),
       |         i -> ascii(substr(text, i, 1)) * 961
       |            + ascii(substr(text, i + 1, 1)) * 31
       |            + ascii(substr(text, i + 2, 1)))) AS tri
       |  FROM documents WHERE doc_id % 2 = 1 AND length(text) >= 3),
       |scored AS (
       |  SELECT t.doc_id, t.lang,
       |         ln((coalesce(m.cnt, 0) + 1) * 1.0 / (tt.total + tt.vocab)) AS lnp
       |  FROM test_tri t
       |  LEFT JOIN model m ON m.lang = t.lang AND m.tri = t.tri
       |  JOIN totals tt ON tt.lang = t.lang),
       |perdoc AS (
       |  SELECT doc_id, lang, round(-avg(lnp) / ln(2), 4) AS bits
       |  FROM scored GROUP BY doc_id, lang),
       |tiled AS (
       |  SELECT doc_id,
       |         ntile(3) OVER (PARTITION BY lang ORDER BY bits, doc_id) AS bucket
       |  FROM perdoc),
       |surv AS (
       |  SELECT d.doc_id, d.source,
       |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents d JOIN tiled ON tiled.doc_id = d.doc_id
       |  WHERE tiled.bucket <= 2),
       |tot AS (SELECT source, sum(n_tok) AS t FROM surv GROUP BY source),
       |mn AS (SELECT min(t) AS mint FROM tot),
       |thr AS (
       |  SELECT source, CAST(mint * 10000 // t AS BIGINT) AS thr_bp
       |  FROM tot, mn),
       |kept AS (
       |  SELECT s.doc_id, s.n_tok
       |  FROM surv s JOIN thr ON thr.source = s.source
       |  WHERE ${Winnowing.polyFoldDuck("('mix:' || CAST(s.doc_id AS VARCHAR))")}
       |        % 10000 < thr.thr_bp),
       |offs AS (
       |  SELECT doc_id, n_tok,
       |         CAST(sum(n_tok) OVER (ORDER BY doc_id
       |                               ROWS UNBOUNDED PRECEDING) - n_tok
       |              AS BIGINT) AS start
       |  FROM kept),
       |spans AS (
       |  SELECT doc_id, n_tok, start,
       |         start // ${SequencePack.SeqLen} AS first_seq,
       |         (start + n_tok - 1) // ${SequencePack.SeqLen} AS last_seq
       |  FROM offs),
       |manifest AS (
       |  SELECT unnest(generate_series(first_seq, last_seq)) AS seq_id,
       |         doc_id, n_tok, start
       |  FROM spans)
       |SELECT seq_id, doc_id,
       |       greatest(start, seq_id * ${SequencePack.SeqLen}) - start AS doc_off,
       |       least(start + n_tok, (seq_id + 1) * ${SequencePack.SeqLen})
       |         - greatest(start, seq_id * ${SequencePack.SeqLen}) AS n_toks
       |FROM manifest
       |ORDER BY seq_id, doc_id""".stripMargin, bench = true) { (s, d) =>
    trainingManifest(Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source")))
  }

  /** B286 difficulty-bucket width for the two-phase global rank (any
    * monotone coarsening of the order key is correct; 64 keeps the
    * bucket count catalog-sized on this corpus shape). */
  private val CurriculumBucket = 64L

  /** B286 — CURRICULUM ORDERING (Bengio et al., ICML 2009 "curriculum
    * learning" — the easy-first training schedule; the deterministic
    * counterpart of B132's seeded shuffle: a loader consumes ONE of the
    * two manifests): every document scored by rarity-weighted
    * difficulty — mean inverse token frequency,
    *
    *   difficulty = (Σ_tokens N div c_t) div n_tok
    *
    * (a doc of corpus-common tokens scores ≈ vocab-size-ish low; a doc
    * carrying rare tokens scores high — the "shaped distribution"
    * signal Bengio's schedule sorts on, integer-exact from the same
    * unigram dictionary b279 scores with) — and the manifest is the
    * (step, doc_id, difficulty) table in (difficulty, doc_id) order.
    *
    * step is a GLOBAL rank over the corpus: spelled via
    * [[graft.operators.OrderStats.withGlobalRank]]'s two-phase bucketed
    * scan (the b199/b213 rewrite — per-bucket counts → driver prefix
    * fold of O(buckets) scalars → within-bucket windows), so no
    * SinglePartition exchange touches the corpus; the oracle keeps the
    * naive global window (single-node DuckDB — the asymmetry the t2
    * hash is for).
    *
    * Scale posture: one corpus token pass joins the Zipf-bounded
    * unigram dictionary (b125) and collapses to a per-doc sum; the
    * rank is bucket-parallel; output is the manifest relation itself
    * (what the loader reads). */
  private val b286 = entry(
    "b286_curriculum_order",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      |uni AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM tk
      |        GROUP BY term),
      |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk),
      |diff AS (
      |  SELECT doc_id,
      |         CAST(sum(n // c) // count(*) AS BIGINT) AS difficulty
      |  FROM tk JOIN uni USING (term) CROSS JOIN nt
      |  GROUP BY doc_id)
      |SELECT CAST(row_number() OVER (ORDER BY difficulty, doc_id)
      |            AS BIGINT) AS step,
      |       doc_id, difficulty
      |FROM diff ORDER BY step""".stripMargin, bench = true) { (s, d) =>
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val uni = tk.groupBy("term").agg(count(lit(1)).as("c"))
    val nt = tk.agg(count(lit(1)).as("n"))
    val diff = tk.join(uni, "term")
      .crossJoin(broadcast(nt))
      .groupBy("doc_id")
      .agg(expr("CAST(sum(n div c) div count(*) AS BIGINT)").as("difficulty"))
    val (ranked, _, _) = graft.operators.OrderStats.withGlobalRank(
      diff, expr(s"difficulty div $CurriculumBucket"),
      Seq(col("difficulty"), col("doc_id")), "step")
    ranked.select(col("step"), col("doc_id"), col("difficulty"))
      .orderBy("step")
  }

  val entries: Seq[Entry] = Seq(b101, b286)
}
