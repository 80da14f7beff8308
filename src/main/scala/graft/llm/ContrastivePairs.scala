package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** B160 — CONTRASTIVE TRAINING-PAIR MINING: turn the dedup machinery's
  * similarity signal into an embedding-training dataset — per anchor
  * document, POSITIVES (near-duplicates, jac ≥ Hi: augmentation-grade
  * paraphrases) and HARD NEGATIVES (candidates that SHARE surface
  * n-grams yet verify dissimilar, jac < Lo: the lexical-overlap
  * confusables in-batch random negatives never supply — the RocketQA/
  * ANCE observation, here mined lexically). Candidates between the
  * thresholds are discarded as label noise.
  *
  * Semantics are exact and SQL-expressible end to end: candidates =
  * pairs sharing ≥ 1 distinct 3-shingle (the b43_dedup_jaccard inverted
  * index, string shingles), similarity = exact Jaccard, ranking per
  * (anchor, label) by (jaccard DESC, other) — for hard negatives too,
  * since the HARDEST negative is the most lexically similar one. Top
  * [[PosPerAnchor]]/[[NegPerAnchor]] survive per anchor.
  *
  * Scale posture: the anchor probe set (doc_id % [[AnchorMod]] = 0, the
  * b43 probe-workload contract) broadcasts into the corpus-side shingle
  * stream — no corpus self-join; the per-pair aggregate is map-side
  * combinable; ranking windows partition by anchor. The corpus-scale
  * generator for ALL-pairs mining is the LSH path (b43_dedup_minhash) —
  * swap [[candidates]] for MinHashLsh.candidatePairs and the labeling
  * tail is unchanged (that composition is deliberately the same shape). */
object ContrastivePairs {

  private val AnchorMod = 25L
  // thresholds in integer BASIS POINTS, gated by cross-multiplication
  // (common·10⁴ vs bp·union — the b163 'no float jaccard on the gate'
  // rule; ADVICE r13): the float jac survives only as the presentation
  // column and the rank key (a single IEEE division, identical in both
  // engines)
  private val HiBp = 5000L // positives: jac ≥ 0.5
  private val LoBp = 1000L // hard negatives: jac < 0.1
  private val PosPerAnchor = 3
  private val NegPerAnchor = 5

  /** (anchor, other, jaccard) over shingle-sharing candidate pairs. */
  private def scoredCandidates(docs: DataFrame): DataFrame = {
    val corpus = MinHashLsh.spreadNarrowInput(docs)
    val counts = TextDedup.withShingleArr(docs)
      .select(col("doc_id"), size(col("sh_arr")).as("n"))
    val probes = TextDedup.shingles(docs.filter(col("doc_id") % AnchorMod === 0))
      .select(col("doc_id").as("anchor"), col("shingle"))
    TextDedup.shingles(corpus)
      .select(col("doc_id").as("other"), col("shingle"))
      .join(broadcast(probes), "shingle")
      .filter(col("anchor") =!= col("other"))
      .groupBy("anchor", "other").agg(count(lit(1)).as("common"))
      .join(counts.select(col("doc_id").as("anchor"), col("n").as("na")), "anchor")
      .join(counts.select(col("doc_id").as("other"), col("n").as("nb")), "other")
      .withColumn("jac",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
  }

  /** The labeled, ranked manifest (spec hook + the b160 body). */
  def minePairs(docs: DataFrame): DataFrame = {
    val union = col("na") + col("nb") - col("common")
    val labeled = scoredCandidates(docs)
      .withColumn("label",
        when(col("common") * 10000L >= lit(HiBp) * union, lit("positive"))
          .when(col("common") * 10000L < lit(LoBp) * union, lit("hard_negative")))
      .filter(col("label").isNotNull)
    val w = Window.partitionBy(col("anchor"), col("label"))
      .orderBy(col("jac").desc, col("other"))
    labeled
      .withColumn("rn", row_number().over(w))
      .filter(
        (col("label") === "positive" && col("rn") <= PosPerAnchor) ||
          (col("label") === "hard_negative" && col("rn") <= NegPerAnchor))
      .select(col("anchor"), col("other"),
        round(col("jac"), 4).as("jaccard"), col("label"), col("rn"))
      .orderBy("anchor", "label", "rn")
  }

  private val b160 = entry(
    "b160_contrastive_pairs",
    s"""WITH words AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(w) - 2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
       |  FROM words WHERE len(w) >= 3),
       |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS anchor, b.doc_id AS other, count(*) AS common
       |  FROM sh a JOIN sh b USING (shingle)
       |  WHERE a.doc_id % $AnchorMod = 0 AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT anchor, other, common, ca.n + cb.n - common AS u,
       |         common * 1.0 / (ca.n + cb.n - common) AS jac
       |  FROM pairs
       |  JOIN counts ca ON ca.doc_id = anchor
       |  JOIN counts cb ON cb.doc_id = other),
       |labeled AS (
       |  SELECT anchor, other, jac,
       |         CASE WHEN common * 10000 >= $HiBp * u THEN 'positive'
       |              WHEN common * 10000 < $LoBp * u THEN 'hard_negative' END AS label
       |  FROM j
       |  WHERE common * 10000 >= $HiBp * u OR common * 10000 < $LoBp * u),
       |ranked AS (
       |  SELECT anchor, other, jac, label,
       |         CAST(row_number() OVER (PARTITION BY anchor, label
       |                                 ORDER BY jac DESC, other)
       |              AS INTEGER) AS rn
       |  FROM labeled)
       |SELECT anchor, other, round(jac, 4) AS jaccard, label, rn
       |FROM ranked
       |WHERE (label = 'positive' AND rn <= $PosPerAnchor)
       |   OR (label = 'hard_negative' AND rn <= $NegPerAnchor)
       |ORDER BY anchor, label, rn""".stripMargin, bench = true) { (s, d) =>
    minePairs(Tables.documents(s, d))
  }

  val entries: Seq[Entry] = Seq(b160)
}
