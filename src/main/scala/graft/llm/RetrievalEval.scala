package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry._


/** B261 — RETRIEVAL EVALUATION SUITE: the offline IR-eval table every
  * retrieval stack ships next to its index (P@10, recall@10, MRR,
  * nDCG@10 — Järvelin & Kekäläinen's graded-gain formulation), computed
  * for the b107 BM25 ranking AND a deliberately-bad control ranking over
  * the same scored pool, per query. An eval harness that cannot SEPARATE
  * a good system from a bad one measures nothing — so the entry ships
  * the separation: the control is the bottom-10 of the same score order
  * ('worst'), and the spec asserts bm25 strictly dominates it on every
  * graded metric for every query.
  *
  * Relevance labels are synthetic pseudo-relevance, graded by query-term
  * mass: rel(q, doc) = least(3, Σ tf div 2) — documented bias: labels
  * derive from term frequency, so they favor tf-heavy rankers; the
  * harness measures ranking quality AGAINST THESE LABELS, exactly like
  * any click-derived judgment set measures against its own bias. The
  * fixture's vocabulary is deliberately dense (~80% of docs contain a
  * query term), so binary P@10 saturates for the good ranker — the
  * discriminating metric is graded nDCG (and all four collapse for the
  * control), which is the real-world shape too: binary metrics saturate
  * on easy corpora, graded ones keep separating.
  *
  * Integer-exact where possible: P/recall/RR in basis points by BIGINT
  * floor division (RR = 10000 div first-relevant-rank); only DCG is
  * float — the gain expression `(2^rel − 1)/log2(rank+1)` is shared
  * verbatim between engines (the bm25Expr convention) and nDCG rounds
  * to 4dp.
  *
  * Scale posture: the scored pool is (query-term docs × queries) — the
  * b107 semi-join prune, never the corpus; both rankings come from TWO
  * row_numbers over ONE query-partitioned sort input; labels, n_rel and
  * ideal-DCG are query-cardinality relations (broadcast); the metric
  * rollup map-combines. Nothing here is corpus-proportional beyond the
  * b107 scan it reuses. */
object RetrievalEval {

  /** Gain at a rank, shared verbatim between engines. */
  private val gainExpr = "(pow(2.0, rel) - 1.0) / (ln(rn + 1) / ln(2))"

  private val b261 = entry(
    "b261_retrieval_eval",
    s"""WITH ${Retrieval.bm25ScoreCtesDuck()},
       |rel AS (
       |  SELECT q.query_id, tf.doc_id,
       |         least(3, CAST(sum(tf.tf) AS BIGINT) // 2) AS rel
       |  FROM q JOIN tf USING (term) GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, doc_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY round(s, 4) DESC, doc_id) AS BIGINT) AS rn_d,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY round(s, 4) ASC, doc_id DESC) AS BIGINT) AS rn_a
       |  FROM score),
       |sides AS (
       |  SELECT query_id, doc_id, 'bm25' AS ranker, rn_d AS rn
       |  FROM ranked WHERE rn_d <= 10
       |  UNION ALL
       |  SELECT query_id, doc_id, 'worst', rn_a FROM ranked WHERE rn_a <= 10),
       |lab AS (
       |  SELECT s.query_id, s.ranker, s.rn, coalesce(r.rel, 0) AS rel
       |  FROM sides s LEFT JOIN rel r
       |    ON r.query_id = s.query_id AND r.doc_id = s.doc_id),
       |nrel AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
       |  FROM rel WHERE rel >= 2 GROUP BY 1),
       |ideal AS (
       |  SELECT query_id, rel,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY rel DESC, doc_id) AS BIGINT) AS rn
       |  FROM rel),
       |idcg AS (
       |  SELECT query_id, sum($gainExpr) AS idcg
       |  FROM ideal WHERE rn <= 10 GROUP BY 1),
       |m AS (
       |  SELECT query_id, ranker,
       |         CAST(sum(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS hits,
       |         min(CASE WHEN rel >= 2 THEN rn END) AS first_rel,
       |         sum($gainExpr) AS dcg
       |  FROM lab GROUP BY 1, 2)
       |SELECT CAST(m.query_id AS BIGINT) AS query_id, m.ranker, n.n_rel,
       |       hits * 1000 AS p10_bp,
       |       hits * 10000 // n.n_rel AS recall10_bp,
       |       CAST(coalesce(10000 // first_rel, 0) AS BIGINT) AS rr_bp,
       |       round(m.dcg / i.idcg, 4) AS ndcg10
       |FROM m JOIN nrel n USING (query_id) JOIN idcg i USING (query_id)
       |ORDER BY query_id, ranker""".stripMargin,
    bench = true) { (s, d) =>
    import s.implicits._
    val q = Retrieval.QueryTerms.toDF("query_id", "term")
    // labels derive from the scan's own CHECKPOINTED tf — no second
    // corpus explode (measured: the naive re-explode doubled the entry)
    val (scores, tf) = Retrieval.bm25ScanParts(s, d)
    val rel = broadcast(q).join(tf, "term")
      .groupBy("query_id", "doc_id")
      .agg(expr("least(CAST(3 AS BIGINT), sum(tf) div 2)").as("rel"))
    val wD = Window.partitionBy("query_id")
      .orderBy(round(col("s"), 4).desc, col("doc_id"))
    val wA = Window.partitionBy("query_id")
      .orderBy(round(col("s"), 4).asc, col("doc_id").desc)
    val ranked = scores
      .withColumn("rn_d", row_number().over(wD).cast("long"))
      .withColumn("rn_a", row_number().over(wA).cast("long"))
    val sides = ranked.filter(col("rn_d") <= 10)
      .select(col("query_id"), col("doc_id"), lit("bm25").as("ranker"),
        col("rn_d").as("rn"))
      .unionByName(ranked.filter(col("rn_a") <= 10)
        .select(col("query_id"), col("doc_id"), lit("worst").as("ranker"),
          col("rn_a").as("rn")))
    val lab = sides.join(rel, Seq("query_id", "doc_id"), "left")
      .na.fill(0L, Seq("rel"))
    val nrel = rel.filter(col("rel") >= 2)
      .groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val wI = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("doc_id"))
    val idcg = rel.withColumn("rn", row_number().over(wI).cast("long"))
      .filter(col("rn") <= 10)
      .groupBy("query_id").agg(sum(expr(gainExpr)).as("idcg"))
    val m = lab.groupBy("query_id", "ranker").agg(
      sum(when(col("rel") >= 2, 1L).otherwise(0L)).as("hits"),
      min(when(col("rel") >= 2, col("rn"))).as("first_rel"),
      sum(expr(gainExpr)).as("dcg"))
    m.join(broadcast(nrel), "query_id").join(broadcast(idcg), "query_id")
      .select(col("query_id"), col("ranker"), col("n_rel"),
        expr("hits * 1000").as("p10_bp"),
        expr("hits * 10000 div n_rel").as("recall10_bp"),
        expr("CAST(coalesce(10000 div first_rel, 0) AS BIGINT)").as("rr_bp"),
        round(col("dcg") / col("idcg"), 4).as("ndcg10"))
      .orderBy("query_id", "ranker")
  }

  val entries: Seq[Entry] = Seq(b261)
}
