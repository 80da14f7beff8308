package graft.llm

import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** B181 — KWIC SNIPPET EXTRACTION (the serve-time tail every search/RAG
  * stack runs after ranking — Luhn '58's significance windows, the
  * keyword-in-context display IIR §8.7 calls dynamic summaries): for
  * every document matching a query, find the best fixed-width window —
  * the W-word span containing the MOST query-term occurrences, ties to
  * the LEFTMOST span (display stability) — and emit it with its hit
  * counts. b107/b113 rank documents; this row is what the user actually
  * SEES, and what a RAG pipeline puts in the context window instead of
  * the whole document.
  *
  * Integer-exact by construction: per-word hit indicators, window
  * scores as prefix-window sums over the indicator array, argmax via
  * first-position-of-max (both engines' array_position/list_position
  * return the FIRST index — the leftmost tie rule for free). Snippet
  * text is a 1-based slice shared by both dialects; slices truncate at
  * the document end identically, and docs shorter than W emit whole-doc
  * snippets (n_starts = max(L − W + 1, 1)).
  *
  * Scale posture: pure per-row map-side array arithmetic (O(L·W) per
  * doc) inside whole-stage codegen — no shuffle; production composes it
  * AFTER the b29-style top-k, so it touches k rows per query, not the
  * corpus. The ORDER BY is gate presentation only. */
object Snippets {

  /** Window width (words) — the display budget. */
  val W = 8

  /** Query 2 of the retrieval workload ({window, agg, stream}) — the
    * multi-term query with enough corpus hits to exercise ties. */
  val Terms: Seq[String] = Seq("window", "agg", "stream")

  private def inList = Terms.map(t => s"'$t'").mkString(", ")

  /** Appends win_hits, best_start, snippet to a relation carrying `w`
    * (the word array) and `hits` (the per-word 0/1 indicator): window
    * scores over all starts, argmax via first-position-of-max (leftmost
    * tie), 1-based slice for the snippet. Shared by b181 and b184. */
  private def bestWindow(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("n_starts", greatest(size(col("w")) - lit(W - 1), lit(1)))
      .withColumn("scores", expr(
        s"transform(sequence(1, n_starts), s -> aggregate(slice(hits, s, $W), 0, (a, x) -> a + x))"))
      .withColumn("win_hits", expr("CAST(array_max(scores) AS BIGINT)"))
      .withColumn("best_start",
        expr("CAST(array_position(scores, array_max(scores)) AS BIGINT)"))
      .withColumn("snippet",
        expr(s"array_join(slice(w, CAST(best_start AS INT), $W), ' ')"))

  /** The DuckDB twin of [[bestWindow]]'s arithmetic, as reusable CTE
    * text: takes a relation `$src`(…, w, hits) and yields `$out`(…,
    * scores) plus the final-select fragments. */
  private[graft] def windowScoresSql(src: String): String =
    s"""SELECT *, list_transform(generate_series(1, greatest(len(w) - $W + 1, 1)),
       |         s -> CAST(list_sum(hits[s : s + ${W - 1}]) AS INT)) AS scores
       |FROM $src""".stripMargin

  private val b181 = entry(
    "b181_snippet_extract",
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |x AS (
       |  SELECT doc_id, w, len(w) AS l,
       |         list_transform(w, t ->
       |           CASE WHEN t IN ($inList) THEN 1 ELSE 0 END) AS hits
       |  FROM d),
       |y AS (
       |  SELECT doc_id, w, hits,
       |         CAST(list_sum(hits) AS BIGINT) AS total_hits,
       |         greatest(l - $W + 1, 1) AS n_starts
       |  FROM x),
       |z AS (
       |  SELECT doc_id, w, total_hits,
       |         list_transform(generate_series(1, n_starts),
       |           s -> CAST(list_sum(hits[s : s + ${W - 1}]) AS INT)) AS scores
       |  FROM y WHERE total_hits > 0)
       |SELECT doc_id, total_hits,
       |       CAST(list_max(scores) AS BIGINT) AS win_hits,
       |       CAST(list_position(scores, list_max(scores)) AS BIGINT)
       |         AS best_start,
       |       array_to_string(
       |         w[list_position(scores, list_max(scores)) :
       |           list_position(scores, list_max(scores)) + ${W - 1}], ' ')
       |         AS snippet
       |FROM z ORDER BY doc_id""".stripMargin, bench = true) { (s, d) =>
    bestWindow(
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("hits",
          expr(s"transform(w, t -> CAST(t IN ($inList) AS INT))"))
        .withColumn("total_hits",
          expr("CAST(aggregate(hits, 0, (a, x) -> a + x) AS BIGINT)"))
        .filter(col("total_hits") > 0))
      .select(col("doc_id"), col("total_hits"), col("win_hits"),
        col("best_start"), col("snippet"))
      .orderBy("doc_id")
  }

  /** B184 — THE SERVE PAGE (ranked results + snippets in ONE plan — what
    * a search/RAG endpoint actually returns): b107's BM25 top-10 per
    * query joined back to the document text, each hit snippeted by ITS
    * OWN query's term set (the hit indicator is per-(query, doc) — query
    * 1's page highlights 'spark join', query 3's 'fast table scan').
    * Every served doc contains ≥ 1 query term by construction (it
    * matched), so win_hits ≥ 1 on every row.
    *
    * Oracle: b107's full BM25 oracle VERBATIM as a nested-WITH CTE (the
    * ranking must be the b107/b111 ranking — one definition), composed
    * with the same per-query window arithmetic as b181. Hash-green pins
    * the COMPOSITION: ranking unchanged by the snippet join, snippets
    * computed against the right query's terms.
    *
    * Scale posture: the snippet stage touches 10 rows per query (the
    * page), never the corpus — one doc-keyed join to fetch the 30 texts
    * + map-side window arithmetic; the ranking upstream is b107's plan
    * (or b111's index-served twin — the tail composes over either). */
  private val b184 = entry(
    "b184_serve_page", {
      val ranked = Retrieval.bm25OracleSql()
      s"""WITH ranked AS ($ranked),
         |qv(query_id, term) AS (VALUES ${Retrieval.duckQueryValues()}),
         |qlist AS (SELECT query_id, list(term) AS qterms FROM qv GROUP BY query_id),
         |dd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |hit AS (
         |  SELECT r.query_id, r.rn, r.doc_id, r.bm25, d.w,
         |         list_transform(d.w, t ->
         |           CASE WHEN list_contains(ql.qterms, t) THEN 1 ELSE 0 END)
         |           AS hits
         |  FROM ranked r JOIN dd d USING (doc_id)
         |       JOIN qlist ql USING (query_id)),
         |sc AS (${windowScoresSql("hit")})
         |SELECT query_id, rn, doc_id, bm25,
         |       CAST(list_max(scores) AS BIGINT) AS win_hits,
         |       CAST(list_position(scores, list_max(scores)) AS BIGINT)
         |         AS best_start,
         |       array_to_string(
         |         w[list_position(scores, list_max(scores)) :
         |           list_position(scores, list_max(scores)) + ${W - 1}], ' ')
         |         AS snippet
         |FROM sc ORDER BY query_id, rn""".stripMargin
    }) { (s, d) =>
    import s.implicits._
    val ranked = Retrieval.bm25TopDocsScan(s, d)
    val qlist = Retrieval.QueryTerms.groupBy(_._1).view
      .mapValues(_.map(_._2)).toSeq
      .map { case (q, ts) => (q, ts) }.toDF("query_id", "qterms")
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    bestWindow(
      ranked.join(docs, "doc_id").join(broadcast(qlist), "query_id")
        .withColumn("hits",
          expr("transform(w, t -> CAST(array_contains(qterms, t) AS INT))")))
      .select(col("query_id"), col("rn"), col("doc_id"), col("bm25"),
        col("win_hits"), col("best_start"), col("snippet"))
      .orderBy("query_id", "rn")
  }

  /** B229 token budget: 256 tokens ≈ 4-5 of the 10-99-token docs — the
    * greedy prefix provably truncates at every SF (some of the top-10
    * always drop), which is what makes the budget binding. */
  private val CtxBudget = 256L

  /** B229 — RAG CONTEXT PACKING (the retrieve-then-fit step between
    * b107's ranking and a generator's context window; the serve-side
    * sibling of b97/b154's training-side packing): per query, walk the
    * BM25 top-10 IN RANK ORDER and keep the maximal prefix whose
    * cumulative whitespace-token count fits [[CtxBudget]] — greedy
    * PREFIX packing (rank order is the relevance contract; skip-fit
    * would trade a better fill for rank inversions). cum is a rank-
    * ordered running sum, so `cum ≤ B` IS the prefix cut.
    *
    * Scale posture: b107's plan upstream; the packing adds one doc-keyed
    * join for token counts and one window over the ≤10-row-per-query
    * serve set — serve-shaped, never corpus-shaped. */
  private val b229 = entry(
    "b229_rag_context_pack", {
      val ranked = Retrieval.bm25OracleSql()
      s"""WITH ranked AS ($ranked),
         |tok AS (
         |  SELECT doc_id,
         |         CAST(len(list_filter(string_split(text, ' '),
         |                              x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |cum AS (
         |  SELECT r.query_id, r.rn, r.doc_id, r.bm25, t.n_tokens,
         |         CAST(sum(t.n_tokens) OVER (PARTITION BY r.query_id
         |                                    ORDER BY r.rn
         |                                    ROWS UNBOUNDED PRECEDING)
         |              AS BIGINT) AS cum_tokens
         |  FROM ranked r JOIN tok t USING (doc_id))
         |SELECT query_id, rn, doc_id, bm25, n_tokens, cum_tokens
         |FROM cum WHERE cum_tokens <= $CtxBudget
         |ORDER BY query_id, rn""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ranked = Retrieval.bm25TopDocsScan(s, d)
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)")
          .as("n_tokens"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ranked.join(tok, "doc_id")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w).cast("long"))
      .filter(col("cum_tokens") <= CtxBudget)
      .select(col("query_id"), col("rn"), col("doc_id"), col("bm25"),
        col("n_tokens"), col("cum_tokens"))
      .orderBy("query_id", "rn")
  }

  val entries: Seq[Entry] = Seq(b181, b184, b229)
}
