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
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("hits",
        expr(s"transform(w, t -> CAST(t IN ($inList) AS INT))"))
      .withColumn("total_hits",
        expr("CAST(aggregate(hits, 0, (a, x) -> a + x) AS BIGINT)"))
      .filter(col("total_hits") > 0)
      .withColumn("n_starts", greatest(size(col("w")) - lit(W - 1), lit(1)))
      .withColumn("scores", expr(
        s"transform(sequence(1, n_starts), s -> aggregate(slice(hits, s, $W), 0, (a, x) -> a + x))"))
      .withColumn("win_hits", expr("CAST(array_max(scores) AS BIGINT)"))
      .withColumn("best_start",
        expr("CAST(array_position(scores, array_max(scores)) AS BIGINT)"))
      .select(col("doc_id"), col("total_hits"), col("win_hits"),
        col("best_start"),
        expr(s"array_join(slice(w, CAST(best_start AS INT), $W), ' ')")
          .as("snippet"))
      .orderBy("doc_id")
  }

  val entries: Seq[Entry] = Seq(b181)
}
