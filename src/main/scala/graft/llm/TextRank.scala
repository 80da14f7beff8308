package graft.llm

import org.apache.spark.sql.functions._
import graft.Registry._
import graft.operators.GraphOps
import graft.sources.Tables

/** B166 — TEXTRANK KEYWORD EXTRACTION (Mihalcea & Tarau, EMNLP'04):
  * PageRank over the word CO-OCCURRENCE graph — the classic unsupervised
  * keyword ranker, and a deliberate COMPOSITION of two standing engines:
  * the B164 context-window relation builds the graph, the B119 exact
  * integer PageRank ranks it. Nodes are word strings (the Pregel loop is
  * node-type generic — joins key on the node column, never cast it);
  * edges are the DISTINCT symmetrized window pairs (w1 ≠ w2), so every
  * node has in- and out-degree ≥ 1 and the b119 no-dangling-mass
  * precondition holds by construction. Top-20 by (rank DESC, word).
  *
  * The oracle reuses B119's iteration-as-text CTE chain VERBATIM
  * (GraphOps.prIterSql) over word-keyed edges — one spelling of the
  * PageRank algebra per engine, whatever the node type.
  *
  * Scale posture: the token explode collapses map-side into the DISTINCT
  * pair set (vocabulary² upper bound, Zipf-sparse in practice) — from
  * there every round is vocabulary-scale, not corpus-scale; the O(1)
  * node-count driver scalar and per-round localCheckpoint are b119's. */
object TextRank {

  private val Top = 20

  private val b166 = entry(
    "b166_textrank_keywords",
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |wpairs AS (
       |  SELECT t[i] AS w1, t[i + j] AS w2
       |  FROM toks,
       |       UNNEST(generate_series(1, len(t) - 1)) AS g(i),
       |       UNNEST(generate_series(1, ${NgramLm.CoocWindow})) AS h(j)
       |  WHERE i + j <= len(t) AND t[i] <> '' AND t[i + j] <> ''
       |    AND t[i] <> t[i + j]),
       |edges AS (
       |  SELECT w1 AS src, w2 AS dst FROM wpairs
       |  UNION
       |  SELECT w2, w1 FROM wpairs),
       |outdeg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM outdeg),
       |r0 AS (SELECT node, ${GraphOps.PrScale} // n.n AS rank FROM outdeg, n),
       |${GraphOps.prIterSql}
       |SELECT node AS word, rank AS pr_fixed FROM r${GraphOps.PrIters}
       |ORDER BY pr_fixed DESC, word LIMIT $Top""".stripMargin, bench = true) { (s, d) =>
    val pairs = NgramLm.windowPairs(Tables.documents(s, d))
      .filter(col("w1") =!= col("w2"))
      .select(col("w1"), col("w2"))
    val edges = pairs.select(col("w1").as("src"), col("w2").as("dst"))
      .unionByName(pairs.select(col("w2").as("src"), col("w1").as("dst")))
      .distinct()
    GraphOps.pageRank(edges)
      .select(col("node").as("word"), col("rank").as("pr_fixed"))
      .orderBy(col("pr_fixed").desc, col("word"))
      .limit(Top)
  }

  val entries: Seq[Entry] = Seq(b166)
}
