package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** B243 — learned quality-classifier inference over the documents table:
  * the frozen hashed-ngram logistic scorer (see
  * [[graft.functions.QualityScoreExpression]] for the model and the
  * arithmetic contract) applied as a MAP-SIDE gate — the pass CCNet,
  * GPT-3 and every production corpus pipeline runs between heuristic
  * cleaning (b45_quality/b73/b94's gates) and dedup.
  *
  * Scale posture (100 TB): the score is one native codegen expression
  * inside the scan's projection and the threshold is a Filter directly
  * above it — ZERO shuffles before the gate (spec-asserted: the ungated
  * [[QualityClassifier.scored]] plan contains no Exchange at all), so the
  * classifier runs at full scan bandwidth on every executor and the
  * corpus never moves for it. The only exchange in the entry is the
  * presentation ORDER BY after the gate. A trained model swaps the
  * weight function for a broadcast table lookup; the plan shape is
  * unchanged. */
object QualityClassifier {

  /** (doc_id, score, kept) for every document — no gate, no exchange;
    * the b94-composable building block. */
  def scored(docs: DataFrame): DataFrame = {
    graft.functions.QualityScoreExpression.register(docs.sparkSession)
    docs.select(col("doc_id"),
      expr("quality_score(text)").as("score"))
  }

  private def wexprDuck(salted: String): String =
    s"((((${Winnowing.polyFoldDuck(salted)} % 4096) * 2654435761)" +
      " % 2147483648) % 2001) - 1000"

  /** The oracle replays hash → dot → threshold in pure SQL: the salted
    * codepoint fold per unigram and per bigram of the FILTERED token
    * list, the scrambled centered weight, list_sum (empty lists coalesce
    * to 0 — DuckDB's list_sum of [] is NULL where Spark's aggregate init
    * is 0), and the same strict `> 0` keep. */
  private[graft] val qualityOracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '')
       |           AS w
       |  FROM documents),
       |feats AS (
       |  SELECT doc_id,
       |    coalesce(list_sum(list_transform(w,
       |      t -> ${wexprDuck("'qc:' || t")})), 0) +
       |    coalesce(list_sum(list_transform(
       |      list_transform(generate_series(1, len(w) - 1),
       |                     i -> w[i] || ' ' || w[i+1]),
       |      t -> ${wexprDuck("'qc2:' || t")})), 0) AS score
       |  FROM toks)
       |SELECT doc_id, CAST(score AS BIGINT) AS score
       |FROM feats WHERE score > 0 ORDER BY doc_id""".stripMargin

  private val b243 = entry(
    "b243_quality_classifier", qualityOracleSql, bench = true) { (s, d) =>
    scored(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .filter(col("score") > 0)
      .orderBy("doc_id")
  }

  val entries: Seq[Entry] = Seq(b243)
}
