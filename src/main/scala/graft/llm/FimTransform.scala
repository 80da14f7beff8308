package graft.llm

import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** B175 — FILL-IN-THE-MIDDLE TRANSFORM (Bavarian et al. 2022, "Efficient
  * Training of Language Models to Fill in the Middle"): rewrite a
  * configurable fraction of documents from `prefix·middle·suffix` into
  * the FIM orderings a causal LM trains on — PSM
  * (`<PRE>prefix<SUF>suffix<MID>middle`) and the joint SPM variant
  * (`<SUF>suffix<PRE>prefix<MID>middle`) — leaving the rest untouched
  * (the paper's ~50% FIM rate; transformed docs alternate PSM/SPM). The
  * FIM-for-free result is a data-side transform exactly like this: no
  * model change, just a deterministic rewrite pass over the corpus.
  *
  * Everything is integer-exact and engine-shared: the span endpoints
  * derive from the 40-bit polynomial fold of `fim:doc_id` —
  * `a = 1 + h mod ⌊L/3⌋` and `b = L − 1 − (⌊h/64⌋ mod ⌊L/3⌋)` over the
  * char length L, which guarantees 1 ≤ a < b ≤ L−1 for every eligible
  * doc (a ≤ ⌊L/3⌋ < L − ⌊L/3⌋ ≤ b since ⌊L/3⌋ ≥ 1 and L ≥ MinChars),
  * so prefix, middle and suffix are all non-empty; substr is 1-based
  * char slicing in both dialects. Docs under [[MinChars]] chars pass
  * through (too short to split three ways usefully — the paper's
  * degenerate-span guard).
  *
  * Scale posture: pure map-side string arithmetic in whole-stage codegen
  * — no shuffle at any corpus size (the tokenizer-family posture); the
  * ORDER BY is gate presentation only. */
object FimTransform {

  val MinChars = 9
  /** doc_id % FimMod < FimOn → transformed (50% FIM rate). */
  val FimMod = 10L
  val FimOn = 5L

  val Pre = "<PRE>"
  val Suf = "<SUF>"
  val Mid = "<MID>"

  private val b175 = entry(
    "b175_fim_transform",
    s"""WITH base AS (
       |  SELECT doc_id, text, length(text) AS l,
       |         ${Winnowing.polyFoldDuck("('fim:' || CAST(doc_id AS VARCHAR))")} AS h
       |  FROM documents),
       |cuts AS (
       |  SELECT doc_id, text, l,
       |         CASE WHEN l >= $MinChars AND doc_id % $FimMod < $FimOn
       |              THEN 1 + (h % (l // 3)) ELSE NULL END AS a,
       |         CASE WHEN l >= $MinChars AND doc_id % $FimMod < $FimOn
       |              THEN l - 1 - ((h // 64) % (l // 3)) ELSE NULL END AS b
       |  FROM base),
       |parts AS (
       |  SELECT doc_id, text, l, a, b,
       |         substr(text, 1, CAST(a AS INTEGER)) AS pfx,
       |         substr(text, CAST(a + 1 AS INTEGER), CAST(b - a AS INTEGER)) AS mid,
       |         substr(text, CAST(b + 1 AS INTEGER)) AS sfx
       |  FROM cuts)
       |SELECT doc_id,
       |       CASE WHEN a IS NULL THEN 'plain'
       |            WHEN doc_id % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode,
       |       CAST(coalesce(length(pfx), 0) AS BIGINT) AS n_prefix,
       |       CAST(coalesce(length(mid), 0) AS BIGINT) AS n_middle,
       |       CAST(coalesce(length(sfx), 0) AS BIGINT) AS n_suffix,
       |       CASE WHEN a IS NULL THEN text
       |            WHEN doc_id % 2 = 0
       |              THEN '$Pre' || pfx || '$Suf' || sfx || '$Mid' || mid
       |            ELSE '$Suf' || sfx || '$Pre' || pfx || '$Mid' || mid
       |       END AS fim_text
       |FROM parts
       |ORDER BY doc_id""".stripMargin, bench = true) { (s, d) =>
    val h = expr(Winnowing.polyFoldSpark("concat('fim:', CAST(doc_id AS STRING))"))
    val eligible = length(col("text")) >= MinChars &&
      col("doc_id") % FimMod < FimOn
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), length(col("text")).as("l"))
      .withColumn("h", h)
      // integer div/mod via SQL `div` (a `/` would silently go double)
      .withColumn("a",
        when(eligible, expr("1 + h % (CAST(l AS BIGINT) div 3)")))
      .withColumn("b",
        when(eligible,
          expr("CAST(l AS BIGINT) - 1 - ((h div 64) % (CAST(l AS BIGINT) div 3))")))
      .withColumn("pfx", expr("substring(text, 1, CAST(a AS INT))"))
      .withColumn("mid", expr("substring(text, CAST(a + 1 AS INT), CAST(b - a AS INT))"))
      .withColumn("sfx", expr("substring(text, CAST(b + 1 AS INT))"))
      .select(col("doc_id"),
        when(col("a").isNull, "plain")
          .when(col("doc_id") % 2 === 0, "psm").otherwise("spm").as("mode"),
        coalesce(length(col("pfx")), lit(0)).cast("long").as("n_prefix"),
        coalesce(length(col("mid")), lit(0)).cast("long").as("n_middle"),
        coalesce(length(col("sfx")), lit(0)).cast("long").as("n_suffix"),
        when(col("a").isNull, col("text"))
          .when(col("doc_id") % 2 === 0,
            concat(lit(Pre), col("pfx"), lit(Suf), col("sfx"), lit(Mid), col("mid")))
          .otherwise(
            concat(lit(Suf), col("sfx"), lit(Pre), col("pfx"), lit(Mid), col("mid")))
          .as("fim_text"))
      .orderBy("doc_id")
  }

  val entries: Seq[Entry] = Seq(b175)
}
