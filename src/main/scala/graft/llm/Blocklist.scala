package graft.llm

import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** B182 — DICTIONARY BLOCKLIST FILTER (the C4 "bad words" pass, Raffel
  * et al. JMLR'20 §2.2 / the LDNOOBW list every web pipeline ships): drop
  * or flag documents by a term DICTIONARY with severity tiers — any
  * SEVERE term drops the document outright; MILD terms drop it only when
  * their density crosses [[ThrBp]] basis points of the token count;
  * everything else keeps with audit counts (the audit table is what a
  * governance review reads — silently vanished documents are how
  * filtering bugs ship).
  *
  * This is deliberately NOT b64's regex shape: a production blocklist is
  * thousands of terms, and N regex passes over 100 TB is the wrong plan —
  * the dictionary pass tokenizes once and hash-joins tokens against the
  * BROADCAST blocklist (word-boundary match for free), so cost is one
  * map-side explode + a doc-keyed rollup regardless of dictionary size.
  * The blocklist here reuses corpus vocabulary (the synthetic corpus
  * carries nothing genuinely blockable — the b64 make-it-bite pattern,
  * inverted: block ordinary words so every tier is exercised).
  *
  * Integer-exact: occurrence counts, density in bp by BIGINT floor
  * division, the drop rule as pure boolean algebra over counts; the
  * severity join is engine-shared VALUES.
  *
  * Scale posture: explode → broadcast hash join (the dictionary never
  * shuffles the corpus) → map-combinable per-doc rollup → one left join
  * back to the doc base. No windows, no driver traffic. */
object Blocklist {

  /** (term, severity): 2 = severe (zero tolerance), 1 = mild (density). */
  val Terms: Seq[(String, Int)] =
    Seq(("scan", 2), ("agg", 1), ("stream", 1))

  /** Mild-density drop threshold, basis points of n_tok. */
  val ThrBp = 800L

  private def valuesSql = Terms
    .map { case (t, s) => s"('$t', ${s}::BIGINT)" }.mkString(", ")

  private val b182 = entry(
    "b182_blocklist_filter",
    s"""WITH bl(term, sev) AS (VALUES $valuesSql),
       |toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |base AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |hits AS (
       |  SELECT t.doc_id,
       |         CAST(sum(CASE WHEN b.sev = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_mild,
       |         CAST(sum(CASE WHEN b.sev = 2 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_severe
       |  FROM toks t JOIN bl b ON b.term = t.term
       |  GROUP BY t.doc_id)
       |SELECT b.doc_id, b.n_tok,
       |       coalesce(h.n_mild, 0) AS n_mild,
       |       coalesce(h.n_severe, 0) AS n_severe,
       |       coalesce(h.n_mild, 0) * 10000 // b.n_tok AS mild_bp,
       |       CASE WHEN coalesce(h.n_severe, 0) > 0
       |              OR coalesce(h.n_mild, 0) * 10000 // b.n_tok >= $ThrBp
       |            THEN 'drop' ELSE 'keep' END AS action
       |FROM base b LEFT JOIN hits h ON h.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin, bench = true) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val bl = Terms.toDF("term", "sev")
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val hits = toks.join(broadcast(bl), "term")
      .groupBy("doc_id")
      .agg(sum(when(col("sev") === 1, 1L).otherwise(0L)).as("n_mild"),
        sum(when(col("sev") === 2, 1L).otherwise(0L)).as("n_severe"))
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_mild"), lit(0L)).as("n_mild"),
        coalesce(col("n_severe"), lit(0L)).as("n_severe"))
      .withColumn("mild_bp", expr("n_mild * 10000 div n_tok"))
      .withColumn("action",
        when(col("n_severe") > 0 || col("mild_bp") >= ThrBp, "drop")
          .otherwise("keep"))
      .orderBy("doc_id")
  }

  val entries: Seq[Entry] = Seq(b182)
}
