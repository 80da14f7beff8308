package graft.llm

import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** B64 — PII redaction: scrub email addresses and phone numbers out of a
  * text corpus before it becomes training data — a mandatory pass in any
  * real LLM data pipeline (and the inverse of extraction: the match count
  * per class is kept as an audit column).
  *
  * The synthetic corpus contains no PII, so each document gets a
  * deterministic PII suffix injected (an email and a phone derived from
  * doc_id) — the same make-the-operator-bite pattern as B42's injected
  * duplicates — and the redactor must then remove exactly that.
  *
  * Regex dialect: patterns restricted to the syntax Java regex (Spark)
  * and RE2 (DuckDB) interpret identically — explicit character classes,
  * bounded repetition, no backrefs/lookaround (RE2 has neither), no \d or
  * \b shorthands. Both engines replace ALL occurrences (DuckDB needs the
  * explicit 'g' flag).
  *
  * Scale posture: pure map-side work — the regex runs inside the scan's
  * codegen stage (RegExpReplace is a codegen'd Catalyst expression over a
  * compiled-once Pattern), no shuffle except the t2 determinism ORDER BY.
  * 100 TB of text redacts at scan throughput.
  */
object Redact {

  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePat = "\\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"

  private val b64 = entry(
    "b64_text_redact",
    s"""WITH pii AS (
       |  SELECT doc_id,
       |         text || ' contact user' || CAST(doc_id AS VARCHAR)
       |              || '@example.com or call +1 555-'
       |              || lpad(CAST((doc_id * 7919) % 10000 AS VARCHAR), 4, '0') AS text
       |  FROM documents)
       |SELECT doc_id,
       |       regexp_replace(regexp_replace(text,
       |         '$emailPat', '<EMAIL>', 'g'),
       |         '$phonePat', '<PHONE>', 'g') AS red_text,
       |       len(regexp_extract_all(text, '$emailPat')) AS n_emails,
       |       len(regexp_extract_all(text, '$phonePat')) AS n_phones
       |FROM pii ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pii = Tables.documents(s, d).select(
      col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or call +1 555-"),
        lpad(((col("doc_id") * 7919) % 10000).cast("string"), 4, "0")).as("text"))
    pii.select(
      col("doc_id"),
      regexp_replace(regexp_replace(col("text"), emailPat, "<EMAIL>"),
        phonePat, "<PHONE>").as("red_text"),
      regexp_count(col("text"), lit(emailPat)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(phonePat)).cast("long").as("n_phones"))
      .orderBy("doc_id")
  }

  val entries: Seq[Entry] = Seq(b64)
}
