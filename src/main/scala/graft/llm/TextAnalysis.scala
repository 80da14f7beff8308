package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** Text-analysis operators for the training-data pipeline (SURVEY B45-B46
  * plus quality scoring, language stats, token counting, and document
  * fingerprinting from the driver's mandate).
  *
  * Scale posture: everything is explode → hash-aggregate; per-token rows
  * shuffle once on (group, term). df/idf corpora statistics are two
  * aggregates joined back — no driver materialization anywhere.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** B45 — tokenize / stopword-filter / word count: top-5 unigrams and
    * top-3 bigrams per language. */
  private val b45 = entry(
    "b45_text_tokens",
    s"""WITH toks AS (
       |  SELECT lang, unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents),
       |uni AS (
       |  SELECT lang, term, count(*) AS n FROM toks
       |  WHERE term <> '' AND term NOT IN ('the','a','of','and','to','in','is','it')
       |  GROUP BY lang, term),
       |w2 AS (
       |  SELECT lang, string_split(lower(text), ' ') AS w FROM documents),
       |bi AS (
       |  SELECT lang, unnest(list_transform(generate_series(1, len(w) - 1),
       |         i -> w[i] || ' ' || w[i+1])) AS term
       |  FROM w2 WHERE len(w) >= 2),
       |bic AS (SELECT lang, term, count(*) AS n FROM bi GROUP BY lang, term)
       |SELECT lang, kind, term, n, rn FROM (
       |  SELECT lang, 'unigram' AS kind, term, n,
       |         CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS INTEGER) AS rn
       |  FROM uni) u WHERE rn <= 5
       |UNION ALL
       |SELECT lang, kind, term, n, rn FROM (
       |  SELECT lang, 'bigram' AS kind, term, n,
       |         CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS INTEGER) AS rn
       |  FROM bic) b WHERE rn <= 3
       |ORDER BY lang, kind, rn""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("lang"),
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "" && !col("term").isin(stopwords: _*))
      .groupBy("lang", "term").agg(count(lit(1)).as("n"))
    val bi = docs.select(col("lang"), split(lower(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i+1]))")).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("n"))
    def topk(df: org.apache.spark.sql.DataFrame, kind: String, k: Int) = {
      val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("term"))
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select(col("lang"), lit(kind).as("kind"), col("term"), col("n"), col("rn"))
    }
    topk(toks, "unigram", 5).unionByName(topk(bi, "bigram", 3))
      .orderBy("lang", "kind", "rn")
  }

  /** B46 — TF-IDF: top-3 scored terms per document (probe docs only), with
    * corpus-wide document frequencies. idf = ln(N/df), unsmoothed, computed
    * identically both sides. */
  private val b46 = entry(
    "b46_text_tfidf",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf * ln(n.n * 1.0 / df.df) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n
      |  WHERE tf.doc_id % 100 = 0)
      |SELECT doc_id, term, round(score, 4) AS tfidf, rn FROM (
      |  SELECT doc_id, term, score,
      |         CAST(row_number() OVER (PARTITION BY doc_id
      |           ORDER BY score DESC, term) AS INTEGER) AS rn
      |  FROM scored) t
      |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin, bench = true) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = toks.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    // corpus size as a cross-joined 1-row aggregate (the oracle's CROSS
    // JOIN n shape): part of the plan, so no separate count() job — at
    // 100 TB the driver-side count was one whole extra metadata pass
    val n = Tables.documents(s, d).agg(count(lit(1)).cast("double").as("n"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.filter(col("doc_id") % 100 === 0)
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("n") / col("df")))
      .select(col("doc_id"), col("term"), col("score"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), round(col("score"), 4).as("tfidf"), col("rn"))
      .orderBy("doc_id", "rn")
  }

  /** Quality scoring + token counting + language stats (driver mandate):
    * per-document structural quality signals aggregated per (lang, source). */
  private val b45q = entry(
    "b45_text_quality",
    """WITH scored AS (
      |  SELECT lang, source,
      |         len(string_split(text, ' ')) AS n_tokens,
      |         len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe,
      |         n_chars,
      |         length(text) - length(replace(text, ' ', '')) AS n_spaces,
      |         CASE WHEN n_chars > 0
      |              THEN len(string_split(text, ' ')) * 1.0 / n_chars
      |              ELSE 0 END AS tokens_per_char
      |  FROM documents)
      |SELECT lang, source,
      |       count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |       CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
      |       round(avg(n_tokens), 4) AS avg_tokens,
      |       round(avg(n_chars), 4) AS avg_chars,
      |       round(avg(tokens_per_char), 4) AS avg_density,
      |       CAST(min(n_spaces) AS BIGINT) AS min_spaces
      |FROM scored GROUP BY lang, source ORDER BY lang, source""".stripMargin) { (s, d) =>
    val scored = Tables.documents(s, d)
      .select(col("lang"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).as("n_tokens"),
        // BPE-ish subword proxy: letter runs, digit runs, and solo symbols
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("n_bpe"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).as("n_spaces"))
      .withColumn("tokens_per_char",
        when(col("n_chars") > 0, col("n_tokens").cast("double") / col("n_chars"))
          .otherwise(0.0))
    scored.groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        sum(col("n_bpe")).cast("long").as("total_bpe_tokens"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        round(avg(col("tokens_per_char")), 4).as("avg_density"),
        min(col("n_spaces")).cast("long").as("min_spaces"))
      .orderBy("lang", "source")
  }

  /** Document fingerprinting (driver mandate): order-sensitive rolling
    * fingerprint (40-bit polynomial fold over character codes — the
    * cross-engine hash from [[Winnowing.PolyGramHash]]'s family), SHA-256
    * content digest, and a vowel-ratio language signal. ALL THREE are
    * deterministic and dialect-portable, so this is fully t2 hash-matched
    * (r01 ran it rows-only with xxhash64; SHA-256 and the polynomial fold
    * hash identically in DuckDB). The engine-native 64-bit path
    * (xxhash64) stays the scale default elsewhere (e.g. MinHash). */
  private val b45f = entry(
    "b45_text_fingerprint",
    s"""SELECT doc_id,
      |       CASE WHEN text IS NULL THEN NULL
      |            WHEN length(text) = 0 THEN 0 ELSE
      |         ${Winnowing.polyFoldDuck("text")}
      |       END AS fingerprint,
      |       sha256(text) AS content_sha,
      |       round(length(regexp_replace(text, '[^aeiou]', '', 'g')) /
      |             greatest(length(text), 1), 4) AS vowel_ratio
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(length(col("text")) === 0, lit(0L))
          .otherwise(expr(Winnowing.polyFoldSpark("text")))
          .as("fingerprint"),
        sha2(col("text"), 256).as("content_sha"),
        round(length(regexp_replace(col("text"), "[^aeiou]", "")).cast("double") /
          greatest(length(col("text")), lit(1)), 4).as("vowel_ratio"))
      .orderBy("doc_id")
  }

  /** Winnowing fingerprint containment (driver mandate "document
    * fingerprinting (rolling hash)"): probe docs (doc_id % 100 == 0)
    * checked for shared rolling-hash fingerprints against the corpus —
    * the contamination-detection shape. Runs on the cross-engine
    * polynomial gram hash so the ENTIRE pipeline (per-position k-gram
    * hash → sliding window minima → distinct → inverted-index join) is t2
    * hash-matched; the xxhash64 gram hash stays the scale default
    * ([[Winnowing.XxGramHash]]) with guarantees proven in WinnowingSpec. */
  private val b45w = entry(
    "b45_text_winnowing",
    s"""WITH probe_grams AS (
      |  SELECT doc_id, i AS pos,
      |         list_reduce(list_prepend(0::BIGINT,
      |           list_transform(generate_series(i, i + 4), j -> ascii(substr(text, j, 1)))),
      |           (a, c) -> (a * 31 + c) & ${Winnowing.PolyMask}) AS h
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 4)) AS i
      |        FROM documents WHERE length(text) >= 5 AND doc_id % 100 = 0)),
      |corpus_grams AS (
      |  SELECT doc_id, i AS pos,
      |         list_reduce(list_prepend(0::BIGINT,
      |           list_transform(generate_series(i, i + 4), j -> ascii(substr(text, j, 1)))),
      |           (a, c) -> (a * 31 + c) & ${Winnowing.PolyMask}) AS h
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 4)) AS i
      |        FROM documents WHERE length(text) >= 5)),
      |pf AS (
      |  SELECT DISTINCT doc_id AS probe_id, fp FROM (
      |    SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp FROM probe_grams)),
      |cf AS (
      |  SELECT DISTINCT doc_id AS corpus_id, fp FROM (
      |    SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp FROM corpus_grams))
      |SELECT probe_id, corpus_id, count(*) AS n_shared
      |FROM pf JOIN cf USING (fp)
      |WHERE probe_id <> corpus_id
      |GROUP BY probe_id, corpus_id
      |HAVING count(*) >= 2
      |ORDER BY probe_id, corpus_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    Winnowing.sharedFingerprints(
        docs.filter(col("doc_id") % 100 === 0), docs, minShared = 2,
        gramHash = Winnowing.PolyGramHash)
      .orderBy("probe_id", "corpus_id")
  }

  /** Deterministic hash-based train/val/test split (training-data pipeline
    * staple): bucket = polyhash(doc_id as text) % 100 → 80/10/10. Unlike
    * seeded rand(), the assignment is a pure function of the KEY — stable
    * across reruns, engines, partitionings, and cluster sizes, which is
    * what makes a 100 TB split reproducible and incrementally extendable
    * (new docs join their split without reshuffling old ones). The
    * cross-dialect hash makes the whole split t2 hash-matched. */
  private val b56 = entry(
    "b56_sample_hashsplit",
    s"""WITH assigned AS (
       |  SELECT doc_id, lang, n_chars,
       |         ${Winnowing.polyFoldDuck("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
       |  FROM documents)
       |SELECT CASE WHEN bucket < 80 THEN 'train'
       |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       |       count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |       count(DISTINCT lang) AS n_langs,
       |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM assigned GROUP BY 1 ORDER BY split""".stripMargin) { (s, d) =>
    val bucket = expr(
      s"${Winnowing.polyFoldSpark("CAST(doc_id AS STRING)")} % 100")
    Tables.documents(s, d)
      .withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("split")
  }

  /** B57 — the capstone training-data pipeline as ONE composed query:
    * quality gate → exact dedup (keep min doc_id per content hash) → hash
    * split → per-(split, lang) corpus stats. Every stage is a deterministic
    * operator already covered individually (B45q, B42, B56); this entry
    * pins that they COMPOSE into the end-to-end job a user would actually
    * run, oracle-checked as a whole. Plan shape: one narrow projection +
    * one dedup aggregate + one stats aggregate — two shuffles total, no
    * driver materialization, unchanged at 100 TB. */
  private val b57 = entry(
    "b57_llm_pipeline",
    s"""WITH all_docs AS (
       |  SELECT doc_id, lang, text, n_chars FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, lang, text, n_chars
       |  FROM documents WHERE doc_id % 7 = 0),
       |gated AS (
       |  SELECT doc_id, lang, text, n_chars,
       |         len(string_split(text, ' ')) AS n_tokens
       |  FROM all_docs
       |  WHERE n_chars >= 100
       |    AND len(string_split(text, ' ')) * 1.0 / n_chars BETWEEN 0.05 AND 0.5),
       |deduped AS (
       |  SELECT min(doc_id) AS doc_id,
       |         min_by(lang, doc_id) AS lang,
       |         min_by(n_chars, doc_id) AS n_chars,
       |         min_by(n_tokens, doc_id) AS n_tokens
       |  FROM gated GROUP BY sha256(text)),
       |split_assigned AS (
       |  SELECT lang, n_chars, n_tokens,
       |         CASE WHEN bucket < 80 THEN 'train'
       |              WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT *,
       |          ${Winnowing.polyFoldDuck("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
       |        FROM deduped))
       |SELECT split, lang, count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |       round(CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE) / count(*), 4) AS avg_tokens
       |FROM split_assigned GROUP BY split, lang ORDER BY split, lang""".stripMargin) { (s, d) =>
    // duplicates are INJECTED (as in b42) so the dedup stage observably
    // executes — the raw corpus has no exact dups, and a pipeline whose
    // dedup stage is a no-op would hash-match even if that stage broke
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
    val withDups = base.unionByName(
      base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          col("text"), col("n_chars")))
    val gated = withDups
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .filter(col("n_chars") >= 100 &&
        (col("n_tokens").cast("double") / col("n_chars")).between(0.05, 0.5))
    val deduped = gated
      .groupBy(sha2(col("text"), 256))
      .agg(
        min(col("doc_id")).as("doc_id"),
        min_by(col("lang"), col("doc_id")).as("lang"),
        min_by(col("n_chars"), col("doc_id")).as("n_chars"),
        min_by(col("n_tokens"), col("doc_id")).as("n_tokens"))
    val bucket = expr(
      s"${Winnowing.polyFoldSpark("CAST(doc_id AS STRING)")} % 100")
    deduped
      .withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      .groupBy("split", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        round(sum(col("n_tokens")).cast("double") / count(lit(1)), 4).as("avg_tokens"))
      .orderBy("split", "lang")
  }

  private val unicodeCsv = "/root/repo/fixtures/csv/unicode_probe.csv"

  /** B45± — cross-engine fold lock on NON-ASCII text (the charset-proof
    * claim the b45f/b47d folds rely on, pinned on data instead of assumed):
    * the 40-bit polynomial fold and the windowed 5-gram fold minimum,
    * evaluated by both engines over a fixture containing accented Latin,
    * CJK, and supplementary-plane (astral: 𝄞, 😀) codepoints. Both engines
    * count CODEPOINTS in length()/substr() and return full codepoints from
    * ascii() — including astral (verified: ascii('𝄞') = 119070 in Spark
    * and DuckDB) — which is exactly what [[Winnowing.polyFoldString]]'s
    * codePoints iterator matches on the JVM side. */
  private val b45u = entry(
    "b45_fold_unicode",
    s"""SELECT probe_id, length(text) AS n_chars,
       |       ${Winnowing.polyFoldDuck("text")} AS fold40,
       |       list_min(list_transform(generate_series(1, length(text) - ${Winnowing.K - 1}),
       |         i -> list_reduce(list_prepend(0::BIGINT,
       |                list_transform(generate_series(i, i + ${Winnowing.K - 1}),
       |                               j -> ascii(substr(text, j, 1)))),
       |              (a, c) -> (a * 31 + c) & ${Winnowing.PolyMask}))) AS min_gram40
       |FROM read_csv('$unicodeCsv', header=true,
       |              columns={probe_id: 'BIGINT', text: 'VARCHAR'})
       |WHERE length(text) >= ${Winnowing.K}
       |ORDER BY probe_id""".stripMargin) { (s, _) =>
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("probe_id", LongType), StructField("text", StringType)))
    // length >= K guard in BOTH dialects: below it, Spark's
    // sequence(1, len-4) would run BACKWARDS (auto negative step) while
    // DuckDB's generate_series yields empty — a silent divergence if a
    // short fixture row were ever added
    s.read.option("header", "true").schema(schema).csv(unicodeCsv)
      .filter(length(col("text")) >= Winnowing.K)
      .select(col("probe_id"), length(col("text")).as("n_chars"),
        expr(Winnowing.polyFoldSpark("text")).as("fold40"),
        expr(s"""array_min(transform(sequence(1, length(text) - ${Winnowing.K - 1}),
                |                    i -> ${Winnowing.PolyGramHash}))""".stripMargin)
          .as("min_gram40"))
      .orderBy("probe_id")
  }

  /** B85 — repetition-based quality signals (the Gopher/MassiveText rules,
    * word-grain since the synthetic corpus has no line structure): per-doc
    * duplicate-word mass and most-frequent-bigram mass, rolled up per
    * language with an integer-threshold flag count. The output carries
    * exact BIGINT masses, never per-doc float fractions (the b58 rule:
    * a ratio at a rounding boundary is the b22 trap; callers divide).
    * Thresholds as integer cross-products: dup_frac > 0.7 ⇔ 10·(n−nd) >
    * 7·n, top_bigram_frac > 0.18 ⇔ 100·2·top > 18·n ⇔ 100·top > 9·n.
    *
    * Plan shape: word stats are map-side array ops (no explode); only the
    * bigram mode needs a (doc, bigram) explode + two-level agg — the
    * LangId profile shape, shuffle ∝ distinct bigrams per doc. Docs with
    * <2 words have no bigram: left join + zero-fill, identical in both
    * dialects. */
  private val b85 = entry(
    "b85_text_repetition",
    """WITH w AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
      |stats AS (
      |  SELECT doc_id, lang, len(words) AS n, len(list_distinct(words)) AS nd
      |  FROM w),
      |big AS (
      |  SELECT doc_id,
      |         unnest(list_transform(generate_series(1, len(words) - 1),
      |                i -> words[i] || ' ' || words[i + 1])) AS bg
      |  FROM w WHERE len(words) >= 2),
      |topb AS (
      |  SELECT doc_id, max(c) AS top_cnt FROM (
      |    SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2) t
      |  GROUP BY doc_id),
      |m AS (
      |  SELECT s.doc_id, s.lang, s.n, s.nd,
      |         coalesce(tb.top_cnt, 0) AS top_cnt
      |  FROM stats s LEFT JOIN topb tb ON s.doc_id = tb.doc_id)
      |SELECT lang, count(*) AS docs,
      |       CAST(sum(n) AS BIGINT) AS total_words,
      |       CAST(sum(n - nd) AS BIGINT) AS dup_word_mass,
      |       CAST(sum(top_cnt) AS BIGINT) AS top_bigram_mass,
      |       CAST(sum(CASE WHEN 10 * (n - nd) > 7 * n
      |                       OR 100 * top_cnt > 9 * n
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS flagged
      |FROM m GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val w = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("words"))
    val stats = w.select(col("doc_id"), col("lang"),
      size(col("words")).as("n"),
      size(array_distinct(col("words"))).as("nd"))
    val big = w.filter(size(col("words")) >= 2)
      .select(col("doc_id"), explode_outer(expr(
        """transform(sequence(0, size(words) - 2),
          |          i -> concat(words[i], ' ', words[i + 1]))""".stripMargin)).as("bg"))
    val topb = big.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_cnt"))
    stats.join(topb, Seq("doc_id"), "left")
      .na.fill(0L, Seq("top_cnt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        sum(col("n")).cast("long").as("total_words"),
        sum(col("n") - col("nd")).cast("long").as("dup_word_mass"),
        sum(col("top_cnt")).cast("long").as("top_bigram_mass"),
        sum(when(lit(10) * (col("n") - col("nd")) > lit(7) * col("n") ||
                 lit(100) * col("top_cnt") > lit(9) * col("n"), 1L)
          .otherwise(0L)).cast("long").as("flagged"))
      .orderBy("lang")
  }

  val entries: Seq[Entry] = Seq(b45, b45q, b45f, b45w, b45u, b46, b56, b57, b85)
}
