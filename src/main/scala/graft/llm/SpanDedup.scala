package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** Repeated-span removal (SURVEY §2B round-6 row B93): corpus-wide EXACT
  * substring dedup at word-k-gram granularity — the ExactSubstr pass of
  * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
  * Better"), which removes verbatim re-used spans WITHIN documents that
  * are otherwise distinct (doc-level dedup like B42/B43/B90 never sees
  * them). Their suffix-array machinery is a single-node construction;
  * the distributed equivalent is fixed-width span fingerprints: every
  * word-5-gram occurrence in the corpus is keyed, and every occurrence
  * EXCEPT the globally first (by doc_id, then position) of a gram that
  * occurs more than once has its 5 word positions deleted from its
  * document. Exact by construction → fully SQL-expressible → t2-checked.
  *
  * Scale posture: the only corpus-wide state is the per-gram occurrence
  * relation — one shuffle keyed on the gram (at 100 TB the key drops to
  * xxhash64(gram), the MinHashLsh 8-byte rule; strings are kept here so
  * the oracle compares exactly). First-occurrence selection is a
  * min-struct aggregate per gram — map-side combinable, state O(1) per
  * gram — NOT a row_number window (which would sort whole hot-gram
  * partitions). Position deletion and text reassembly are per-document
  * (explode → anti join → sorted re-join), no cross-doc state. The
  * output is proportional to the corpus, the intermediate to the span
  * count (≈ words × 1).
  */
object SpanDedup {

  val SpanWords = 5

  /** (doc_id, pos, word) — 0-based word positions. */
  private def words(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("word"))

  /** (doc_id, pos, gram) — every word-k-gram occurrence, pos = 0-based
    * start. Docs shorter than k words contribute none (and can't contain
    * a duplicated span). */
  private def spans(docs: DataFrame, k: Int = SpanWords): DataFrame =
    docs.withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), posexplode_outer(expr(
        s"""transform(sequence(0, size(w) - $k),
           |          i -> array_join(slice(w, i + 1, $k), ' '))""".stripMargin)))
      .select(col("doc_id"), col("pos"), col("col").as("gram"))

  /** Cleaned corpus: every non-first occurrence of a corpus-duplicated
    * span has its word positions removed; text is reassembled from the
    * survivors. Output: (doc_id, n_words, n_removed, clean_text), one row
    * per input doc (a fully-deleted doc keeps its row with empty text).
    *
    * `hashedGramKey` is the 100 TB path (the MinHashLsh 8-byte rule): the
    * gram SHUFFLE key becomes xxhash64(gram) — the string is hashed
    * map-side and never crosses the wire — at the cost of the documented
    * 2^-64-per-pair collision (two distinct grams merging would delete a
    * coincidental span). The t2 entry keeps strings so the oracle
    * compares exactly; equality of the two paths on real data is pinned
    * in CorpusCleanSpec. */
  def removeRepeatedSpans(docs: DataFrame, hashedGramKey: Boolean = false,
      materializeOcc: Boolean = true): DataFrame = {
    val occ0 = spans(docs)
    val occKeyed =
      if (hashedGramKey) occ0.withColumn("gram", xxhash64(col("gram")))
      else occ0
    // occ is consumed TWICE (the gram-stats aggregate and the dup join),
    // so the lazy plan re-runs the corpus-wide posexplode per consumer.
    // Materializing the one pass (eager localCheckpoint) measured b93
    // 2.53 → 2.05 s at sf0.1 INCLUDING the checkpoint build (r7 A/B).
    // 100 TB: with hashedGramKey the materialized relation is 16-byte
    // rows ≈ corpus-sized, the standard two-pass disk trade; set
    // materializeOcc = false to keep the pure recompute form (results
    // identical either way — pinned in CorpusCleanSpec).
    val occ = if (materializeOcc) occKeyed.localCheckpoint(true) else occKeyed
    // per-gram (count, first occurrence) as ONE map-side-combinable
    // aggregate — min over struct(doc_id, pos) is the global (doc, pos)
    // order because doc_id is the struct's leading field
    val gramStats = occ.groupBy("gram").agg(
      count(lit(1)).as("cnt"),
      min(struct(col("doc_id"), col("pos"))).as("first"))
    val dupOcc = occ.join(gramStats, "gram")
      .filter(col("cnt") > 1 &&
        !(col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos")))
      .select(col("doc_id"), col("pos"))
    val covered = dupOcc
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(SpanWords - 1))).as("pos"))
      .distinct()
    rebuildWithout(docs, covered)
  }

  /** The reassembly law shared by B93 and B244: delete `covered`
    * (doc_id, pos) word positions, stitch survivors back in position
    * order. One row per input doc — a fully-deleted doc keeps its row
    * with empty text; n_removed + n_kept = n_words by construction. */
  private def rebuildWithout(docs: DataFrame, covered: DataFrame): DataFrame = {
    val kept = words(docs).join(covered, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      array_join(expr(
        "transform(array_sort(collect_list(struct(pos, word))), e -> e.word)"), " ")
        .as("clean_text"))
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** B93 — repeated-span removal over the dup-injected corpus (every 7th
    * doc re-appears shifted by 1e6, so every one of its spans is a
    * non-first duplicate and the copy must clean to empty — while organic
    * cross-doc 5-gram repeats, if any, are removed surgically). */
  private val b93 = entry(
    "b93_dedup_spans",
    s"""WITH all_docs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
       |dw AS (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs),
       |words AS (
       |  SELECT doc_id, u['pos'] AS pos, u['word'] AS word FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)),
       |      i -> {'pos': i - 1, 'word': w[i]})) AS u
       |    FROM dw)),
       |occ AS (
       |  SELECT doc_id, u['pos'] AS pos, u['gram'] AS gram FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      generate_series(1, len(w) - ${SpanWords - 1}),
       |      i -> {'pos': i - 1,
       |            'gram': array_to_string(w[i:i + ${SpanWords - 1}], ' ')})) AS u
       |    FROM dw WHERE len(w) >= $SpanWords)),
       |gram_stats AS (
       |  SELECT gram, count(*) AS cnt,
       |         min(struct_pack(doc_id := doc_id, pos := pos)) AS first
       |  FROM occ GROUP BY gram),
       |dup_occ AS (
       |  SELECT o.doc_id, o.pos
       |  FROM occ o JOIN gram_stats g USING (gram)
       |  WHERE g.cnt > 1
       |    AND NOT (o.doc_id = g.first['doc_id'] AND o.pos = g.first['pos'])),
       |covered AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(generate_series(pos, pos + ${SpanWords - 1})) AS pos
       |  FROM dup_occ),
       |kept AS (
       |  SELECT w.doc_id, w.pos, w.word FROM words w
       |  ANTI JOIN covered c ON w.doc_id = c.doc_id AND w.pos = c.pos),
       |rebuilt AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |         string_agg(word, ' ' ORDER BY pos) AS clean_text
       |  FROM kept GROUP BY doc_id)
       |SELECT d.doc_id, len(w) AS n_words,
       |       len(w) - coalesce(r.n_kept, 0) AS n_removed,
       |       coalesce(r.clean_text, '') AS clean_text
       |FROM dw d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
       |ORDER BY d.doc_id""".stripMargin, bench = true) { (s, d) =>
    removeRepeatedSpans(TextDedup.docsWithDups(s, d))
  }

  // ---- B244: minimum-length exact substring dedup (Lee et al. '22) ----

  /** B244's seed-gram width. */
  val GramK = 10

  /** Minimum verbatim-repeat length (tokens) for removal — Lee et al.'s
    * ExactSubstr removes only LONG repeats (their threshold is 50 BPE
    * tokens); B93's k-gram pass has no length floor, so it also deletes
    * short common phrases ("of the end of the"), which over-removes on
    * natural text. 30 words here (their 50 BPE tokens ≈ 35 words; 30
    * keeps the gate exercised by the fixture's doc lengths). */
  val MinSpanTokens = 30

  /** A repeated region of ≥ [[MinSpanTokens]] tokens ⟺ a run of ≥
    * MinSpanTokens − GramK + 1 CONSECUTIVE duplicated gram starts. */
  val MinRun: Int = MinSpanTokens - GramK + 1

  /** Maximal-run exact substring dedup: every non-first occurrence of a
    * duplicated [[GramK]]-gram is a candidate, candidates coalesce into
    * maximal consecutive-position runs per doc (gaps-and-islands on a
    * doc-PARTITIONED window — never a global one), and only runs
    * spanning ≥ [[MinSpanTokens]] tokens are excised; the first
    * occurrence of every span survives (the min-struct convention B93
    * established). This is the distributed spelling of Lee et al. 2022's
    * ExactSubstr semantics — their suffix array finds maximal repeats ≥ L
    * on one node; the shingle-position posting join + island coalescing
    * finds the same regions (over-approximating only where DISTINCT
    * repeat sources overlap within one gram width) with corpus-scale
    * shuffles keyed on the gram.
    *
    * Scale posture: identical cost classes to B93 — one gram-keyed
    * shuffle (8-byte xxhash64 keys on the 100 TB path, strings here so
    * the oracle compares exactly), one map-combinable gram-stats
    * aggregate, per-doc windows and joins after that; the island window
    * state is O(1) per row. Runs and covered positions are proportional
    * to the DUPLICATED text mass, not the corpus. */
  def removeLongRepeats(docs: DataFrame): DataFrame = {
    val occ = spans(docs, GramK).localCheckpoint(true) // two consumers (b93 note)
    val gramStats = occ.groupBy("gram").agg(
      count(lit(1)).as("cnt"),
      min(struct(col("doc_id"), col("pos"))).as("first"))
    val dup = occ.join(gramStats, "gram")
      .filter(col("cnt") > 1 &&
        !(col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos")))
      .select(col("doc_id"), col("pos"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = dup
      .withColumn("island", col("pos") - row_number().over(wDoc))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("p0"), max("pos").as("p1"), count(lit(1)).as("len"))
      .filter(col("len") >= MinRun)
    val covered = runs
      .select(col("doc_id"),
        explode(sequence(col("p0"), col("p1") + lit(GramK - 1))).as("pos"))
      .distinct()
    rebuildWithout(docs, covered)
  }

  /** The B244 fixture: the corpus plus PLANTED overlaps proving the
    * length threshold in both directions — every 9th doc re-appears as a
    * 40-token verbatim prefix plus a unique marker (≥ MinSpanTokens ⇒ the
    * copy's head must excise, the marker and the ORIGINAL must survive),
    * and every 11th doc re-appears as a 12-token prefix plus a marker
    * (< MinSpanTokens ⇒ nothing may be removed, where B93 would delete
    * it). */
  def plantedLongShort(docs: DataFrame): DataFrame = {
    val dw = docs.withColumn("w", split(col("text"), " "))
    val long = dw.filter(col("doc_id") % 9 === 0 && size(col("w")) >= 40)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(array_join(slice(col("w"), 1, 40), " "),
          lit(" zz"), col("doc_id").cast("string")).as("text"))
    val short = dw.filter(col("doc_id") % 11 === 0 && size(col("w")) >= 12)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(array_join(slice(col("w"), 1, 12), " "),
          lit(" qq"), col("doc_id").cast("string")).as("text"))
    docs.select(col("doc_id"), col("text"))
      .unionByName(long).unionByName(short)
  }

  private val b244 = entry(
    "b244_exact_substr_dedup",
    s"""WITH dw0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |aug AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000,
       |         array_to_string(w[1:40], ' ') || ' zz' || CAST(doc_id AS VARCHAR)
       |  FROM dw0 WHERE doc_id % 9 = 0 AND len(w) >= 40
       |  UNION ALL
       |  SELECT doc_id + 4000000,
       |         array_to_string(w[1:12], ' ') || ' qq' || CAST(doc_id AS VARCHAR)
       |  FROM dw0 WHERE doc_id % 11 = 0 AND len(w) >= 12),
       |dw AS (SELECT doc_id, string_split(text, ' ') AS w FROM aug),
       |words AS (
       |  SELECT doc_id, u['pos'] AS pos, u['word'] AS word FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)),
       |      i -> {'pos': i - 1, 'word': w[i]})) AS u
       |    FROM dw)),
       |occ AS (
       |  SELECT doc_id, u['pos'] AS pos, u['gram'] AS gram FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      generate_series(1, len(w) - ${GramK - 1}),
       |      i -> {'pos': i - 1,
       |            'gram': array_to_string(w[i:i + ${GramK - 1}], ' ')})) AS u
       |    FROM dw WHERE len(w) >= $GramK)),
       |gram_stats AS (
       |  SELECT gram, count(*) AS cnt,
       |         min(struct_pack(doc_id := doc_id, pos := pos)) AS first
       |  FROM occ GROUP BY gram),
       |dup AS (
       |  SELECT o.doc_id, o.pos
       |  FROM occ o JOIN gram_stats g USING (gram)
       |  WHERE g.cnt > 1
       |    AND NOT (o.doc_id = g.first['doc_id'] AND o.pos = g.first['pos'])),
       |runs AS (
       |  SELECT doc_id, island, min(pos) AS p0, max(pos) AS p1
       |  FROM (
       |    SELECT doc_id, pos,
       |           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
       |             AS island
       |    FROM dup)
       |  GROUP BY doc_id, island HAVING count(*) >= $MinRun),
       |covered AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(generate_series(p0, p1 + ${GramK - 1})) AS pos
       |  FROM runs),
       |kept AS (
       |  SELECT w.doc_id, w.pos, w.word FROM words w
       |  ANTI JOIN covered c ON w.doc_id = c.doc_id AND w.pos = c.pos),
       |rebuilt AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |         string_agg(word, ' ' ORDER BY pos) AS clean_text
       |  FROM kept GROUP BY doc_id)
       |SELECT d.doc_id, len(w) AS n_words,
       |       len(w) - coalesce(r.n_kept, 0) AS n_removed,
       |       coalesce(r.clean_text, '') AS clean_text
       |FROM dw d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
       |ORDER BY d.doc_id""".stripMargin, bench = true) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    // the b171 headroom rule: plant ids must not collide with real ones
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    require(maxId < 2000000L,
      s"b244 plant-id offsets exhausted: max(doc_id) = $maxId >= 2000000")
    removeLongRepeats(plantedLongShort(docs))
  }

  val entries: Seq[Entry] = Seq(b93, b244)
}
