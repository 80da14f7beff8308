package graft.llm

import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** B302 — COMPRESSION-RATIO QUALITY SIGNAL (VERDICT r18 "what's missing"
  * #3: the classic Gopher/CCNet quality trio is structural rules (b45q),
  * model perplexity (b95), and COMPRESSIBILITY — near-duplicate spam and
  * template text compress far better than prose, so a high LZ-style
  * repeat mass is a strong low-quality marker even when line-level rules
  * pass).
  *
  * The signal is an EXACT repeat-mass proxy for LZ77 match density
  * (true DEFLATE output size is engine-local → would be rows-only; this
  * is the same quantity the compressor's match finder counts, made
  * integer-exact): a word-3-gram position is REPEAT MASS iff the same
  * 3-gram occurred within the previous [[RepeatWindow]] = 32 gram
  * positions (the sliding dictionary). `repeat_bp` = repeats·10⁴ div
  * n_grams; `low_entropy` fires at ≥ [[LowEntropyBp]].
  *
  * Engine side is ONE fused map-side projection — the whole signal is
  * higher-order functions over the split array (transform → filter →
  * exists), zero exchanges before the presentation sort; at 100 TB it
  * rides the scan like b45q's rules. The oracle spells the identical
  * semantics relationally (explode grams → lag over (doc, gram) → gap ≤
  * window), which is equal because the nearest previous occurrence is the
  * only one that can be inside the window.
  *
  * Planted low-entropy docs: every doc with doc_id % [[PlantMod]] = 4 is
  * re-scored as a 'plant' leg whose text is its own first 6 words tiled
  * to (roughly) original length — template spam. Every gram position ≥ 6
  * of the tile repeats at distance 6 ≤ 32, so the plant's repeat_bp is
  * ≥ 6250 by construction and the signal MUST fire (QualityEnsembleSpec
  * pins this, plus separation on the clean corpus).
  */
object CompressionQuality {

  /** Sliding-dictionary width in gram positions (LZ77 window). */
  val RepeatWindow = 32

  /** Fire threshold, basis points of gram positions that are repeat
    * mass. */
  val LowEntropyBp = 3000L

  /** Every PlantMod-th doc gets a tiled-spam plant leg. */
  val PlantMod = 9L

  private val b302 = entry(
    "b302_compression_quality",
    s"""WITH base AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS w,
       |         len(string_split(text, ' ')) AS n
       |  FROM documents),
       |legs AS (
       |  SELECT 'clean' AS leg, doc_id, text FROM base
       |  UNION ALL
       |  SELECT 'plant', doc_id,
       |         trim(repeat(array_to_string(w[1:6], ' ') || ' ',
       |                     greatest(n // 6, 3)))
       |  FROM base WHERE doc_id % $PlantMod = 4),
       |lw AS (SELECT leg, doc_id, string_split(text, ' ') AS w FROM legs),
       |g AS (
       |  SELECT leg, doc_id,
       |         list_transform(generate_series(1, len(w) - 2),
       |           i -> array_to_string(w[i:i + 2], ' ')) AS grams
       |  FROM lw WHERE len(w) >= 3),
       |pos AS (
       |  SELECT leg, doc_id, UNNEST(range(len(grams))) AS p,
       |         UNNEST(grams) AS gram
       |  FROM g),
       |rp AS (
       |  SELECT leg, doc_id, p,
       |         p - lag(p) OVER (PARTITION BY leg, doc_id, gram ORDER BY p)
       |           AS gap
       |  FROM pos),
       |agg AS (
       |  SELECT leg, doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |         CAST(sum(CASE WHEN gap IS NOT NULL
       |                        AND gap <= $RepeatWindow
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS repeat_cnt
       |  FROM rp GROUP BY leg, doc_id)
       |SELECT leg, doc_id, n_grams, repeat_cnt,
       |       CAST(repeat_cnt * 10000 // greatest(n_grams, 1) AS BIGINT)
       |         AS repeat_bp,
       |       CAST(repeat_cnt * 10000 // greatest(n_grams, 1)
       |            >= $LowEntropyBp AS BIGINT) AS low_entropy
       |FROM agg ORDER BY leg, doc_id""".stripMargin,
    bench = true) { (s, d) =>
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
      .withColumn("n", size(col("w")))
    val legs = base.select(lit("clean").as("leg"), col("doc_id"), col("text"))
      .unionByName(base.filter(col("doc_id") % PlantMod === 4)
        .select(lit("plant").as("leg"), col("doc_id"),
          expr("trim(repeat(concat(array_join(slice(w, 1, 6), ' '), ' ')," +
            " greatest(n div 6, 3)))").as("text")))
    legs
      .withColumn("w2", split(col("text"), " "))
      .filter(size(col("w2")) >= 3)
      // the whole signal is map-side HOFs over the gram array: a gram
      // position i (1-based) is repeat mass iff the same gram occurs in
      // the previous RepeatWindow positions. CASE-guarded so i = 1 never
      // builds a descending sequence or a 0 element_at index.
      .withColumn("grams", expr(
        "transform(sequence(1, size(w2) - 2), i -> array_join(slice(w2, i, 3), ' '))"))
      .withColumn("n_grams", size(col("grams")).cast("long"))
      .withColumn("repeat_cnt", expr(
        s"""CAST(size(filter(sequence(1, size(grams)), i ->
           |  CASE WHEN i >= 2
           |       THEN exists(sequence(greatest(1, i - $RepeatWindow), i - 1),
           |                   j -> element_at(grams, j) = element_at(grams, i))
           |       ELSE false END)) AS BIGINT)""".stripMargin))
      .withColumn("repeat_bp",
        expr("repeat_cnt * 10000 div greatest(n_grams, 1)"))
      .select(col("leg"), col("doc_id"), col("n_grams"), col("repeat_cnt"),
        col("repeat_bp"),
        (col("repeat_bp") >= LowEntropyBp).cast("long").as("low_entropy"))
      .orderBy("leg", "doc_id")
  }

  val entries: Seq[Entry] = Seq(b302)
}
