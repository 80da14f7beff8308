package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (the rolling-hash fingerprinting scheme
  * from the MOSS local-fingerprinting algorithm): hash every k-gram at
  * every position, then keep the minimum hash of each sliding window of w
  * consecutive positions. Any sufficiently long match between two
  * documents is guaranteed to share at least one selected fingerprint —
  * the copy-detection property exact dedup lacks and MinHash only gives
  * probabilistically.
  *
  * Scale posture: position hashing is a narrow projection; window minima
  * are one window pass partitioned by doc (shuffle on doc_id only);
  * fingerprints shuffle as (hash, doc) pairs for the inverted index. The
  * per-doc fingerprint count is |doc|/w on average — sublinear output.
  */
object Winnowing {
  val K = 5 // k-gram length (characters)
  val W = 8 // window width (positions)

  /** Default gram hash: engine-native xxhash64 — the scale path (one hash
    * of K bytes per position). `i` is the bound position variable. */
  val XxGramHash: String = s"xxhash64(substring(text, i, $K))"

  /** 40-bit mask for the cross-engine polynomial hash — the ONE definition
    * every dialect string (here and in TextAnalysis' oracle SQL)
    * interpolates, so the Spark and DuckDB folds cannot drift apart. */
  val PolyMask: Long = (1L << 40) - 1

  /** The whole-string polynomial fold, Spark SQL spelling — THE shared
    * definition for every call site (fingerprinting, hash-split, capstone
    * pipeline, multimodal stub's oracle); per-character (codepoint) on
    * both dialects, so it is charset-proof. */
  def polyFoldSpark(colExpr: String): String =
    s"""aggregate(transform(sequence(1, length($colExpr)),
       |                    j -> ascii(substring($colExpr, j, 1))),
       |          CAST(0 AS BIGINT),
       |          (a, c) -> (a * 31 + c) & $PolyMask)""".stripMargin

  /** The same fold, DuckDB spelling (list_reduce has no init value —
    * list_prepend supplies the BIGINT zero). */
  def polyFoldDuck(colExpr: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |  list_transform(generate_series(1, length($colExpr)),
       |                 j -> ascii(substr($colExpr, j, 1)))),
       |  (a, c) -> (a * 31 + c) & $PolyMask)""".stripMargin

  /** JVM-side twin of the fold for engine-local (mapPartitions) code:
    * folds CODEPOINTS of the string, exactly like ascii(substr(s,j,1))
    * iterates characters in both SQL dialects — NOT bytes, which would
    * silently diverge from the oracle on the first non-ASCII character. */
  def polyFoldString(s: String): Long = {
    var h = 0L
    val it = s.codePoints().iterator()
    while (it.hasNext) h = (h * 31 + it.next()) & PolyMask
    h
  }

  /** Oracle-replicable gram hash: 40-bit polynomial fold over character
    * codes, `(h * 31 + code) & PolyMask`. Expressible verbatim in DuckDB
    * (list_reduce) so winnowing output can be t2 hash-matched; ~0.3
    * expected cross-gram collisions per million grams at 2^40. */
  val PolyGramHash: String =
    s"""aggregate(transform(sequence(i, i + ${K - 1}),
       |                    j -> ascii(substring(text, j, 1))),
       |          CAST(0 AS BIGINT),
       |          (a, c) -> (a * 31 + c) & $PolyMask)""".stripMargin

  /** (doc_id, fingerprint) — distinct window-minimum k-gram hashes.
    * `gramHash` is a SQL expression over (`text`, position `i`). */
  def fingerprints(docs: DataFrame, gramHash: String = XxGramHash): DataFrame = {
    // posexplode_OUTER: the non-outer form makes InferFiltersFromGenerate
    // duplicate the whole per-position gram-hash transform into a pushed
    // filter evaluated per input row (the b43 lesson, SCALE.md §3.7); the
    // length >= K guard already proves the array non-empty, so outer is
    // row-for-row identical
    val grams = docs
      .filter(length(col("text")) >= K)
      .select(col("doc_id"), posexplode_outer(expr(
        s"transform(sequence(1, length(text) - ${K - 1}), i -> $gramHash)")))
      .select(col("doc_id"), col("pos"), col("col").as("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, W - 1)
    grams
      .select(col("doc_id"), min(col("h")).over(w).as("fp"))
      .distinct()
  }

  /** Documents sharing ≥ `minShared` fingerprints with a probe doc —
    * the inverted-index containment query (plagiarism-/contamination-
    * detection shape: probe = eval set, corpus = training data). */
  def sharedFingerprints(probes: DataFrame, corpus: DataFrame, minShared: Int,
      gramHash: String = XxGramHash): DataFrame = {
    val pf = fingerprints(probes, gramHash).select(col("doc_id").as("probe_id"), col("fp"))
    val cf = fingerprints(corpus, gramHash).select(col("doc_id").as("corpus_id"), col("fp"))
    pf.join(cf, "fp")
      .filter(col("probe_id") =!= col("corpus_id"))
      .groupBy("probe_id", "corpus_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
