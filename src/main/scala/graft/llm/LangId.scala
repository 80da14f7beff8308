package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** Heuristic n-gram language identification (driver mandate: "language-ID
  * (n-gram heuristic)"). Fully deterministic and SQL-expressible, so it is
  * t2-checked end to end:
  *
  *   1. train split (even doc_ids) → per-language character-trigram
  *      frequency profiles, top-20 per language;
  *   2. test docs (doc_id % 20 == 1) → distinct trigrams;
  *   3. predicted language = argmax over languages of |doc ∩ profile|
  *      (ties broken by language name).
  *
  * Scale posture: profiles are a tiny aggregate (languages × 20 rows) —
  * broadcast to the trigram join; the per-doc trigram explode shuffles
  * (doc, trigram) pairs once. No driver materialization.
  *
  * Note on the testdata: all five `lang` values share one identical 31-word
  * vocabulary (verified against the corpus), so prediction accuracy is
  * chance (1/5) BY CONSTRUCTION of the synthetic data — the t2 gate checks
  * the classifier's determinism and SQL semantics, not its skill.
  */
object LangId {

  private val b45l = entry(
    "b45_text_langid",
    """WITH train_tri AS (
      |  SELECT lang, unnest(list_transform(generate_series(1, length(text) - 2),
      |         i -> substr(text, i, 3))) AS tri
      |  FROM documents WHERE doc_id % 2 = 0),
      |profile AS (
      |  SELECT lang AS plang, tri FROM (
      |    SELECT lang, tri, count(*) AS cnt,
      |           row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, tri) AS rn
      |    FROM train_tri GROUP BY lang, tri) p
      |  WHERE rn <= 20),
      |test_tri AS (
      |  SELECT DISTINCT doc_id, lang, tri FROM (
      |    SELECT doc_id, lang, unnest(list_transform(generate_series(1, length(text) - 2),
      |           i -> substr(text, i, 3))) AS tri
      |    FROM documents WHERE doc_id % 20 = 1) t),
      |scores AS (
      |  SELECT doc_id, lang, plang, count(*) AS score
      |  FROM test_tri JOIN profile USING (tri)
      |  GROUP BY doc_id, lang, plang)
      |SELECT doc_id, lang, plang AS predicted, score FROM (
      |  SELECT doc_id, lang, plang, score,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn
      |  FROM scores) r
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin, bench = true) { (s, d) =>
    val docs = Tables.documents(s, d)
    val triOf = expr(
      "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")
    val trainTri = docs.filter(col("doc_id") % 2 === 0)
      .select(col("lang"), explode(triOf).as("tri"))
    val wProf = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("tri"))
    val profile = trainTri.groupBy("lang", "tri").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wProf))
      .filter(col("rn") <= 20)
      .select(col("lang").as("plang"), col("tri"))
    val testTri = docs.filter(col("doc_id") % 20 === 1)
      .select(col("doc_id"), col("lang"), explode(triOf).as("tri"))
      .distinct()
    val wBest = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("plang"))
    testTri.join(broadcast(profile), "tri")
      .groupBy("doc_id", "lang", "plang")
      .agg(count(lit(1)).as("score"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("plang").as("predicted"), col("score"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup over the dup-injected corpus (identical docs land at
    * Hamming distance 0; engine-specific hashing → rows-only check, the
    * recall property is in SimHashSpec). */
  private val b42s = entryNoOracle("b42_dedup_simhash") { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val withDups = docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    SimHash.nearDuplicates(withDups, maxHamming = 3)
      .orderBy("doc_a", "doc_b")
  }

  val entries: Seq[Entry] = Seq(b45l, b42s)
}
