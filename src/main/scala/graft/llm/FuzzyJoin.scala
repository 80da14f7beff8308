package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** B198 — EDIT-DISTANCE SIMILARITY JOIN over the corpus vocabulary
  * (typo/variant candidate mining — the spelling-normalization pass of
  * web-corpus cleaning), blocked by the PassJoin segment scheme (Li,
  * Deng & Feng, VLDB'12): two words within Levenshtein distance
  * [[FuzzyJoin.K]] = 2 must, by pigeonhole, agree EXACTLY on one of the
  * 3 = K+1 even segments of either word — the untouched segment appears
  * verbatim in the other word at a start position shifted by at most K
  * (each insertion/deletion shifts later characters by one). So the
  * candidate join is an EQUI-join on (segment-owner length, segment
  * index, segment text): the a-side emits its 3 segments, the b-side
  * emits, for each compatible owner length and each ±K position shift,
  * the substring a matching segment would occupy. Candidates then
  * verify with the exact (codegen) levenshtein and join per-word corpus
  * counts — the higher-count word of a surviving pair is the
  * canonical-form candidate.
  *
  * The t2 oracle is the ALL-PAIRS spelling over the distinct-word
  * relation: the hash gate therefore PROVES the blocking lossless on the
  * corpus (the b15b/b171 pattern — blocked plan vs unblocked oracle).
  *
  * Scale posture (100 TB): the distinct-word relation is Zipf-bounded
  * (sublinear in corpus mass — the b125 argument); per word the a-side
  * emits 3 keys and the b-side ≤ 5·3·5 = 75 probe keys (constants in K,
  * not data), so the candidate join is linear in vocabulary with
  * equi-join keys — never |V|². Words shorter than 3 chars (whose even
  * segments would be empty) pair within a length-±K block instead; that
  * block is bounded by the ALPHABET (≤ |Σ|^2 · |Σ|^4 pairs), a constant
  * independent of corpus size. */
object FuzzyJoin {

  /** Edit-distance threshold (segments = K+1). */
  private val K = 2

  /** Distinct lowercase whitespace words with total occurrence counts —
    * the shared vocab relation (TextAnalysis split spelling). */
  private def vocab(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("len", length(col("w")))

  /** Candidate pairs (w1 < w2) from PassJoin blocking — a superset of
    * all pairs within distance [[K]] (proved lossless by the t2 gate). */
  private[graft] def candidates(v: DataFrame): DataFrame = {
    // main path: both words >= K+1 chars; a-side emits its K+1 even
    // segments keyed (owner length, segment index, text)
    val aKeys = v.filter(col("len") >= K + 1)
      .select(col("w").as("wa"), col("len").as("la"),
        explode(expr(s"sequence(0, $K)")).as("i"))
      .withColumn("si", expr("(i * la) div 3"))
      .withColumn("li", expr("((i + 1) * la) div 3 - (i * la) div 3"))
      .select(col("wa"), col("la"), col("i"),
        expr("substring(wa, si + 1, li)").as("seg"))
    // b-side probes: for each compatible owner length and ±K shift, the
    // substring that segment would occupy in this word
    val bKeys = v.filter(col("len") >= K + 1)
      .select(col("w").as("wb"), col("len").as("lb"),
        explode(expr(s"sequence(greatest(${K + 1}, len - $K), len + $K)"))
          .as("la"))
      .select(col("wb"), col("lb"), col("la"),
        explode(expr(s"sequence(0, $K)")).as("i"))
      .withColumn("si", expr("(i * la) div 3"))
      .withColumn("li", expr("((i + 1) * la) div 3 - (i * la) div 3"))
      .select(col("wb"), col("lb"), col("la"), col("i"), col("si"), col("li"),
        explode(expr(s"sequence(-$K, $K)")).as("dl"))
      .filter(col("si") + col("dl") >= 0 &&
        col("si") + col("dl") + col("li") <= col("lb"))
      .select(col("wb"), col("la"), col("i"),
        expr("substring(wb, si + dl + 1, li)").as("seg"))
    val main = aKeys.join(bKeys, Seq("la", "i", "seg"))
      .filter(col("wa") =!= col("wb"))
      .select(least(col("wa"), col("wb")).as("w1"),
        greatest(col("wa"), col("wb")).as("w2"))
    // short path: any pair whose smaller word is < K+1 chars — the
    // alphabet-bounded block (length band ±K)
    val shortA = v.filter(col("len") <= K)
      .select(col("w").as("wa"), col("len").as("la"))
    val shortB = v.filter(col("len") <= 2 * K)
      .select(col("w").as("wb"), col("len").as("lb"))
    val short = shortA.join(broadcast(shortB),
        col("wa") =!= col("wb") &&
          abs(col("la") - col("lb")) <= K)
      .select(least(col("wa"), col("wb")).as("w1"),
        greatest(col("wa"), col("wb")).as("w2"))
    main.union(short).distinct()
  }

  private val b198 = entry(
    "b198_fuzzy_vocab_join",
    s"""WITH w AS (
       |  SELECT w, count(*) AS c FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS w
       |    FROM documents) t
       |  WHERE w <> '' GROUP BY w)
       |SELECT a.w AS w1, b.w AS w2,
       |       CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist,
       |       CAST(a.c AS BIGINT) AS c1, CAST(b.c AS BIGINT) AS c2
       |FROM w a JOIN w b ON a.w < b.w AND levenshtein(a.w, b.w) <= $K
       |ORDER BY w1, w2""".stripMargin, bench = true) { (s, d) =>
    val v = vocab(s, d)
    candidates(v)
      .withColumn("dist", levenshtein(col("w1"), col("w2")).cast("long"))
      .filter(col("dist") <= K)
      .join(v.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(v.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .select(col("w1"), col("w2"), col("dist"), col("c1"), col("c2"))
      .orderBy("w1", "w2")
  }

  val entries: Seq[Entry] = Seq(b198)
}
