package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** B198 PassJoin edit-distance join: the t2 gate proves the segment
  * blocking lossless against the all-pairs oracle; these specs pin the
  * pieces that equality alone doesn't isolate — that Spark's levenshtein
  * is the textbook DP (cross-checked in JVM) and that the result is
  * non-vacuous and canonical-form-usable. */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf0001

  /** Textbook unit-cost Levenshtein DP. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("B198: output equals a JVM all-pairs DP replay over the vocabulary") {
    val got = SparkEntry.queries("b198_fuzzy_vocab_join")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty, "edit-distance join is vacuous on this corpus")
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- vocab.keys; b <- vocab.keys if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b) -> (d.toLong, vocab(a), vocab(b))).toMap
    assert(got === want)
    // every surviving pair is a usable canonicalization candidate: the
    // two words genuinely differ
    got.keys.foreach { case (a, b) => assert(a != b) }
  }

  test("B198: blocked candidates cover every true pair (pigeonhole soundness)") {
    // independent of the entry tail: candidates ⊇ all pairs within k=2
    val vocabDf = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("len", length(col("w")))
    val cands = llm.FuzzyJoin.candidates(vocabDf)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val words = vocabDf.select("w").collect().map(_.getString(0))
    for (a <- words; b <- words if a < b && lev(a, b) <= 2)
      assert(cands.contains((a, b)), s"blocking dropped true pair ($a, $b)")
  }
}
