package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.SetSimJoin

/** B145 prefix-filtered set-similarity join: the prefix LEMMA is pinned
  * against brute force on randomized corpora (not just the gate
  * dataset), the candidate reduction is measured, and the planted pair
  * families are recovered. */
class SetSimJoinSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  import spark.implicits._

  private def asPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("B145: prefix-filtered join ≡ brute-force join on the gate corpus") {
    val docs = SetSimJoin.corpus(spark, sf)
    assert(asPairs(SetSimJoin.similarityJoin(docs)) ==
      asPairs(SetSimJoin.bruteForceJoin(docs)))
  }

  test("B145: prefix lemma holds on randomized small-vocab corpora at " +
    "several thresholds") {
    // deterministic pseudo-random corpora: tiny vocabulary forces dense
    // shingle collisions — the regime where a buggy prefix bound loses
    // pairs. seed-indexed LCG, no Random.
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def lcg(s: Long): Long = (s * 6364136223846793005L + 1442695040888963407L)
    for (seed <- 1 to 3; tauBp <- Seq(7000L, 8000L, 9000L)) {
      var st = seed.toLong
      val docs = (0 until 40).map { i =>
        st = lcg(st)
        val len = 5 + math.floorMod(st, 18).toInt
        val words = (0 until len).map { j =>
          st = lcg(st); vocab(math.floorMod(st, vocab.length.toLong).toInt)
        }
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val fast = asPairs(SetSimJoin.similarityJoin(docs, tauBp))
      val brute = asPairs(SetSimJoin.bruteForceJoin(docs, tauBp))
      assert(fast == brute, s"seed=$seed tau=$tauBp: prefix join diverged " +
        s"(${fast.size} vs ${brute.size} pairs)")
    }
  }

  test("B145: planted exact copies surface at 10000 bp and prefixed " +
    "copies in [8000, 10000)") {
    val pairs = asPairs(SetSimJoin.similarityJoin(SetSimJoin.corpus(spark, sf)))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    val origIds = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val exactPlanted = origIds.filter(_ % 7 == 0)
    val nearPlanted = origIds.filter(_ % 9 == 0)
    assert(exactPlanted.nonEmpty && nearPlanted.nonEmpty)
    exactPlanted.foreach { id =>
      assert(byPair.get((id, id + 1000000L)).contains(10000L),
        s"exact copy pair $id missing or not 10000 bp")
    }
    nearPlanted.foreach { id =>
      val j = byPair.get((id, id + 4000000L))
      assert(j.exists(v => v >= SetSimJoin.TauBp && v < 10000L),
        s"prefixed copy pair $id: $j")
    }
  }

  test("B145: the prefix join examines strictly fewer candidate pairs " +
    "than the full posting-list join") {
    val docs = SetSimJoin.corpus(spark, sf)
    val arrs = graft.llm.TextDedup.withShingleArr(docs)
    val sh = arrs.select(col("doc_id"), explode(col("sh_arr")).as("shingle"))
    val fullPairs = sh.select(col("doc_id").as("da"), col("shingle"))
      .join(sh.select(col("doc_id").as("db"), col("shingle")), "shingle")
      .filter(col("da") < col("db"))
      .select("da", "db").distinct().count()
    // replicate the prefix construction to count its candidates
    val rank = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("df"), col("shingle"))))
      .select("shingle", "rnk")
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("rnk"))
    val prefix = sh.join(rank, "shingle")
      .withColumn("pos", row_number().over(wDoc))
      .join(arrs.select(col("doc_id"), size(col("sh_arr")).cast("long").as("n")),
        "doc_id")
      .filter(col("pos") <=
        col("n") - expr(s"(n * ${SetSimJoin.TauBp} + 9999) div 10000") + 1)
      .select(col("doc_id"), col("shingle"))
    val prefPairs = prefix.select(col("doc_id").as("da"), col("shingle"))
      .join(prefix.select(col("doc_id").as("db"), col("shingle")), "shingle")
      .filter(col("da") < col("db"))
      .select("da", "db").distinct().count()
    assert(prefPairs * 2 < fullPairs,
      s"prefix candidates $prefPairs vs full $fullPairs — filter not biting")
  }

  private def asContain(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq

  test("B282: one-sided prefix join ≡ brute force on the gate corpus " +
    "and on randomized corpora at several thresholds") {
    val docs = SetSimJoin.containCorpus(spark, sf)
    assert(asContain(SetSimJoin.containmentJoin(docs)) ==
      asContain(SetSimJoin.containmentBruteForce(docs)))
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def lcg(s: Long): Long = (s * 6364136223846793005L + 1442695040888963407L)
    for (seed <- 1 to 2; tauBp <- Seq(7000L, 8000L, 9000L)) {
      var st = seed.toLong + 100
      val rnd = (0 until 40).map { i =>
        st = lcg(st)
        val len = 5 + math.floorMod(st, 18).toInt
        val words = (0 until len).map { _ =>
          st = lcg(st); vocab(math.floorMod(st, vocab.length.toLong).toInt)
        }
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val fast = asContain(SetSimJoin.containmentJoin(rnd, tauBp))
      val brute = asContain(SetSimJoin.containmentBruteForce(rnd, tauBp))
      assert(fast == brute, s"seed=$seed tau=$tauBp: one-sided prefix " +
        s"join diverged (${fast.size} vs ${brute.size} pairs)")
    }
  }

  test("B282: every planted excerpt is contained in its original at " +
    "exactly 10000 bp, and containment sees what Jaccard cannot") {
    val docs = SetSimJoin.containCorpus(spark, sf)
    val pairs = asContain(SetSimJoin.containmentJoin(docs))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    val planted = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 11 === 0 &&
        size(split(col("text"), " ")) >= 5)
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(byPair.get((id + 7000000L, id)).contains(10000L),
        s"excerpt of $id not contained at 10000 bp")
    }
    // asymmetry: a STRICT excerpt (container has more shingles) is
    // contained in the original, but the original is NOT contained in
    // the excerpt — the directional relation Jaccard collapses
    val strict = pairs.find(p => p._1 >= 7000000L && p._2 === p._1 - 7000000L
      && p._4 < p._5)
    assert(strict.isDefined, "no strict excerpt pair at this SF")
    strict.foreach { p =>
      assert(!byPair.contains((p._2, p._1)),
        "original reported as contained in its own strict excerpt")
    }
  }
}
