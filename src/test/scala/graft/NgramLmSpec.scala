package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.NgramLm

/** B129 Kneser-Ney bigram training: the Spark aggregation pipeline vs an
  * independent plain-Scala implementation of interpolated KN on a corpus
  * small enough to verify by hand — the formula itself is cross-checked,
  * not just the two SQL spellings of it. */
class NgramLmSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  import spark.implicits._

  private val docs = Seq(
    "the cat sat on the mat",
    "the cat ate the rat",
    "a rat sat",
    "",      // no bigrams
    "one",   // single token, no bigrams
    "x  y"   // double space → empty token; (x,'') and ('',y) must drop
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("KN statistics equal an independent plain-Scala fold") {
    val got = NgramLm.knBigrams(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

    // independent spelling: maps and folds, no Spark, no SQL
    val bigrams = docs.collect().flatMap { r =>
      val t = r.getString(1).split(" ", -1)
      t.zip(t.drop(1)).filter(p => p._1.nonEmpty && p._2.nonEmpty)
    }
    val c = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cw1 = c.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val n1w1 = c.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val cont = c.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val b = c.size.toLong
    val want = c.toSeq.map { case ((w1, w2), cnt) =>
      val pcont = cont(w2) * 1000000L / b
      val kn = math.max(4 * cnt - 3, 0L) * 1000000L / (4 * cw1(w1)) +
        3 * n1w1(w1) * pcont / (4 * cw1(w1))
      (w1, w2, cnt, cw1(w1), n1w1(w1), cont(w2), kn)
    }.sortBy(t => (-t._3, t._1, t._2))

    assert(got.toSeq === want)
    // sanity: the probability head of every left context sums below one
    // (KN reserves mass for unseen continuations)
    for ((w1, rows) <- got.groupBy(_._1)) {
      val mass = rows.map(_._7).sum
      assert(mass <= 1000000L,
        s"context '$w1' overshoots unit mass: $mass micro-units")
    }
  }

  test("B158: an exclusive planted pair tops the lift ranking at its exact integer value") {
    // 'alpha beta' co-occurs exclusively (c12 = c1 = c2 = 6 ≥ MinSupport);
    // filler bigrams share the 'the cat' / 'cat sat' marginals heavily,
    // so their lift hugs 1 and the planted pair must rank first at
    // exactly N/c12 (in bp, floored through the committed two-stage form).
    val planted = (
      Seq.fill(6)("alpha beta") ++
        Seq.fill(6)(Seq("the cat sat", "the cat ate", "a cat sat")).flatten
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = graft.llm.NgramLm.liftCollocations(planted).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    val top = out.head
    assert((top._1, top._2) === (("alpha", "beta")), s"top = $top")
    // recompute N independently of the operator's output
    val allBigrams = planted.collect().map(_.getString(1))
      .flatMap(t => t.split(" ", -1).filter(_.nonEmpty).sliding(2).filter(_.length == 2))
      .length.toLong
    val expected = (6L * 100000000L / 6L) * allBigrams / (6L * 10000L)
    assert(top._6 === expected)
    // exclusive pair: the two-stage floor equals the one-shot N*1e4/c12
    assert(expected === allBigrams * 10000L / 6L)
    // every filler collocation lifts below the planted pair
    assert(out.tail.forall(_._6 < expected))
  }
}
