package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{MixtureResample, Winnowing}
import graft.sources.Tables

/** B98 mixture rebalancing: derived rates, selector determinism, and the
  * equalization property itself. */
class MixtureResampleSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"), col("source"))

  private lazy val kept = MixtureResample.resampleManifest(docs).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  private lazy val totals = docs
    .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
    .groupBy("source").agg(sum("n").as("t")).collect()
    .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("manifest equals a JVM recomputation (rates, selector, and all)") {
    // independent oracle: same definition, plain collections + the JVM
    // polyFold twin (codepoint semantics pinned in WinnowingSpec)
    val minT = totals.values.min
    val thr = totals.view.mapValues(t => minT * 10000L / t).toMap
    val want = docs.collect()
      .map(r => (r.getLong(0), r.getString(2),
        r.getString(1).split(" ", -1).length.toLong))
      .filter { case (id, src, _) =>
        Winnowing.polyFoldString(s"mix:$id") % 10000L < thr(src)
      }
      .sortBy(_._1)
    assert(kept.toSeq === want.toSeq)
    assert(kept.nonEmpty)
  }

  test("the smallest source is kept whole; every source lands near min(T) tokens") {
    val minT = totals.values.min
    val minSrc = totals.minBy(_._2)._1
    val keptTok = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(keptTok(minSrc) === minT, "smallest source lost documents")
    for ((src, tok) <- keptTok) {
      // expected kept mass is minT (up to 1bp quantization + hash noise
      // over ~25 docs/source at sf0.001 — generous 50% band)
      assert(tok > minT / 2 && tok < minT * 3 / 2,
        s"source $src kept $tok tokens vs target $minT")
    }
    // and it actually REBALANCED: some source was downsampled
    assert(kept.length < docs.count(), "no source was downsampled")
  }

  test("selector is a pure function of the key: rerun- and subset-stable") {
    val twice = MixtureResample.resampleManifest(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(twice.toSeq === kept.toSeq)
  }
}
