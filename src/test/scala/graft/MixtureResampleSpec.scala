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

  // ---- B153: DoReMi weight-vector generalization ----

  private lazy val keptW = MixtureResample
    .resampleToTarget(docs, MixtureResample.TargetWeightsBp).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("B153 manifest equals a JVM recomputation of the weighted rates") {
    val w = MixtureResample.TargetWeightsBp.toMap
    val ratio = totals.map { case (s, t) => s -> t * 100000000L / w(s) }
    val mSrc = ratio.toSeq.minBy { case (s, r) => (r, s) }._1
    val (mt, mw) = (totals(mSrc), w(mSrc))
    val thr = totals.map { case (s, t) =>
      s -> math.min(10000L, mt * 10000L * w(s) / (mw * t))
    }
    val want = docs.collect()
      .map(r => (r.getLong(0), r.getString(2),
        r.getString(1).split(" ", -1).length.toLong))
      .filter { case (id, src, _) =>
        Winnowing.polyFoldString(s"mix:$id") % 10000L < thr(src)
      }
      .sortBy(_._1)
    assert(keptW.toSeq === want.toSeq)
    assert(keptW.nonEmpty)
  }

  test("B153 non-uniform weights provably bind: kept mass tracks the target vector") {
    val w = MixtureResample.TargetWeightsBp.toMap
    val keptTok = keptW.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // the binding source is kept whole
    val ratio = totals.map { case (s, t) => s -> t * 100000000L / w(s) }
    val mSrc = ratio.toSeq.minBy { case (s, r) => (r, s) }._1
    assert(keptTok(mSrc) === totals(mSrc), "binding source lost documents")
    // kept mass per unit weight is ~constant: C = T_m/w_m. At sf0.001 a
    // source is ~25 docs, so a mid-range keep rate carries heavy binomial
    // noise — the per-source band is 3× (exactness is the previous test's
    // JVM-equality job; this one checks the TARGET binds directionally)
    val c = totals(mSrc).toDouble / w(mSrc)
    for ((src, tok) <- keptTok) {
      val expect = c * w(src)
      assert(tok > expect / 3 && tok < expect * 3,
        s"source $src kept $tok tokens vs target ${expect.round}")
    }
    // heaviest target weight keeps strictly more mass than the lightest —
    // the uniform special case (b98) could never produce this
    val hi = keptTok("src19"); val lo = keptTok("src0")
    assert(hi > lo * 3,
      s"weights did not bind: src19 kept $hi vs src0 $lo")
    // and it differs from the uniform manifest
    assert(keptW.map(_._1).toSet !== kept.map(_._1).toSet)
  }

  test("B153 uniform weight vector reproduces B98 exactly") {
    val uniform = MixtureResample.TargetWeightsBp.map { case (s, _) => (s, 500L) }
    val asUniform = MixtureResample.resampleToTarget(docs, uniform).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(asUniform.toSeq === kept.toSeq)
  }
}
