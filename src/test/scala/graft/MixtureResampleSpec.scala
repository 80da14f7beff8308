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

  private def isqrt(t: Long): Long = {
    val x = math.floor(math.sqrt(t.toDouble)).toLong
    x + (if ((x + 1) * (x + 1) <= t) 1L else if (x * x > t) -1L else 0L)
  }

  test("B180 temperature manifest equals a JVM replay of the sqrt-weight rates") {
    val keptT = SparkEntry.queries("b180_temperature_mixture")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(keptT.nonEmpty)
    val w = totals.map { case (s, t) => s -> isqrt(t) }
    val (ms, _) = totals.minBy { case (s, t) => (t * 100000000L / w(s), s) }
    val thr = totals.map { case (s, t) =>
      s -> math.min(10000L, totals(ms) * 10000L * w(s) / (w(ms) * t))
    }
    val want = docs.collect().map { r =>
      (r.getLong(0), r.getString(2), r.getString(1).split(" ", -1).count(_.nonEmpty).toLong)
    }.filter { case (id, s, _) =>
      val h = graft.llm.Winnowing.polyFoldString(s"temp:$id")
      (h % 2147483648L) * 2654435761L % 2147483648L % 10000L < thr(s)
    }.sortBy(_._1)
    assert(keptT.toSeq === want.toSeq)
  }

  test("B180 flattens but does not level: kept mass strictly between b98 and proportional") {
    // the real corpus's source skew is ~1.4x at gate SFs — too flat to
    // separate the three regimes — so the property runs on a synthetic
    // 64:16:1 corpus through the SAME weight derivation + resample tail
    import spark.implicits._
    val text20 = (1 to 20).map(_ => "w").mkString(" ")
    val syn = (
      (1L to 320L).map(i => (i, text20, "A")) ++
        (1001L to 1080L).map(i => (i, text20, "B")) ++
        (2001L to 2005L).map(i => (i, text20, "C"))
      ).toDF("doc_id", "text", "source")
    val w = syn
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("t"))
      .select(col("source"),
        expr("CAST(floor(sqrt(CAST(t AS DOUBLE))) AS BIGINT)").as("w_bp"))
    val keptSyn = MixtureResample
      .resampleWithWeights(syn, w, "temp:", scrambled = true)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val mass = keptSyn.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // C (100 tokens) binds and is kept whole
    assert(mass("C") === 100L)
    // B: thr = 2500bp of 1600 tokens → ~400 ≈ √(100·1600); A: thr =
    // 1250bp of 6400 → ~800 ≈ √(100·6400). Bands are ±3sd of the
    // realized (deterministic) draw — strictly between leveled (100)
    // and proportional (1600/6400), and monotone in source size
    assert(mass("B") > 160L && mass("B") < 640L, s"B kept ${mass("B")}")
    assert(mass("A") > 440L && mass("A") < 1160L, s"A kept ${mass("A")}")
    assert(mass("A") > mass("B") && mass("B") > mass("C"),
      "kept mass is not monotone in source size — flattening leveled it")
  }
}
