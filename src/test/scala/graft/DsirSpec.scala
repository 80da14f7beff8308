package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{DsirResample, Winnowing}
import graft.sources.Tables

/** B100 DSIR importance resampling: plain-JVM replay of the whole
  * operator, the fixed-point boundary-margin contract that makes per-doc
  * scores exact integers, observable target enrichment, and the
  * broadcast-model plan shape. */
class DsirSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001
  private val B = DsirResample.Buckets
  private val Target = "de"

  private lazy val corpus: Array[(Long, String, String)] =
    Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  /** feature-bucket occurrences per doc, JVM-side. */
  private def buckets(text: String): Seq[Int] = {
    val ws = text.split(" ", -1).toSeq
    val feats = ws ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    feats.map(f => (Winnowing.polyFoldString(s"dsir:$f") % B).toInt)
  }

  /** (weights w[b], min distance of any pre-floor value from an integer
    * boundary) — the float step, recomputed independently. */
  private lazy val (jvmW, minMargin): (Map[Int, Long], Double) = {
    val all = corpus.flatMap(d => buckets(d._3).map(b => (d._2, b)))
    val cntR = all.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val cntT = all.filter(_._1 == Target).groupBy(_._2)
      .map { case (b, xs) => b -> xs.length.toLong }
    val tr = cntR.values.sum; val tt = cntT.values.sum
    val pairs = cntR.map { case (b, cr) =>
      val v = (math.log((cntT.getOrElse(b, 0L) + 1).toDouble / (tt + B)) -
        math.log((cr + 1).toDouble / (tr + B))) * DsirResample.WScale + 0.5d
      val frac = v - math.floor(v)
      (b -> math.floor(v).toLong, math.min(frac, 1 - frac))
    }
    (pairs.map(_._1).toMap, pairs.map(_._2).min)
  }

  private lazy val jvmSelected: Seq[(Long, String, Long)] = {
    val scored = corpus.map { d =>
      (d._1, d._2, buckets(d._3).map(jvmW(_)).sum)
    }
    scored.sortBy(t => (-t._3, t._1)).take(corpus.length / 10)
      .sortBy(_._1).toSeq
  }

  private lazy val sparkRows =
    SparkEntry.queries("b100_dsir_resample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("B100 ≡ plain-JVM replay (selection set, langs, exact scores)") {
    assert(sparkRows === jvmSelected)
  }

  test("B100: every bucket weight sits ≥ 1e-4 from its floor boundary") {
    // per-doc scores are exact BIGINT sums; the only float crossing is
    // the 1024 ln-ratio roundings, each provably stable across engines
    // when the margin dwarfs libm drift (~1e-10 at this magnitude)
    assert(minMargin >= 1e-4,
      f"bucket weight within $minMargin%.2e of a floor boundary — " +
        "fixed-point rounding no longer engine-stable; reseed the salt")
  }

  test("B100: selection is observably enriched in the target lang") {
    val base = corpus.count(_._2 == Target).toDouble / corpus.length
    val sel = sparkRows.count(_._2 == Target).toDouble / sparkRows.length
    assert(sel > 2 * base,
      f"selected $sel%.2f vs corpus $base%.2f — no enrichment")
  }

  test("B100: model join is broadcast and selection is TakeOrdered") {
    val df = SparkEntry.queries("b100_dsir_resample")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    // selection must be per-partition top-N + driver merge, not a global
    // sort (the scalar totals aggregate's own SinglePartition exchange
    // carries O(partitions) rows and is fine — don't over-assert it away)
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }
}
