package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Multimodal, PerceptualHash => PH}

/** B290 pins: band-completeness at the chosen Hamming radius (the b42+
  * pigeonhole argument, on random fingerprints), overlay locality (the
  * planted copy differs in ≤ 3 bits BY CONSTRUCTION), decode honesty (the
  * JVM block sums replay the oracle's analytic formula), and end-to-end
  * planted recovery through the banded join. */
class PerceptualHashSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  test("pigeonhole: any pair within Hamming radius 3 shares >= 1 of the " +
    "4 16-bit bands (random fingerprints, random <= 3 flips)") {
    assert(PH.PerceptRadius < PH.PerceptBands,
      "radius must stay below the band count for the guarantee")
    val rnd = new scala.util.Random(290L)
    for (_ <- 1 to 500) {
      val fp = rnd.nextLong()
      val nFlips = rnd.nextInt(PH.PerceptRadius.toInt + 1)
      val flipped = (1 to nFlips).foldLeft(fp)((f, _) => f ^ (1L << rnd.nextInt(64)))
      val shared = (0 until PH.PerceptBands).exists { b =>
        ((fp >>> (b * 16)) & 0xFFFF) == ((flipped >>> (b * 16)) & 0xFFFF)
      }
      assert(shared, f"no shared band: $fp%016x vs $flipped%016x")
    }
  }

  test("overlay locality: the planted copy's bits differ from the " +
    "original's in <= 3 positions, and ONLY at the overlaid blocks") {
    val overlaidIdx = PH.OverlayBlocks.keySet.map { case (bx, by) => by * 8 + bx }
    for (id <- 0L to 300L by 3L) {
      val payload = Multimodal.ppmPayload(id)
      val orig = PH.blockBits(id, payload)
      val plant = PH.blockBits(id, PH.overlay(id, payload))
      val diff = (0 until 64).filter(b => orig(b) != plant(b))
      assert(diff.size <= PH.PerceptRadius, s"id $id: ${diff.size} flips")
      assert(diff.forall(overlaidIdx), s"id $id: non-overlay flip at $diff")
    }
  }

  test("decode honesty: JVM block bits from REAL parsed bytes equal the " +
    "oracle's analytic (id + i) % 256 formula") {
    for (id <- Seq(0L, 33L, 96L, 1234L)) {
      val w = (id % 48).toInt + 16
      val h = (id % 32).toInt + 8
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      for (i <- 0 until 3 * w * h) {
        val p = i / 3
        val b = ((p / w) * 8 / h) * 8 + (p % w) * 8 / w
        sums(b) += (id + i) % 256
        counts(b) += 1
      }
      val analytic = Array.tabulate(64)(b =>
        if (2 * sums(b) > 255 * counts(b)) 1 else 0)
      val parsed = PH.blockBits(id, Multimodal.ppmPayload(id))
      assert(parsed.sameElements(analytic), s"id $id bits diverge")
    }
  }

  test("end-to-end: every planted near-copy is recovered by the banded " +
    "join with hamming <= radius; pairs beyond the radius never appear") {
    val out = SparkEntry.queries("b290_perceptual_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expectedPlants = graft.sources.Tables.documents(spark, sf)
      .filter("doc_id % 3 = 0 AND doc_id % 5 = 0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val planted = out.filter(_._4 == 1L)
    assert(planted.map(_._1).toSet == expectedPlants,
      "a planted near-copy escaped the banded join")
    assert(planted.forall(p => p._2 == p._1 + PH.PerceptIdOffset))
    assert(out.forall(_._3 <= PH.PerceptRadius))
  }

  test("plan: banded candidate join is key-equi — no cartesian, no " +
    "nested-loop over the corpus") {
    val plan = SparkEntry.queries("b290_perceptual_neardup")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("B306 manifest: every planted copy resolves into a cluster whose " +
    "canonical (kept) member is its source original; cluster arithmetic " +
    "closes against the pair output") {
    val manifest = SparkEntry.queries("b306_media_dedup_manifest")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pairs = SparkEntry.queries("b290_perceptual_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every pair member must appear in some >=2-member cluster; planted
    // members (id >= offset) may never be a cluster canonical — min-id
    // keep always prefers the original source
    assert(manifest.forall(_._1 < PH.PerceptIdOffset),
      "a planted copy became a cluster canonical")
    val clustered = manifest.map(m => m._2).sum
    val planted = manifest.map(m => m._3).sum
    val dropped = manifest.map(m => m._4).sum
    assert(dropped == clustered - manifest.length,
      "keep-first arithmetic must drop exactly members-1 per cluster")
    assert(planted == pairs.count(p => p._2 >= PH.PerceptIdOffset
      && p._1 == p._2 - PH.PerceptIdOffset),
      "every planted pair's copy must be counted in exactly one cluster")
  }
}
