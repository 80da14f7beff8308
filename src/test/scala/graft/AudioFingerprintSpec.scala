package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{AudioFingerprint => AF, PerceptualHash => PH}

/** B299 pins: WAV parse honesty (the fingerprint must EARN its samples
  * from the bytes — malformed headers throw with named messages; the
  * parsed-byte bits equal the oracle's analytic sample formula), overlay
  * locality (the planted copy differs in ≤ 3 bits, only at the overlaid
  * slots — the Hamming bound the banded recovery relies on), and
  * end-to-end planted recovery through the shared banded join. Band
  * pigeonhole completeness itself is pinned once in PerceptualHashSpec —
  * B299 reuses that machinery verbatim. */
class AudioFingerprintSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  test("WAV payload round-trips its own strict parser; header fields " +
    "validated from bytes") {
    for (id <- Seq(1L, 4L, 7L, 64L, 127L, 1000L)) {
      val p = AF.wavPayload(id)
      val (n, off) = AF.wavHeader(id, p)
      assert(off == 44)
      assert(n == AF.frameCount(id) * AF.FrameLen)
      assert(p.length == 44 + 2 * n)
    }
  }

  test("parser rejects malformed WAVs with the named guard, not a " +
    "silent wrong fingerprint") {
    val good = AF.wavPayload(10L)
    def corrupt(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    // bad RIFF magic
    intercept[IllegalArgumentException] {
      AF.wavHeader(10L, corrupt(_(0) = 'X'))
    }
    // non-PCM format code
    intercept[IllegalArgumentException] {
      AF.wavHeader(10L, corrupt(_(20) = 3))
    }
    // stereo
    intercept[IllegalArgumentException] {
      AF.wavHeader(10L, corrupt(_(22) = 2))
    }
    // truncated data (drop the last sample): data-size field disagrees
    intercept[IllegalArgumentException] {
      AF.wavHeader(10L, good.dropRight(2))
    }
    // inconsistent block align
    intercept[IllegalArgumentException] {
      AF.wavHeader(10L, corrupt(_(32) = 4))
    }
  }

  test("decode honesty: JVM bits from REAL parsed LE16 bytes equal the " +
    "oracle's analytic sample formula") {
    for (id <- Seq(1L, 4L, 31L, 64L, 127L, 1234L)) {
      val frames = AF.frameCount(id)
      // analytic replica of the oracle's sv -> cf -> grp -> bits chain
      val c = new Array[Long](frames)
      for (f <- 0 until frames; j <- 0 until AF.FrameLen) {
        val s = AF.sampleValue(id, f, j)
        c(f) += (if ((j / AF.HalfPeriod) % 2 == 0) s else -s)
      }
      val g = new Array[Long](64)
      for (f <- 0 until frames) g(f * 64 / frames) += c(f)
      val analytic = Array.tabulate(64)(k => if (g(k) > 0) 1 else 0)
      val parsed = AF.waveBits(id, AF.wavPayload(id))
      assert(parsed.sameElements(analytic), s"id $id bits diverge")
    }
  }

  test("square wave is deliberately unbalanced: frame DC level reaches " +
    "the correlation (a balanced wave would collapse the fingerprint)") {
    val taps = (0 until AF.FrameLen)
      .map(j => if ((j / AF.HalfPeriod) % 2 == 0) 1 else -1).sum
    assert(taps != 0, "tap sum must not cancel the frame mean")
  }

  test("overlay locality: the planted copy's bits differ from the " +
    "original's in <= 3 positions, and ONLY at the overlaid slots") {
    for (id <- 1L to 301L by 3L) {
      val payload = AF.wavPayload(id)
      val orig = AF.waveBits(id, payload)
      val plant = AF.waveBits(id, AF.overlayWav(id, payload))
      val diff = (0 until 64).filter(b => orig(b) != plant(b))
      assert(diff.size <= PH.PerceptRadius, s"id $id: ${diff.size} flips")
      assert(diff.forall(AF.OverlaySlots), s"id $id: non-overlay flip at $diff")
    }
  }

  test("end-to-end: every planted near-copy is recovered by the banded " +
    "join with hamming <= radius; pairs beyond the radius never appear") {
    val out = SparkEntry.queries("b299_audio_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expectedPlants = graft.sources.Tables.documents(spark, sf)
      .filter(s"doc_id % 3 = 1 AND doc_id % ${AF.PlantMod} = 0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val planted = out.filter(_._4 == 1L)
    assert(planted.map(_._1).toSet == expectedPlants,
      "a planted near-copy escaped the banded join")
    assert(planted.forall(p => p._2 == p._1 + AF.AudioIdOffset))
    assert(out.forall(_._3 <= PH.PerceptRadius))
  }

  test("plan: banded candidate join is key-equi — no cartesian, no " +
    "nested-loop over the corpus") {
    val plan = SparkEntry.queries("b299_audio_neardup")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("B307 decode honesty: parsed-byte frame features equal the " +
    "analytic sample formula (energy and zero crossings, zero-positive)") {
    val out = SparkEntry.queries("b307_audio_frame_features")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ids = graft.sources.Tables.documents(spark, sf)
      .filter("doc_id % 3 = 1").select("doc_id")
      .collect().map(_.getLong(0))
    var checked = 0
    for (id <- ids; f <- 0 until AF.frameCount(id) by AF.FrameStride) {
      val samples = (0 until AF.FrameLen).map(j => AF.sampleValue(id, f, j))
      val energy = samples.map(s => math.abs(s).toLong).sum
      val zc = samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(out((id, f.toLong)) == ((AF.FrameLen.toLong, energy, zc.toLong)),
        s"id $id frame $f features diverge")
      checked += 1
    }
    assert(checked == out.size, "row universe must be exactly the stride grid")
  }
}
