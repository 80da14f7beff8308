package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.QualityDrift

/** B264 quality-signal drift monitor: the clean split stays quiet, the
  * planted double-send fires exactly its measured signal set with the
  * classifier as negative control, and the drift flags replay from the
  * published rules. */
class QualityDriftSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private lazy val rows = SparkEntry
    .queries("b264_quality_drift_monitor")(spark, sf).collect()
    .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))

  test("clean split: every signal quiet; planted double-send: rep/heur/" +
    "ntok fire and the classifier stays quiet (negative control)") {
    val clean = rows.filter(_._1 == "clean")
    assert(clean.length === 4)
    for (r <- clean) assert(r._6 === 0L, s"clean leg drifted on ${r._2}")
    val planted = rows.filter(_._1 == "planted")
    val fired = planted.filter(_._6 == 1L).map(_._2).sorted.toSeq
    assert(fired === Seq("heur_pass_bp", "mean_ntok", "rep_keep_bp"))
    assert(planted.find(_._2 == "clf_keep_bp").get._6 === 0L,
      "doubling preserves score sign — the classifier must not fire")
  }

  test("the A-side profile is the same stored artifact in both legs") {
    val byLeg = rows.groupBy(_._1).map { case (leg, rs) =>
      leg -> rs.map(r => r._2 -> r._3).toMap
    }
    assert(byLeg("clean") === byLeg("planted"))
  }

  test("drift flags replay from the published rules over the values") {
    for ((leg, sig, a, b, delta, drifted) <- rows) {
      val (wantDelta, wantFlag) =
        if (sig == "mean_ntok") {
          val ratio = b * 10000L / a
          (ratio, ratio < QualityDrift.NtokRatioLoBp ||
            ratio > QualityDrift.NtokRatioHiBp)
        } else (b - a, math.abs(b - a) > QualityDrift.RateDeltaBp)
      assert(delta === wantDelta, s"$leg/$sig delta")
      assert(drifted === (if (wantFlag) 1L else 0L), s"$leg/$sig flag")
    }
  }

  test("B274: the streamed monitor emits the batch monitor's rows" +
    " VERBATIM — micro-batched flag-sum accumulation loses nothing") {
    val batch = SparkEntry.queries("b264_quality_drift_monitor")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val streamed = SparkEntry.queries("b274_stream_drift_monitor")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
  }
}
