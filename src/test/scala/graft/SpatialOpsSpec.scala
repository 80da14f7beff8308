package graft

import org.scalatest.funsuite.AnyFunSuite

/** B200 grid-blocked spatial radius join: the t2 gate proves the 3×3
  * cell blocking lossless against the all-pairs oracle; these specs pin
  * exactly-once production (no dedup pass hides double-matches) and a
  * JVM replay of the scramble-derived geometry. */
class SpatialOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf0001

  private def scram(v: Long) = (v % 2147483648L) * 2654435761L % 2147483648L

  test("B200: result equals a JVM all-pairs replay and each pair appears once") {
    val rows = SparkEntry.queries("b200_spatial_radius_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "radius join is vacuous at this SF")
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length,
      "a pair was produced more than once (blocking double-match)")
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().collect().map(_.getLong(0))
    val pts = users.map { u =>
      val s1 = scram(u); val s2 = scram(s1)
      u -> (s1 % 1000000L, s2 % 1000000L)
    }.toMap
    val r2 = 1000000000000L / users.length
    val want = (for {
      a <- users; b <- users if a < b
      (xa, ya) = pts(a); (xb, yb) = pts(b)
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= r2
    } yield (a, b, d2)).sortBy(p => (p._1, p._2))
    assert(rows.sortBy(p => (p._1, p._2)).toSeq === want.toSeq)
  }
}
