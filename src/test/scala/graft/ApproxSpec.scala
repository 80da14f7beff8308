package graft

import org.scalatest.funsuite.AnyFunSuite

/** B19 tolerance check (SURVEY §2B: approximate ops are never hash-matched;
  * they get tolerance tests against the exact twin). */
class ApproxSpec extends AnyFunSuite {
  test("approx_count_distinct is within the configured rsd of exact") {
    val df = SparkEntry.queries("b19_agg_approx_distinct")(
      TestSession.spark, TestSession.sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      // rsd 0.02 requested; allow 5 sigma
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
