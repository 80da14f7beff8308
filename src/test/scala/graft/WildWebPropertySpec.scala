package graft

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.wildweb.WildWebPipeline

/** Property-based checks for the wildweb scalar transforms (SURVEY §5B.4):
  * generated inputs run through the REAL Spark expressions in one batch,
  * compared against an independent JVM-side model of the reference
  * semantics (task.ts:118, 120-124, 138).
  */
class WildWebPropertySpec extends AnyFunSuite {
  private val spark = TestSession.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("A8 property: normalization = minute-truncated UTC yyyy-MM-dd HH:mm for any instant") {
    val instants = samples(
      Gen.choose(0L, 4102444800L).map(Instant.ofEpochSecond(_)), 400)
    val isoStrings = instants.map(_.toString) // ISO-8601 with Z
    val got = isoStrings.toDF("d")
      .select(WildWebPipeline.normalizedDate(col("d")))
      .collect().map(_.getString(0))
    val expected = instants.map(i =>
      DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm").withZone(ZoneOffset.UTC)
        .format(i.truncatedTo(java.time.temporal.ChronoUnit.MINUTES)))
    assert(got.toSeq === expected)
  }

  test("A9 property: kept iff input parses to a nonzero finite number") {
    val coordGen: Gen[String] = Gen.frequency(
      4 -> Gen.choose(-180.0, 180.0).map(_.toString),
      1 -> Gen.const(""),
      1 -> Gen.const(" "),
      1 -> Gen.const("0"),
      1 -> Gen.const("0.0"),
      1 -> Gen.const("-0.0"),
      1 -> Gen.alphaStr,
      1 -> Gen.choose(-1000, 1000).map(_.toString),
      1 -> Gen.const("1e5"),
      1 -> Gen.const("NaN"),
      1 -> Gen.const("Infinity"))
    val inputs = samples(coordGen, 500)
    val got = inputs.toDF("c")
      .select(WildWebPipeline.coordValid(col("c")))
      .collect().map(_.getBoolean(0))
    def model(s: String): Boolean = {
      // reference model: Number(s) nonzero and finite-or... task.ts only
      // checks isNaN and ===0; Infinity passes in JS and parses in Spark too
      val t = s.trim
      if (t.isEmpty) false // JS: Number('')===0 → zero check drops it
      else try {
        val v = t.toDouble
        !v.isNaN && v != 0.0
      } catch { case _: NumberFormatException => false }
    }
    for ((in, g) <- inputs.zip(got))
      assert(g === model(in), s"coordValid('$in') = $g, model says ${model(in)}")
  }

  test("A10 property: output longitude is exactly the negated parsed input") {
    val lons = samples(Gen.choose(-180.0, 180.0).map(v => f"$v%.6f"), 300)
      .filter(s => s.toDouble != 0.0)
    val got = lons.toDF("longitude")
      .select((-col("longitude").try_cast("double")).as("neg"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq === lons.map(s => -s.toDouble))
  }

  test("set-op algebra: union/except identities hold on a real table") {
    val o = graft.sources.Tables.orders(spark, TestSession.sf0001)
      .select("o_orderkey")
    // A ∪ A distinct = A; A \ A = ∅; (A ∪ B) ⊇ A
    assert(o.unionByName(o).distinct().count() === o.count())
    assert(o.except(o).count() === 0)
    val b = o.limit(100)
    assert(o.unionByName(b).distinct().count() === o.count())
    assert(o.intersect(b).count() === b.count())
  }
}
