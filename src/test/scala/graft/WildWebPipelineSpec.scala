package graft

import java.time.Instant

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import graft.wildweb.{WildWebConfig, WildWebPipeline}

/** Reference-semantics golden test (SURVEY §5B.3): the Spark pipeline's
  * FeatureCollection must equal fixtures/wildweb/expected_featurecollection
  * .json, which tools/make_wildweb_fixtures.py derives independently from
  * the reference semantics (task.ts:109-140). Covers every CHANGELOG-
  * documented edge: null data, bad coords, sign flip, range boundary.
  */
class WildWebPipelineSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val okDir = "/root/repo/fixtures/wildweb/run_ok"
  private val abortDir = "/root/repo/fixtures/wildweb/run_abort"
  private val now = Instant.parse("2026-01-15T12:00:00Z")
  private val mapper = new ObjectMapper()

  test("golden: 1 Week run over run_ok matches expected FeatureCollection") {
    WildWebPipeline.run(spark, okDir, WildWebConfig("1 Week", now)) match {
      case WildWebPipeline.Completed(features, errors) =>
        assert(errors.count() === 0)
        val got = mapper.readTree(WildWebPipeline.featureCollectionJson(features))
        val expected = mapper.readTree(
          new java.io.File("/root/repo/fixtures/wildweb/expected_featurecollection.json"))
        assert(got === expected)
      case other => fail(s"expected Completed, got $other")
    }
  }

  test("A7: each IncidentRange keeps the right incident set") {
    def ids(range: String): Set[String] = {
      val envs = WildWebPipeline.readEnvelopes(spark, okDir)
      WildWebPipeline.features(WildWebPipeline.incidents(envs), WildWebConfig(range, now))
        .select("id").collect().map(_.getString(0)).toSet
    }
    val bad = Set("wildweb-x006", "wildweb-x007") // 1h old, always kept
    assert(ids("24 Hours") === bad ++ Set("wildweb-w001", "wildweb-w002",
      "wildweb-w009", "wildweb-w010"))
    assert(ids("48 Hours") === bad ++ Set("wildweb-w001", "wildweb-w002",
      "wildweb-w003", "wildweb-w009", "wildweb-w010"))
    assert(ids("72 Hours") === bad ++ Set("wildweb-w001", "wildweb-w002",
      "wildweb-w003", "wildweb-w004", "wildweb-w009", "wildweb-w010"))
    // 1 Week: w006 sits exactly at now-168h — kept (strictly-older dropped)
    assert(ids("1 Week").contains("wildweb-w006"))
    assert(!ids("1 Week").contains("wildweb-w008"))
  }

  test("A10: longitude negation is unconditional (negative source flips positive)") {
    val envs = WildWebPipeline.readEnvelopes(spark, okDir)
    val feats = WildWebPipeline.features(
      WildWebPipeline.incidents(envs), WildWebConfig("1 Week", now))
    val coords = feats.filter(org.apache.spark.sql.functions.col("id") === "wildweb-w009")
      .select("geometry.coordinates").collect().head.getSeq[Double](0)
    assert(coords === Seq(120.5, 31.0))
  }

  test("A4: multi-element envelope aborts the whole run (nothing submitted)") {
    assert(WildWebPipeline.run(spark, abortDir, WildWebConfig("1 Week", now))
      === WildWebPipeline.Aborted)
  }

  test("A14: corrupt center is quarantined, others still produce features") {
    val dir = java.nio.file.Files.createTempDirectory("wildweb_corrupt")
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$okDir/center_ok.json"),
        dir.resolve("center_ok.json"))
      java.nio.file.Files.writeString(dir.resolve("center_corrupt.json"),
        """{"not": "an envelope" ~~~garbage""")
      WildWebPipeline.run(spark, dir.toString, WildWebConfig("1 Week", now)) match {
        case WildWebPipeline.Completed(features, errors) =>
          assert(errors.select("center").collect().map(_.getString(0)).toSeq
            === Seq("center_corrupt"))
          assert(features.count() === 9) // center_ok's surviving incidents
        case other => fail(s"expected Completed, got $other")
      }
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("A7/A8 divergence pinned: unparseable date drops the ROW; the reference quarantines the CENTER") {
    // Reference trajectory for a garbage date: moment('not-a-date') is
    // invalid, isBefore() returns false so the A7 range gate does NOT skip
    // it, then toISOString() yields null and `.replace` throws
    // (task.ts:113,118) into the per-center catch (task.ts:144) — one bad
    // date costs the center its WHOLE batch. graft diverges deliberately:
    // try_to_timestamp nulls the row out of the A7 filter, the center's
    // remaining incidents flow, and nothing lands in quarantine —
    // row-level damage control instead of center-level collateral (at
    // scale one poisoned row must not sink a shard). This fixture pins
    // the divergence so it stays an audited decision, not an accident.
    val dir = java.nio.file.Files.createTempDirectory("wildweb_baddate")
    try {
      java.nio.file.Files.writeString(dir.resolve("center_baddate.json"),
        """[{"retrieved": "2026-01-15T12:00:00Z", "data": [
          |  {"uuid": "bd1", "name": "GHOST FIRE", "date": "not-a-date",
          |   "latitude": "34.1", "longitude": "118.1"},
          |  {"uuid": "bd2", "name": "REAL FIRE", "date": "2026-01-15T10:00:00Z",
          |   "latitude": "34.2", "longitude": "118.2"}
          |]}]""".stripMargin)
      WildWebPipeline.run(spark, dir.toString, WildWebConfig("1 Week", now)) match {
        case WildWebPipeline.Completed(features, errors) =>
          assert(errors.count() === 0,
            "graft must NOT center-quarantine on a bad date (the reference would)")
          val ids = features.select("id").collect().map(_.getString(0)).toSeq
          assert(ids === Seq("wildweb-bd2"),
            "the unparseable-date row must drop; its center-mates must survive")
        case other => fail(s"expected Completed, got $other")
      }
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("invalid IncidentRange is rejected at config parse (A1)") {
    intercept[IllegalArgumentException] {
      WildWebConfig("12 Hours", now).rangeHours
    }
  }
}
