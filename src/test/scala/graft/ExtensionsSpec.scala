package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.wildweb.WildCadIncident

/** SparkSessionExtensions wiring + typed Dataset path + A15/A16 surfaces. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions (spark.sql.extensions conf) provides feature_id in SQL") {
    // TestSession is built with spark.sql.extensions=graft.GraftExtensions —
    // the config-driven injection path a cluster deployment would use
    // (builder.withExtensions is ignored by getOrCreate once a session
    // exists, so the conf route is the one worth pinning)
    val got = TestSession.spark.sql("SELECT feature_id('abc') AS fid")
      .collect().head.getString(0)
    assert(got === "wildweb-abc")
  }

  test("typed Dataset path decodes incidents into WildCadIncident") {
    val spark = TestSession.spark
    import spark.implicits._
    val ds = graft.wildweb.WildWebPipeline
      .incidents(graft.wildweb.WildWebPipeline.readEnvelopes(
        spark, "/root/repo/fixtures/wildweb/run_ok"))
      .select("fire.*")
      .as[WildCadIncident]
    val recs = ds.collect()
    assert(recs.length === 19) // 10 ok + 9 bad-coords (pre-filter stage)
    val w9 = recs.find(_.uuid == "w009").get
    assert(w9.ic.isEmpty && w9.longitude.contains("-120.5"))
    assert(recs.find(_.uuid == "w010").get.resources.get.size === 3)
  }

  test("A15 schema introspection returns the declared contracts") {
    import graft.wildweb.{WildWebPipeline, WildWebSchemas}
    assert(WildWebPipeline.schema("input") === WildWebSchemas.envelope.json)
    assert(WildWebPipeline.schema("output") === WildWebSchemas.feature.json)
    assert(WildWebPipeline.schema("anything-else") === "{}")
  }

  test("A16 job entrypoint: abort run submits nothing (in-process check)") {
    // run() on the abort fixture returns Aborted — WildWebJob maps that to
    // exit 0 + no POST; verified at the Outcome level (the full process
    // path is exercised by the B54/B5 HTTP test)
    val out = graft.wildweb.WildWebPipeline.run(
      TestSession.spark, "/root/repo/fixtures/wildweb/run_abort",
      graft.wildweb.WildWebConfig("1 Week",
        java.time.Instant.parse("2026-01-15T12:00:00Z")))
    assert(out === graft.wildweb.WildWebPipeline.Aborted)
  }
}
