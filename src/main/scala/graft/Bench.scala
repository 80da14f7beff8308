package graft

import org.apache.spark.sql.SparkSession

/** Bench main — runs the headline query set on SPARK_GRAFT_SF_DIR (default
  * sf0.1) and prints ONE JSON line the driver records as BENCH_r{N}.json.
  *
  * Each query is fully materialized through the "noop" sink (not .count(),
  * which would let Catalyst prune the whole plan down to a metadata count
  * for scan-shaped queries). One untimed warmup of the flagship agg pays
  * JIT/codegen + parquet footer costs so the timings measure the plans.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup (untimed): JIT, codegen compiler, parquet footers
    materialize(SparkEntry.queries("b17_agg_hash")(spark, sfDir))

    // min-of-3 absorbs the host's multi-second CPU-steal spikes
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // a failing rep must NOT contribute a (near-zero) elapsed time — with
    // min-of-reps the fastest failure would otherwise masquerade as the
    // best result; queries with no successful rep are reported in "errors"
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Local-A/B filter only (driver never sets it): comma-separated bench
    // names → time just those (the Verify SPARK_GRAFT_ONLY convention)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // Steal self-adjudication (VERDICT r17 item 2): record every rep's time
    // plus a /proc/loadavg sample taken as the rep STARTS, so a driver-side
    // spike is classifiable from the artifact alone — min-of-reps stable +
    // one inflated rep + elevated load = host CPU steal, not a regression;
    // all reps elevated at idle load = regression.
    def loadavg(): String =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split("\\s+").take(3).mkString(" ") finally src.close()
      } catch { case _: Throwable => "" }
    val repDetail =
      scala.collection.mutable.LinkedHashMap[String, Seq[(Double, String)]]()
    val results = SparkEntry.benchQueries
      .filter(e => only.forall(_.contains(e.name)))
      .flatMap { e =>
      val times = (1 to reps).flatMap { _ =>
        val load = loadavg()
        val t0 = System.nanoTime()
        try {
          materialize(e.q(spark, sfDir))
          val sec = (System.nanoTime() - t0) / 1e9
          repDetail(e.name) = repDetail.getOrElse(e.name, Seq.empty) :+ (sec, load)
          Some(sec)
        } catch {
          case t: Throwable =>
            System.err.println(s"[bench] ${e.name}: $t")
            errors(e.name) = t.getClass.getSimpleName
            None
        }
      }
      times.minOption.map(e.name -> _)
    }
    val errs = errors
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def line(qs: Seq[(String, Double)], omitted: Int): String = {
      val qjson = qs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      val om = if (omitted > 0)
        s""","queries_omitted":$omitted,"detail":"BENCH_DETAIL.json"""" else ""
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qjson,"errors":$errs$om,"sf":"$sfDir"}"""
    }
    // The driver records only the LAST ~2000 chars of output (BENCH_r16's
    // tail field is exactly 2000), so a full per-query map (~2.9k chars at
    // 88 queries) head-truncates and `parsed` comes back null (VERDICT r16
    // "what's missing" #5). Emit a line GUARANTEED to fit: keep the
    // heaviest (band-watched) queries and drop lightest-first until the
    // serialized line is under budget, recording how many were omitted;
    // the COMPLETE map is always written to BENCH_DETAIL.json alongside.
    val asc = results.sortBy(_._2)
    if (only.isEmpty) { // never clobber the full-sweep detail with an A/B
      try {
        // full map + per-rep times + loadavg-at-rep-start samples: the
        // steal-adjudication evidence (see repDetail comment above)
        val repsJson = repDetail.map { case (k, rs) =>
          "\"" + k + "\":[" + rs.map(r => f"${r._1}%.3f").mkString(",") + "]"
        }.mkString("{", ",", "}")
        val loadJson = repDetail.map { case (k, rs) =>
          "\"" + k + "\":[" + rs.map(r => "\"" + r._2 + "\"").mkString(",") + "]"
        }.mkString("{", ",", "}")
        val full = line(asc, 0)
        val detail = full.stripSuffix("}") +
          s""","reps":$repsJson,"load":$loadJson}"""
        val w = new java.io.PrintWriter("BENCH_DETAIL.json")
        try w.println(detail) finally w.close()
      } catch { case t: Throwable => System.err.println(s"[bench] detail: $t") }
    }
    val MaxLine = 1700
    val fit = (0 to asc.size)
      .map(drop => (drop, line(asc.drop(drop), drop)))
      .find(_._2.length <= MaxLine)
      .map(_._2).getOrElse(line(Seq.empty, asc.size))
    // rc stays 0 even with per-query errors: the JSON line (with its
    // "errors" map) must still reach the recorder
    println(fit)
    spark.stop()
  }
}
