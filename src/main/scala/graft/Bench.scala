package graft

import org.apache.spark.sql.SparkSession

/** Bench main — runs the headline query set on SPARK_GRAFT_SF_DIR (default
  * sf0.1) and prints ONE JSON line the driver records as BENCH_r{N}.json.
  *
  * Each query is fully materialized through the "noop" sink (not .count(),
  * which would let Catalyst prune the whole plan down to a metadata count
  * for scan-shaped queries). One untimed warmup of the flagship agg pays
  * JIT/codegen + parquet footer costs so the timings measure the plans.
  *
  * Steal-immune metric (VERDICT r18 item 1): alongside wall time, a
  * SparkListener accumulates per-stage EXECUTOR CPU TIME (plus shuffle
  * read/write and spill bytes), snapshotted around every rep. CPU time is
  * invariant to host CPU steal — a steal episode inflates wall while CPU
  * stays at band — so regressions and episodes are separable from the
  * artifact alone, without quiet-host re-measurement churn. Per-query
  * `cpu` (min over successful reps) rides the headline line; per-rep
  * arrays land in BENCH_DETAIL.json.
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

    // --- executor-side metric accumulation (steal-immune CPU seconds) ---
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    val shufReadB = new java.util.concurrent.atomic.AtomicLong(0)
    val shufWriteB = new java.util.concurrent.atomic.AtomicLong(0)
    val spillB = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            cpuNs.addAndGet(m.executorCpuTime)
            shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            spillB.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          }
        }
      })
    // Listener events post asynchronously; a rep's counters are only
    // complete once the bus drains. LiveListenerBus.waitUntilEmpty() is
    // private[spark] (public at the bytecode level) — reach it via
    // reflection, falling back to poll-until-stable if the internal API
    // moves.
    val drain: () => Unit =
      (try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        val wue = bus.getClass.getMethod("waitUntilEmpty")
        wue.invoke(bus) // probe once so failures fall back now
        Some(() => { wue.invoke(bus); () })
      } catch { case _: Throwable => None }).getOrElse { () =>
        var last = -1L; var stable = 0; var waited = 0
        while (stable < 2 && waited < 2000) {
          val cur = cpuNs.get
          if (cur == last) stable += 1 else { stable = 0; last = cur }
          Thread.sleep(25); waited += 25
        }
      }

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
    // Steal self-adjudication (VERDICT r17 item 2): record every rep's wall
    // time, executor CPU seconds, and a /proc/loadavg sample taken as the
    // rep STARTS — a driver-side spike is classifiable from the artifact
    // alone: wall inflated + CPU at band + elevated load = host steal;
    // wall AND CPU elevated at idle load = regression. Failed reps record
    // their elapsed time and load too, marked err=true, so anomalous reps
    // stay adjudicable (ADVICE r18 item 5).
    def loadavg(): String =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split("\\s+").take(3).mkString(" ") finally src.close()
      } catch { case _: Throwable => "" }
    final case class Rep(wall: Double, cpu: Double, load: String,
                         shufReadMb: Double, shufWriteMb: Double,
                         spillMb: Double, ok: Boolean)
    val repDetail =
      scala.collection.mutable.LinkedHashMap[String, Seq[Rep]]()
    // (name -> (min wall, cpu of successful reps' min))
    val results = SparkEntry.benchQueries
      .filter(e => only.forall(_.contains(e.name)))
      .flatMap { e =>
      val times = (1 to reps).flatMap { _ =>
        val load = loadavg()
        drain()
        val cpu0 = cpuNs.get; val sr0 = shufReadB.get
        val sw0 = shufWriteB.get; val sp0 = spillB.get
        val t0 = System.nanoTime()
        def mk(ok: Boolean) = {
          val wall = (System.nanoTime() - t0) / 1e9
          drain()
          Rep(wall, (cpuNs.get - cpu0) / 1e9, load,
            (shufReadB.get - sr0) / 1048576.0,
            (shufWriteB.get - sw0) / 1048576.0,
            (spillB.get - sp0) / 1048576.0, ok)
        }
        try {
          materialize(e.q(spark, sfDir))
          val r = mk(ok = true)
          repDetail(e.name) = repDetail.getOrElse(e.name, Seq.empty) :+ r
          Some(r)
        } catch {
          case t: Throwable =>
            System.err.println(s"[bench] ${e.name}: $t")
            errors(e.name) = t.getClass.getSimpleName
            repDetail(e.name) =
              repDetail.getOrElse(e.name, Seq.empty) :+ mk(ok = false)
            None
        }
      }
      times.map(_.wall).minOption
        .map(w => e.name -> (w, times.map(_.cpu).min))
    }
    val errs = errors
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val cpuTotal = results.map(_._2._2).sum
    def line(qs: Seq[(String, (Double, Double))], omitted: Int): String = {
      val qjson = qs.map { case (k, v) => "\"" + k + "\":" + f"${v._1}%.3f" }
        .mkString("{", ",", "}")
      val cjson = qs.map { case (k, v) => "\"" + k + "\":" + f"${v._2}%.3f" }
        .mkString("{", ",", "}")
      val om = if (omitted > 0)
        s""","queries_omitted":$omitted,"detail":"BENCH_DETAIL.json"""" else ""
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","cpu_total":$cpuTotal%.3f,"queries":$qjson,"cpu":$cjson,"errors":$errs$om,"sf":"$sfDir"}"""
    }
    // The driver records only the LAST ~2000 chars of output (BENCH_r16's
    // tail field is exactly 2000), so a full per-query map (~2.9k chars at
    // 88 queries) head-truncates and `parsed` comes back null (VERDICT r16
    // "what's missing" #5). Emit a line GUARANTEED to fit: keep the
    // heaviest (band-watched) queries and drop lightest-first until the
    // serialized line is under budget, recording how many were omitted;
    // the COMPLETE map is always written to BENCH_DETAIL.json alongside.
    val asc = results.sortBy(_._2._1)
    if (only.isEmpty) { // never clobber the full-sweep detail with an A/B
      try {
        // full map + per-rep (wall, cpu, loadavg-at-rep-start, shuffle,
        // spill, err) arrays: the steal-adjudication evidence (see
        // repDetail comment above)
        def arr(f: Rep => String) = repDetail.map { case (k, rs) =>
          "\"" + k + "\":[" + rs.map(f).mkString(",") + "]"
        }.mkString("{", ",", "}")
        val full = line(asc, 0)
        val detail = full.stripSuffix("}") +
          s""","reps":${arr(r => f"${r.wall}%.3f")}""" +
          s""","cpu_reps":${arr(r => f"${r.cpu}%.3f")}""" +
          s""","load":${arr(r => "\"" + r.load + "\"")}""" +
          s""","shuffle_read_mb":${arr(r => f"${r.shufReadMb}%.1f")}""" +
          s""","shuffle_write_mb":${arr(r => f"${r.shufWriteMb}%.1f")}""" +
          s""","spill_mb":${arr(r => f"${r.spillMb}%.1f")}""" +
          s""","rep_ok":${arr(r => r.ok.toString)}}"""
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
