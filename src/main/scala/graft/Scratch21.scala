package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 measurement scratch main (not part of the driver contract;
  * inert at close). Phase-decomposes the b270 release capstone's wall —
  * the serial checkpoint chain is the target (VERDICT r21 item 1) — and
  * A/Bs the b282 verify stage. */
object Scratch21 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("scratch21")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cpuNs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = e.stageInfo.taskMetrics
          if (m != null) cpuNs.addAndGet(m.executorCpuTime)
        }
      })
    def timed[A](label: String)(f: => A): A = {
      val c0 = cpuNs.get; val t0 = System.nanoTime
      val r = f
      Thread.sleep(200)
      println(f"[scratch] $label%-34s wall ${(System.nanoTime - t0) / 1e9}%6.2f" +
        f"  cpu ${(cpuNs.get - c0) / 1e9}%6.2f")
      r
    }

    val docsFull = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    // warmup: JIT + footers
    docsFull.write.format("noop").mode("overwrite").save()

    // ---- occ width probe: estimate vs actual, and W A/B ----
    if (sys.env.get("SCRATCH_OCC").nonEmpty) {
      val docs = graft.llm.TextDedup.docsWithDups(spark, sfDir)
      val occ = docs.withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 5)
        .select(col("doc_id"), posexplode_outer(expr(
          "transform(sequence(0, size(w) - 5), i -> array_join(slice(w, i + 1, 5), ' '))")))
        .select(col("doc_id"), col("pos"), col("col").as("gram"))
        .withColumn("salt",
          pmod(xxhash64(col("doc_id"), col("pos")), lit(8)).cast("int"))
      println(s"[scratch] occ estimate bytes = " +
        occ.queryExecution.optimizedPlan.stats.sizeInBytes)
      println(s"[scratch] docs estimate bytes = " +
        docs.queryExecution.optimizedPlan.stats.sizeInBytes)
      for (w <- Seq(1, 2, 4, 8); pass <- 1 to 2) {
        timed(s"  b93 e2e at W=$w pass $pass") {
          // replicate the perDoc job + rebuild at width w
          import org.apache.spark.storage.StorageLevel
          val p = occ.repartition(w, col("gram"), col("salt"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          val stats = p.groupBy("gram", "salt").agg(
              count(lit(1)).as("cnt"),
              min(struct(col("doc_id"), col("pos"))).as("first"))
            .groupBy("gram").agg(sum(col("cnt")).as("cnt"),
              min(col("first")).as("first"))
            .filter(col("cnt") > 1)
            .select(col("gram"), col("first"),
              explode(sequence(lit(0), lit(7))).as("salt"))
          val dup = p.join(stats, Seq("gram", "salt"))
            .filter(!(col("doc_id") === col("first.doc_id") &&
              col("pos") === col("first.pos")))
            .select(col("doc_id"), col("pos"))
          val pd = dup.groupBy("doc_id")
            .agg(collect_list(col("pos")).as("starts"))
            .select(col("doc_id"), expr(
              "array_distinct(flatten(transform(starts, p -> sequence(p, p + 4))))")
              .as("cov"))
            .localCheckpoint(true)
          p.unpersist(false)
          docs.select(col("doc_id"), split(col("text"), " ").as("w"))
            .join(pd, Seq("doc_id"), "left")
            .select(col("doc_id"), size(col("w")).cast("long").as("n_words"),
              expr("transform(array_except(sequence(0, size(w) - 1), coalesce(cov, array())), i -> element_at(w, i + 1))").as("kw"))
            .select(col("doc_id"), col("n_words"),
              (col("n_words") - size(col("kw")).cast("long")).as("n_removed"),
              array_join(col("kw"), " ").as("clean_text"))
            .orderBy("doc_id")
            .write.format("noop").mode("overwrite").save()
        }
      }
      spark.stop(); return
    }

    for (round <- 1 to 2) {
      println(s"--- b270 phase decomposition, pass $round ---")
      graft.functions.PolyFoldExpression.register(spark)
      val docs = docsFull.select(col("doc_id"), col("text"))
      // phase 1: span removal's eager per-doc covered relation + the
      // hygiene chain checkpoint (rel) — hygieneRelease construction
      // triggers the span jobs; the checkpoint pulls the rest
      val rel = timed("hygiene: construct (span jobs)") {
        graft.llm.CleanPipeline.hygieneRelease(docs)
      }
      val relCk = timed("hygiene: rel localCheckpoint") {
        rel.localCheckpoint(true)
      }
      // phase 2: the concurrent post-rel checkpoints (prevCount, fpPrev,
      // leak, manifest, maxId) happen inside releaseReport; approximate
      // by running the full report construction minus what phase 1 took
      timed("releaseReport: construct+futures") {
        val df = graft.llm.CorpusRelease.releaseReport(spark, docsFull)
        timed("releaseReport: final job (noop)") {
          df.write.format("noop").mode("overwrite").save()
        }
      }
      // final-job decomposition over the already-checkpointed rel
      val CR = graft.llm.CorpusRelease
      val relsrc = timed("  relsrc join") {
        relCk.join(docsFull.select(col("doc_id"), col("source")), "doc_id")
          .select(col("doc_id"), col("text"), col("source"))
      }
      timed("  datasetCard (noop)") {
        graft.llm.CorpusAnalytics.datasetCard(relsrc)
          .write.format("noop").mode("overwrite").save()
      }
      timed("  version fp (noop)") {
        relCk.select(expr(CR.rowFoldSpark).as("fp"))
          .agg(expr("bit_xor(fp)")).write.format("noop").mode("overwrite").save()
      }
      val prev = relCk.filter(col("doc_id") % 10 < CR.PublishedParts)
      val fpPrev = CR.fpOf(prev).localCheckpoint(true)
      val prevCount = prev.agg(count(lit(1)).as("n_prev")).localCheckpoint(true)
      timed("  gateReport clean (noop)") {
        CR.gateReport(relCk, fpPrev, prevCount, "clean")
          .write.format("noop").mode("overwrite").save()
      }
      timed("  gateReport corr (noop)") {
        CR.gateReport(relCk.unionByName(CR.plantOf(relCk)), fpPrev,
          prevCount, "corrupted")
          .write.format("noop").mode("overwrite").save()
      }
      timed("  manifest agg (noop)") {
        graft.llm.ModelReady.modelReadyManifest(spark, relsrc)
          .agg(countDistinct(col("seq_id")), count(lit(1)),
            sum(col("n_toks")))
          .write.format("noop").mode("overwrite").save()
      }
      relCk.unpersist()
    }
    spark.stop()
  }
}
