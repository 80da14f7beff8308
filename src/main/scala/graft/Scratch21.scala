package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 measurement scratch main (not part of the driver contract;
  * inert at close). A/Bs the iterative round shapes on the real sf0.1
  * co-purchase graph with executor-CPU accounting. */
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
    def timed(label: String)(f: => Unit): Unit = {
      // warm + 2 measured
      f
      val walls = (1 to 2).map { _ =>
        val c0 = cpuNs.get; val t0 = System.nanoTime
        f
        val w = (System.nanoTime - t0) / 1e9
        Thread.sleep(300)
        (w, (cpuNs.get - c0) / 1e9)
      }
      val best = walls.minBy(_._1)
      println(f"[scratch] $label%-28s wall ${best._1}%6.2f  cpu ${best._2}%6.2f")
    }

    import org.apache.spark.storage.StorageLevel
    val adjArr = graft.operators.GraphOps
      .copurchaseAdjacency(spark, sfDir) // (node, nbrs)

    // ---- representation A: chunked arrays, per-round explode pull ----
    def runA(): Unit = {
      val adj = graft.operators.GraphOps.chunkAdj(adjArr)
        .persist(StorageLevel.MEMORY_AND_DISK)
      adj.count()
      var l = adj.groupBy("node")
        .agg(min(array_min(col("nbrs"))).as("label")).localCheckpoint(true)
      for (_ <- 1 to 3) {
        l = adj.select(col("node"), explode(col("nbrs")).as("u"))
          .join(broadcast(l.select(col("node").as("u"), col("label"))), "u")
          .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
          .groupBy("node")
          .agg(max(col("cnt") * (1L << 32) +
            (lit((1L << 32) - 1) - col("label"))).as("best"))
          .select(col("node"),
            (lit((1L << 32) - 1) - pmod(col("best"), lit(1L << 32))).as("label"))
          .localCheckpoint(true)
      }
      adj.unpersist(true)
    }

    // ---- representation B: pre-exploded (node, od, u) rows, probe pull ----
    def runB(): Unit = {
      val ie = adjArr
        .select(col("node"), size(col("nbrs")).cast("long").as("od"),
          explode(col("nbrs")).as("u"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      ie.count()
      var l = ie.groupBy("node").agg(min(col("u")).as("label"))
        .localCheckpoint(true)
      for (_ <- 1 to 3) {
        l = ie
          .join(broadcast(l.select(col("node").as("u"), col("label"))), "u")
          .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
          .groupBy("node")
          .agg(max(col("cnt") * (1L << 32) +
            (lit((1L << 32) - 1) - col("label"))).as("best"))
          .select(col("node"),
            (lit((1L << 32) - 1) - pmod(col("best"), lit(1L << 32))).as("label"))
          .localCheckpoint(true)
      }
      ie.unpersist(true)
    }

    // ---- C: r20 push shape (localCheckpoint arrays, 2 exchanges/round) ----
    def runC(): Unit = {
      val adj = adjArr.localCheckpoint(true)
      var l = adj.select(col("node"), array_min(col("nbrs")).as("label"))
        .localCheckpoint(true)
      for (_ <- 1 to 3) {
        l = adj.join(broadcast(l), "node")
          .select(explode(col("nbrs")).as("dst"), col("label"))
          .groupBy((col("dst") * (1L << 32) + col("label")).as("pk"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(shiftrightunsigned(col("pk"), 32).as("node"))
          .agg(max(col("cnt") * (1L << 32) +
            (lit((1L << 32) - 1) - pmod(col("pk"), lit(1L << 32)))).as("best"))
          .select(col("node"),
            (lit((1L << 32) - 1) - pmod(col("best"), lit(1L << 32))).as("label"))
          .localCheckpoint(true)
      }
    }

    // ---- BFS shapes: delta-frontier push vs probe pull over B's relation --
    def bfsPush(): Unit = {
      val adj = adjArr.localCheckpoint(true)
      var dist = adj.select(col("node"))
        .filter(col("node") % 97 === 0).withColumn("dist", lit(0L))
        .localCheckpoint(true)
      var frontier = dist
      for (_ <- 1 to 4) {
        val reached = adj.join(broadcast(frontier), "node")
          .select((col("dist") + 1L).as("d1"), col("nbrs"))
          .select(col("d1"), explode(col("nbrs")).as("node"))
          .groupBy("node").agg(min(col("d1")).as("dist"))
        val fresh = reached.join(dist.select(col("node").as("seen")),
            col("node") === col("seen"), "left_anti")
          .localCheckpoint(true)
        dist = dist.unionByName(fresh).localCheckpoint(true)
        frontier = fresh
      }
    }
    def bfsPullProbe(): Unit = {
      val ie = adjArr
        .select(col("node"), explode(col("nbrs")).as("u"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      ie.count()
      var dist = ie.select(col("node")).distinct()
        .filter(col("node") % 97 === 0).withColumn("dist", lit(0L))
        .localCheckpoint(true)
      var frontier = dist
      for (_ <- 1 to 4) {
        val reached = ie
          .join(broadcast(frontier.select(col("node").as("u"),
            (col("dist") + 1L).as("d1"))), "u")
          .groupBy("node").agg(min(col("d1")).as("dist"))
        val fresh = reached.join(broadcast(dist.select(col("node").as("seen"))),
            col("node") === col("seen"), "left_anti")
          .localCheckpoint(true)
        dist = dist.unionByName(fresh).localCheckpoint(true)
        frontier = fresh
      }
      ie.unpersist(true)
    }

    // ---- decomposition: where does the LPA CPU go? -----------------
    def buildOnly(): Unit = {
      val ie = adjArr
        .select(col("node"), size(col("nbrs")).cast("long").as("od"),
          explode(col("nbrs")).as("u"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      ie.count()
      ie.unpersist(true)
    }
    def buildCheckpointOnly(): Unit = {
      adjArr.localCheckpoint(true)
    }
    val iePersist = adjArr
      .select(col("node"), size(col("nbrs")).cast("long").as("od"),
        explode(col("nbrs")).as("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    iePersist.count()
    val l1 = iePersist.groupBy("node").agg(min(col("u")).as("label"))
      .localCheckpoint(true)
    def oneRoundPull(): Unit = {
      iePersist
        .join(broadcast(l1.select(col("node").as("u"), col("label"))), "u")
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(max(col("cnt") * (1L << 32) +
          (lit((1L << 32) - 1) - col("label"))).as("best"))
        .select(col("node"),
          (lit((1L << 32) - 1) - pmod(col("best"), lit(1L << 32))).as("label"))
        .localCheckpoint(true)
    }
    def round1Only(): Unit = {
      iePersist.groupBy("node").agg(min(col("u")).as("label"))
        .localCheckpoint(true)
    }

    // ---- narrow-width variants: arrays repartitioned to k before persist
    def runAk(k: Int): Unit = {
      val adj = adjArr.repartition(k, col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      adj.count()
      var l = adj.select(col("node"), array_min(col("nbrs")).as("label"))
        .localCheckpoint(true)
      for (_ <- 1 to 3) {
        l = adj.select(col("node"), explode(col("nbrs")).as("u"))
          .join(broadcast(l.select(col("node").as("u"), col("label"))), "u")
          .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
          .groupBy("node")
          .agg(max(col("cnt") * (1L << 32) +
            (lit((1L << 32) - 1) - col("label"))).as("best"))
          .select(col("node"),
            (lit((1L << 32) - 1) - pmod(col("best"), lit(1L << 32))).as("label"))
          .localCheckpoint(true)
      }
      adj.unpersist(true)
    }
    def runBk(k: Int): Unit = {
      val ie = adjArr.repartition(k, col("node"))
        .select(col("node"), explode(col("nbrs")).as("u"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      ie.count()
      var l = ie.groupBy("node").agg(min(col("u")).as("label"))
        .localCheckpoint(true)
      for (_ <- 1 to 3) {
        l = ie
          .join(broadcast(l.select(col("node").as("u"), col("label"))), "u")
          .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
          .groupBy("node")
          .agg(max(col("cnt") * (1L << 32) +
            (lit((1L << 32) - 1) - col("label"))).as("best"))
          .select(col("node"),
            (lit((1L << 32) - 1) - pmod(col("best"), lit(1L << 32))).as("label"))
          .localCheckpoint(true)
      }
      ie.unpersist(true)
    }
    def bfsPushBcastAnti(): Unit = {
      val adj = adjArr.localCheckpoint(true)
      var dist = adj.select(col("node"))
        .filter(col("node") % 97 === 0).withColumn("dist", lit(0L))
        .localCheckpoint(true)
      var frontier = dist
      for (_ <- 1 to 4) {
        val reached = adj.join(broadcast(frontier), "node")
          .select((col("dist") + 1L).as("d1"), col("nbrs"))
          .select(col("d1"), explode(col("nbrs")).as("node"))
          .groupBy("node").agg(min(col("d1")).as("dist"))
        val fresh = reached.join(broadcast(dist.select(col("node").as("seen"))),
            col("node") === col("seen"), "left_anti")
          .localCheckpoint(true)
        dist = dist.unionByName(fresh).localCheckpoint(true)
        frontier = fresh
      }
    }

    // ---- PPR round shapes --------------------------------------------
    val restart = s"CASE WHEN node % 97 = 0 THEN 1000000000000L div 206L" +
      " ELSE 0L END" // seed count approximated; shape A/B only
    def pprPush(bcastUpdate: Boolean): Unit = {
      val adj = adjArr
        .select(col("node"), size(col("nbrs")).cast("long").as("od"), col("nbrs"))
        .localCheckpoint(true)
      val nodesOd = adj.select(col("node"), col("od"))
      var rank = nodesOd.select(col("node"), col("od"),
        expr(s"CAST($restart AS BIGINT)").as("rank")).localCheckpoint(true)
      for (_ <- 1 to 6) {
        val inflow = adj.join(broadcast(rank.filter(col("rank") > 0)
            .select(col("node"), col("rank"))), "node")
          .select(expr("rank div od").as("share"), col("nbrs"))
          .select(col("share"), explode(col("nbrs")).as("inode"))
          .groupBy("inode").agg(sum("share").as("inflow"))
        val inflowSide = if (bcastUpdate) broadcast(inflow) else inflow
        rank = nodesOd
          .join(inflowSide, col("node") === col("inode"), "left")
          .select(col("node"), col("od"),
            expr(s"CAST((15 * ($restart)) div 100" +
              " + (85 * coalesce(inflow, 0L)) div 100 AS BIGINT)").as("rank"))
          .localCheckpoint(true)
      }
    }
    def pprPullNarrow(k: Int): Unit = {
      val adj = adjArr
        .select(col("node"), size(col("nbrs")).cast("long").as("od"), col("nbrs"))
        .repartition(k, col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      adj.count()
      val nodesOd = adj.select(col("node"), col("od"))
      var rank = nodesOd.select(col("node"), col("od"),
        expr(s"CAST($restart AS BIGINT)").as("rank")).localCheckpoint(true)
      for (_ <- 1 to 6) {
        val inflow = adj.select(col("node"), explode(col("nbrs")).as("u"))
          .join(broadcast(rank.filter(col("rank") > 0)
            .select(col("node").as("u"), expr("rank div od").as("share"))), "u")
          .groupBy(col("node"))
          .agg(sum("share").as("inflow"))
          .select(col("node").as("inode"), col("inflow"))
        rank = nodesOd
          .join(inflow, col("node") === col("inode"), "left")
          .select(col("node"), col("od"),
            expr(s"CAST((15 * ($restart)) div 100" +
              " + (85 * coalesce(inflow, 0L)) div 100 AS BIGINT)").as("rank"))
          .localCheckpoint(true)
      }
      adj.unpersist(true)
    }

    timed("LPA A2 arrays k=2 pull")(runAk(2))
    timed("LPA A4 arrays k=4 pull")(runAk(4))
    timed("LPA A8 arrays k=8 pull")(runAk(8))
    timed("BFS push broadcast-anti")(bfsPushBcastAnti())
    timed("PPR push shuffled-update")(pprPush(false))
    timed("PPR push broadcast-update")(pprPush(true))
    timed("PPR pull narrow k=4")(pprPullNarrow(4))
    spark.stop()
  }
}
