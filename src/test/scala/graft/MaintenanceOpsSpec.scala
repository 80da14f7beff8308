package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MaintenanceOps
import graft.sources.Tables

/** Round-5 maintenance operators: zone-map file pruning actually skips
  * files (and loses no rows); compaction actually merges files (and loses
  * no rows). The t2 entries prove result-equivalence to the original
  * table; these specs pin the STRUCTURAL effect the oracle cannot see. */
class MaintenanceOpsSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf0001

  test("zone-map pruning skips most files and the pruned read loses no rows") {
    // materialize the layout + probe exactly as the entry does
    SparkEntry.queries("b81_scan_zonemap")(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    val b = li.agg(min("l_orderkey"), max("l_orderkey")).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val plo = lo + (hi - lo) / 3
    val phi = plo + (hi - lo) / 10
    val manifest = MaintenanceOps.zoneMap(
      spark.read.parquet(MaintenanceOps.b81LayoutDir), "l_orderkey")
    val total = manifest.count()
    val pruned = MaintenanceOps.prunedFiles(manifest, plo, phi)
    assert(total === 16L, s"expected 16 zone files, got $total")
    // a ~1/10-range probe over range-clustered files must skip most zones
    assert(pruned.nonEmpty && pruned.size <= 4,
      s"probe spanning ~1/10 of the key range should survive in <=4 of 16 zones, got ${pruned.size}")
    val fromPruned = spark.read.parquet(pruned: _*)
      .filter(col("l_orderkey").between(plo, phi)).count()
    val fromOriginal = li.filter(col("l_orderkey").between(plo, phi)).count()
    assert(fromPruned === fromOriginal,
      "pruned file set dropped matching rows — zone map is incorrect")
  }

  test("bucketed join plans with zero Exchange below the join") {
    SparkEntry.queries("b86_layout_bucketed")(spark, sf).collect()
    val joined = MaintenanceOps.bucketedJoin(spark)
    joined.collect() // force a real execution through the bucketed scans
    // string-match the AQE FINAL plan: tree collect does not descend into
    // AdaptiveSparkPlanExec's resolved subtree
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"),
      s"bucketed fact-fact join still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"expected a sort-merge join over buckets:\n$plan")
    // the scans must actually USE the bucketing, not merely read the files
    assert(plan.contains("Bucketed: true"),
      s"scan did not read bucketed:\n$plan")
  }

  test("compaction merges small files to ceil(rows/target) and keeps every row") {
    SparkEntry.queries("b82_maintain_compact")(spark, sf).collect()
    def partFiles(dir: String): Int =
      new java.io.File(dir).listFiles((_, n) =>
        n.startsWith("part-") && n.endsWith(".parquet")).length
    val smallFiles = partFiles(MaintenanceOps.b82SmallDir)
    val compactFiles = partFiles(MaintenanceOps.b82CompactDir)
    val rows = Tables.events(spark, sf).count()
    val expected = math.max(1L,
      (rows + MaintenanceOps.CompactRowsPerFile - 1) / MaintenanceOps.CompactRowsPerFile).toInt
    assert(smallFiles === 64, s"ingest fixture should write 64 files, got $smallFiles")
    assert(compactFiles === expected,
      s"compaction should write ceil($rows/${MaintenanceOps.CompactRowsPerFile}) = $expected files, got $compactFiles")
    assert(compactFiles < smallFiles, "compaction did not reduce file count")
    val compactRows = spark.read.parquet(MaintenanceOps.b82CompactDir).count()
    assert(compactRows === rows, "compaction lost or duplicated rows")
  }

  test("B185: catalog stats equal a JVM replay; planted nulls counted exactly") {
    val stats = SparkEntry.queries("b185_table_stats")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toMap
    assert(stats.keySet === Set("event_id", "user_id", "event_type", "props"))
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "props").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(ev.nonEmpty)
    // the lifted table NULLs props on event_id % 10 = 0
    val planted = ev.count(_._1 % 10 == 0).toLong
    assert(planted > 0, "no event_id hits the null plant — premise broken")
    assert(stats("props")._4 === planted)
    assert(stats("event_id") ===
      ((ev.map(_._1).distinct.length.toLong,
        ev.map(_._1).min.toString, ev.map(_._1).max.toString, 0L)))
    assert(stats("user_id") ===
      ((ev.map(_._2).distinct.length.toLong,
        ev.map(_._2).min.toString, ev.map(_._2).max.toString, 0L)))
    val types = ev.map(_._3)
    assert(stats("event_type") ===
      ((types.distinct.length.toLong, types.min, types.max, 0L)))
    val keptProps = ev.filter(_._1 % 10 != 0).map(_._4)
    assert(stats("props")._1 === keptProps.distinct.length.toLong)
    assert(stats("props")._2 === keptProps.min)
    assert(stats("props")._3 === keptProps.max)
  }

  test("B189: merged base+delta stats agree with b185's one-shot pass; both sides non-trivial") {
    val inc = SparkEntry.queries("b189_stats_incremental")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    val full = SparkEntry.queries("b185_table_stats")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toMap
    assert(inc.keySet === full.keySet)
    // bounds and null counts agree column for column (NDV is b78's job)
    inc.foreach { case (c, (_, nNull, minS, maxS)) =>
      assert((minS, maxS, nNull) === ((full(c)._2, full(c)._3, full(c)._4)), c)
    }
    // the split premise: both the base and the delta carry rows
    val ev = graft.sources.Tables.events(spark, sf).select("event_id")
      .collect().map(_.getLong(0))
    assert(ev.exists(_ % 8 == 0) && ev.exists(_ % 8 != 0))
    assert(inc("event_id")._1 === ev.length.toLong)
  }

  test("B192: both planted drifts fire, clean columns stay clean, values replay in JVM") {
    val rows = SparkEntry.queries("b192_profile_drift")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // planted: props' nulls all land in snapshot B; event_type gains an enum value
    assert(rows("props")._6 === 1L, "props null-rate drift missed")
    assert(rows("props")._3 === 0L, "snapshot A should carry zero planted nulls")
    assert(rows("props")._4 > 500L)
    assert(rows("event_type")._6 === 1L, "event_type NDV drift missed")
    assert(rows("event_type")._2 === rows("event_type")._1 + 1,
      "the planted enum value should add exactly one NDV")
    // clean columns: benign id-range movement must NOT alert
    assert(rows("event_id")._6 === 0L)
    assert(rows("user_id")._6 === 0L)
    // JVM replay of the event_type numbers
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val aTypes = ev.filter(_._1 % 2 == 1).map(_._3).distinct.length.toLong
    val bTypes = ev.filter(_._1 % 2 == 0)
      .map(e => if (e._2 % 5 == 0) "drifted" else e._3).distinct.length.toLong
    assert(rows("event_type")._1 === aTypes)
    assert(rows("event_type")._2 === bTypes)
    assert(rows("event_type")._5 === bTypes * 10000 / aTypes)
  }
  test("B252: mergeSchema unions eras losslessly — era-1 lacks the column, " +
    "merged read NULL-backfills exactly the era-1 rows, nothing drops") {
    import org.apache.spark.sql.functions._
    // run the entry first so the era dirs exist
    val got = SparkEntry.queries("b252_schema_evolution_read")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dir = graft.operators.MaintenanceOps.b252EvoDir
    val era1 = spark.read.parquet(s"$dir/era=1")
    assert(!era1.columns.contains("o_orderpriority"),
      "era-1 files must NOT carry the evolved column")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/era=1", s"$dir/era=2")
    assert(merged.columns.contains("o_orderpriority"))
    val n1 = era1.count()
    val n2 = spark.read.parquet(s"$dir/era=2").count()
    assert(n1 > 0 && n2 > 0, "the schema boundary must split the table")
    assert(merged.count() === n1 + n2, "mergeSchema dropped rows")
    assert(merged.filter(col("o_orderpriority").isNull).count() === n1,
      "NULL backfill must cover exactly the era-1 rows")
    assert(got("(pre-schema)")._1 === n1)
    assert(got.values.map(_._1).sum === n1 + n2)
  }
  test("B253: clean FK edges report exactly zero orphans; the corrupted " +
    "leg reports exactly the planted mass") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("b253_referential_audit")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size === 4)
    for (clean <- Seq("lineitem->orders", "lineitem->part",
        "orders->customer"))
      assert(got(clean)._2 === 0L && got(clean)._3 === 0L,
        s"$clean: FK integrity must hold on the generated tables")
    val planted = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 97 === 0).count()
    assert(planted > 0, "the corruption pattern must plant something")
    val (nRows, nOrph, bp) = got("corrupted_lineitem->orders")
    assert(nOrph === planted, "detector must fire on exactly the planted rows")
    assert(bp === nOrph * 10000 / nRows)
  }
  test("B254: clean PKs report zero surplus; the corrupted leg reports " +
    "exactly the planted duplicates") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("b254_uniqueness_audit")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size === 3)
    for (clean <- Seq("orders.o_orderkey", "part.p_partkey"))
      assert(got(clean)._2 === 0L && got(clean)._3 === 0L,
        s"$clean: PK uniqueness must hold on the generated tables")
    val planted = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 101 === 0).count()
    assert(planted > 0)
    val (nRows, nDupKeys, nSurplus) = got("corrupted_orders.o_orderkey")
    assert(nSurplus === planted && nDupKeys === planted,
      "each planted key duplicates exactly once")
    assert(nRows === got("orders.o_orderkey")._1 + planted)
  }
  test("B255: clean categorical columns report zero violations; the " +
    "corrupted leg reports exactly the planted mass with one bad value") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("b255_accepted_values_audit")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size === 3)
    for (clean <- Seq("orders.o_orderstatus", "events.event_type"))
      assert(got(clean)._2 === 0L && got(clean)._3 === 0L, clean)
    val planted = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 103 === 0).count()
    assert(planted > 0)
    assert(got("corrupted_orders.o_orderstatus") ===
      ((got("orders.o_orderstatus")._1, planted, 1L)))
  }

  test("B281: all 27 rows replay in the JVM (seeded legs, frozen " +
    "thresholds, floor shares) and the plants separate: Benford control " +
    "quiet, uniform fabrication loud") {
    import org.apache.spark.sql.functions._
    val M = graft.operators.PrivacyOps.UniformM
    val knuth = graft.operators.PrivacyOps.Knuth
    val got = SparkEntry.queries("b281_benford_audit")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // JVM replay from the raw parquet
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_orderkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val th = (1 to 8).map(d =>
      math.floor(math.log10(d + 1.0) * M).toLong)
    val expBp = (1 to 9).map(d =>
      math.floor(math.log10(1.0 + 1.0 / d) * 10000).toLong)
    def ladder(u: Long): Long =
      th.zipWithIndex.find(u < _._1).map(_._2 + 1L).getOrElse(9L)
    val legs = orders.flatMap { case (k, cents) =>
      val u = ((graft.llm.Winnowing.polyFoldString(s"bf:$k") % M) * knuth) % M
      Seq(("orders", cents.toString.head.asDigit.toLong),
        ("benford_plant", ladder(u)),
        ("uniform_plant", 1L + u % 9L))
    }
    val n = orders.length.toLong
    val want = legs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      .map { case ((leg, digit), cnt) =>
        val obs = cnt * 10000L / n
        val exp = expBp(digit.toInt - 1)
        (leg, digit) -> (cnt, obs, exp, obs - exp)
      }
    assert(got.size === 27, "a leg is missing digits at this SF")
    for (((leg, digit), (cnt, obs, exp, dev, _)) <- got)
      assert(want((leg, digit)) === ((cnt, obs, exp, dev)),
        s"($leg, $digit) diverges from the JVM replay")
    // MAD column is the per-leg fold of the dev column
    val madWant = want.groupBy(_._1._1).view.mapValues(
      _.values.map(v => math.abs(v._4)).sum / 9L).toMap
    for (((leg, _), v) <- got) assert(v._5 === madWant(leg))
    // separation: the Benford control is at least 5x quieter than the
    // uniform fabrication signature (measured 15 vs 586 bp at sf0.001)
    val madB = madWant("benford_plant")
    val madU = madWant("uniform_plant")
    assert(madB * 5 < madU, s"plants do not separate: $madB vs $madU")
    // per-leg counts close over the table
    for ((leg, rows) <- want.groupBy(_._1._1))
      assert(rows.values.map(_._1).sum === n, s"$leg does not cover orders")
  }
}




