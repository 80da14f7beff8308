package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables
import graft.llm.Winnowing

/** B258 — THE PUBLISH-GATE AUDIT CAPSTONE: the engine's single-purpose
  * audit legs composed into ONE go/no-go report over a published-table
  * candidate — the `dbt test` run (or Deequ VerificationSuite) that
  * production gates a snapshot publish on. Single checks answer "is this
  * property violated"; a publish decision needs ALL of them as one
  * artifact with one verdict row — that composition is this operator.
  *
  * The scenario: `previous` is the already-published orders snapshot
  * (o_orderdate < [[CutoffDate]]); the `candidate` appends the new
  * period's ingest. Seven legs, each reusing a proven single-audit shape:
  *
  *   - `unique:o_orderkey`                — b254 (dbt `unique`): surplus rows
  *   - `relationships:o_custkey->customer`— b253 (dbt `relationships`)
  *   - `accepted_values:o_orderstatus`    — b255 (dbt `accepted_values`)
  *   - `not_null:o_custkey`               — b73's null-rule leg
  *   - `range:o_totalprice_positive`      — b73's value-range leg
  *   - `row_count:growth_band`            — b192's drift rule on the one
  *     statistic a publish always checks: candidate/previous row ratio
  *     must stay inside [[GrowthLoBp]]..[[GrowthHiBp]] bp (an empty batch
  *     and a double-ingest both trip it)
  *   - `fingerprint:immutable_segments`   — b77's order-independent
  *     per-segment XOR checksum: the candidate's ALREADY-PUBLISHED year
  *     segments must be bit-identical to the previous snapshot's
  *     (published history is append-only; a changed old segment is
  *     corruption no row-level rule sees)
  *
  * The entry runs the gate TWICE — on the clean candidate (all legs pass,
  * verdict `go`) and on a candidate with corruption planted in the NEW
  * batch only (every 101st new-period order duplicated): exactly ONE leg
  * fires (`unique`, failures = the planted mass exactly), the verdict
  * flips to `no-go`, and no other leg moves — leg isolation is the whole
  * diagnostic value of a gate report (PublishGateSpec plants three
  * different corruptions and proves each trips exactly its own leg).
  *
  * Integer-exact throughout: counts, BIGINT floor-division ratio, XOR of
  * the shared cross-engine polynomial fold over a canonical rendering
  * (the b77 null-total `chr(1)` convention).
  *
  * Scale posture (100 TB): every leg is the sanctioned scalar-aggregate
  * class — map-side partial aggregates collapsing to O(1) rows (the only
  * SinglePartition exchanges carry one row per partition), the FK leg is
  * one left-anti join against the broadcast parent key set, the
  * fingerprint leg is catalog-sized (|segments| rows). The verdict row
  * re-derives from the legs' union here for oracle parity; production
  * materializes the 8-row report once and reads the verdict from it, so
  * the gate costs one pass per audited column class. */
object PublishGate {

  /** Publish boundary: rows before it are the already-published snapshot. */
  val CutoffDate = "2001-01-01"

  /** Accepted growth band for candidate/previous in bp — the fixture's
    * one-period append lands at ~10900-10970 bp at every SF; an empty
    * batch (10000) and a doubled feed both fall outside. */
  val GrowthLoBp = 10200L
  val GrowthHiBp = 12000L

  private val Statuses = Seq("O", "F", "P")

  // b77's null-total canonical rendering over the audited orders columns
  private val sparkRow = "concat_ws('|', " + Seq(
    "coalesce(CAST(o_orderkey AS STRING), chr(1))",
    "coalesce(CAST(o_custkey AS STRING), chr(1))",
    "coalesce(o_orderstatus, chr(1))",
    "coalesce(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING), chr(1))",
    "coalesce(date_format(o_orderdate, 'yyyy-MM-dd'), chr(1))")
    .mkString(", ") + ")"
  private val duckRow = Seq(
    "coalesce(CAST(o_orderkey AS VARCHAR), chr(1))",
    "coalesce(CAST(o_custkey AS VARCHAR), chr(1))",
    "coalesce(o_orderstatus, chr(1))",
    "coalesce(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), chr(1))",
    "coalesce(strftime(o_orderdate, '%Y-%m-%d'), chr(1))")
    .mkString(" || '|' || ")

  /** Per-year-segment (n, XOR fingerprint) of a snapshot's published part. */
  private def fpOf(df: DataFrame): DataFrame = df
    .filter(col("o_orderdate") < to_date(lit(CutoffDate)))
    .select(year(col("o_orderdate")).as("yr"), expr(sparkRow).as("row_str"))
    .select(col("yr"), expr(Winnowing.polyFoldSpark("row_str")).as("fp"))
    .groupBy("yr")
    .agg(count(lit(1)).as("n"), expr("bit_xor(fp)").cast("long").as("fp"))

  /** The 7 audit legs + verdict row over one candidate, labeled. Reusable
    * with ANY orders-shaped candidate (the spec plants its own
    * corruptions through it). */
  def gateReport(candidate: DataFrame, previous: DataFrame,
      customer: DataFrame, label: String): DataFrame = {
    def countLeg(id: String, failures: DataFrame): DataFrame =
      candidate.agg(count(lit(1)).as("n_checked"))
        .crossJoin(broadcast(failures))
        .select(lit(id).as("check_id"), col("n_checked"), col("n_failures"))
    val unique = candidate.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .agg(sum("c").as("n_checked"),
        (sum("c") - count(lit(1))).as("n_failures"))
      .select(lit("unique:o_orderkey").as("check_id"),
        col("n_checked"), col("n_failures"))
    val rel = countLeg("relationships:o_custkey->customer",
      candidate.join(
          broadcast(customer.select(col("c_custkey")).distinct()),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_failures")))
    val accepted = countLeg("accepted_values:o_orderstatus",
      candidate.filter(!col("o_orderstatus").isin(Statuses: _*))
        .agg(count(lit(1)).as("n_failures")))
    val notNull = countLeg("not_null:o_custkey",
      candidate.filter(col("o_custkey").isNull)
        .agg(count(lit(1)).as("n_failures")))
    val range = countLeg("range:o_totalprice_positive",
      candidate.filter(col("o_totalprice") <= 0)
        .agg(count(lit(1)).as("n_failures")))
    // n_prev = 0 (a first publish) is an explicit fail, not an engine
    // edge: Spark's null div and DuckDB's division-by-zero error would
    // otherwise diverge (r16 advice) — first publishes bypass the gate.
    val rowCount = candidate.agg(count(lit(1)).as("n_cand"))
      .crossJoin(broadcast(previous.agg(count(lit(1)).as("n_prev"))))
      .select(lit("row_count:growth_band").as("check_id"),
        lit(1L).as("n_checked"),
        expr(s"CAST(CASE WHEN n_prev = 0 THEN 1" +
          s" WHEN n_cand * 10000 div n_prev" +
          s" BETWEEN $GrowthLoBp AND $GrowthHiBp" +
          " THEN 0 ELSE 1 END AS BIGINT)").as("n_failures"))
    // Driven from PREVIOUS with a left join (r16 advice): a candidate
    // that DROPS a published year entirely is deleted history — exactly
    // this leg's corruption class — and must count as that year's
    // failure (c_fp comes back null), not silently vanish from an inner
    // join. n_checked = |previous year segments| in both spellings.
    val p = fpOf(previous)
    val c = fpOf(candidate)
    val fingerprint = p.select(col("yr"), col("n").as("p_n"),
        col("fp").as("p_fp"))
      .join(broadcast(c.select(col("yr"), col("n").as("c_n"),
        col("fp").as("c_fp"))), Seq("yr"), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("c_fp").isNull || !(col("p_fp") <=> col("c_fp"))
          || !(col("p_n") <=> col("c_n")), 1L).otherwise(0L))
          .as("n_failures"))
      .select(lit("fingerprint:immutable_segments").as("check_id"),
        col("n_checked"), col("n_failures"))
    val legs = unique.unionByName(rel).unionByName(accepted)
      .unionByName(notNull).unionByName(range).unionByName(rowCount)
      .unionByName(fingerprint)
    val verdict = legs.agg(sum("n_failures").as("n_failures"))
      .select(lit("zz_publish_verdict").as("check_id"),
        lit(7L).as("n_checked"), col("n_failures"))
    legs.unionByName(verdict)
      .select(lit(label).as("candidate"), col("check_id"),
        col("n_checked").cast("long").as("n_checked"),
        col("n_failures").cast("long").as("n_failures"),
        expr("CASE WHEN check_id = 'zz_publish_verdict'" +
          " THEN CASE WHEN n_failures = 0 THEN 'go' ELSE 'no-go' END" +
          " ELSE CASE WHEN n_failures = 0 THEN 'pass' ELSE 'fail' END END")
          .as("status"))
  }

  private def legsSql(rel: String, fpRel: String): String =
    s"""  SELECT 'accepted_values:o_orderstatus' AS check_id,
       |         (SELECT count(*) FROM $rel) AS n_checked,
       |         (SELECT count(*) FROM $rel
       |          WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS n_failures
       |  UNION ALL
       |  SELECT 'fingerprint:immutable_segments',
       |         (SELECT count(*) FROM fp_prev),
       |         (SELECT count(*) FROM fp_prev p LEFT JOIN $fpRel c USING (yr)
       |          WHERE c.fp IS NULL OR p.fp IS DISTINCT FROM c.fp
       |             OR p.n IS DISTINCT FROM c.n)
       |  UNION ALL
       |  SELECT 'not_null:o_custkey',
       |         (SELECT count(*) FROM $rel),
       |         (SELECT count(*) FROM $rel WHERE o_custkey IS NULL)
       |  UNION ALL
       |  SELECT 'range:o_totalprice_positive',
       |         (SELECT count(*) FROM $rel),
       |         (SELECT count(*) FROM $rel WHERE o_totalprice <= 0)
       |  UNION ALL
       |  SELECT 'relationships:o_custkey->customer',
       |         (SELECT count(*) FROM $rel),
       |         (SELECT count(*) FROM $rel r
       |          WHERE NOT EXISTS (SELECT 1 FROM customer c
       |                            WHERE c.c_custkey = r.o_custkey))
       |  UNION ALL
       |  SELECT 'row_count:growth_band',
       |         1,
       |         CASE WHEN (SELECT count(*) FROM prev) = 0 THEN 1
       |              WHEN (SELECT count(*) FROM $rel) * 10000
       |                   // (SELECT count(*) FROM prev)
       |                   BETWEEN $GrowthLoBp AND $GrowthHiBp
       |              THEN 0 ELSE 1 END
       |  UNION ALL
       |  SELECT 'unique:o_orderkey',
       |         (SELECT count(*) FROM $rel),
       |         (SELECT count(*) - count(DISTINCT o_orderkey) FROM $rel)"""
      .stripMargin

  private def fpSql(rel: String): String =
    s"""  SELECT year(o_orderdate) AS yr, count(*) AS n,
       |         bit_xor(${Winnowing.polyFoldDuck(s"($duckRow)")}) AS fp
       |  FROM $rel WHERE o_orderdate < DATE '$CutoffDate' GROUP BY 1"""
      .stripMargin

  private val b258 = entry(
    "b258_publish_gate",
    s"""WITH prev AS (
       |  SELECT * FROM orders WHERE o_orderdate < DATE '$CutoffDate'),
       |cand_clean AS (SELECT * FROM orders),
       |cand_corr AS (
       |  SELECT * FROM orders
       |  UNION ALL
       |  SELECT * FROM orders
       |  WHERE o_orderdate >= DATE '$CutoffDate' AND o_orderkey % 101 = 0),
       |fp_prev AS (
       |${fpSql("prev")}),
       |fp_clean AS (
       |${fpSql("cand_clean")}),
       |fp_corr AS (
       |${fpSql("cand_corr")}),
       |legs_clean AS (
       |${legsSql("cand_clean", "fp_clean")}),
       |legs_corr AS (
       |${legsSql("cand_corr", "fp_corr")}),
       |rep AS (
       |  SELECT 'clean' AS candidate, check_id, n_checked, n_failures
       |  FROM legs_clean
       |  UNION ALL
       |  SELECT 'corrupted', check_id, n_checked, n_failures FROM legs_corr
       |  UNION ALL
       |  SELECT 'clean', 'zz_publish_verdict', 7,
       |         (SELECT sum(n_failures) FROM legs_clean)
       |  UNION ALL
       |  SELECT 'corrupted', 'zz_publish_verdict', 7,
       |         (SELECT sum(n_failures) FROM legs_corr))
       |SELECT candidate, check_id, CAST(n_checked AS BIGINT) AS n_checked,
       |       CAST(n_failures AS BIGINT) AS n_failures,
       |       CASE WHEN check_id = 'zz_publish_verdict'
       |            THEN CASE WHEN n_failures = 0 THEN 'go' ELSE 'no-go' END
       |            ELSE CASE WHEN n_failures = 0 THEN 'pass' ELSE 'fail' END
       |       END AS status
       |FROM rep ORDER BY candidate, check_id""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d)
    val customer = Tables.customer(s, d)
    val previous = orders.filter(col("o_orderdate") < to_date(lit(CutoffDate)))
    val corrupted = orders.unionByName(orders.filter(
      col("o_orderdate") >= to_date(lit(CutoffDate))
        && col("o_orderkey") % 101 === 0))
    gateReport(orders, previous, customer, "clean")
      .unionByName(gateReport(corrupted, previous, customer, "corrupted"))
      .orderBy("candidate", "check_id")
  }

  val entries: Seq[Entry] = Seq(b258)
}
