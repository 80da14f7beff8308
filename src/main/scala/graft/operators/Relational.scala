package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** SURVEY.md §2B relational core: scans, projections, filters, joins, hash
  * aggregation (B1, B6-B18). All pure Spark built-ins — the effort is in the
  * deterministic t2 query set and the scale notes per operator.
  *
  * Scale posture (100 TB): every query here is shuffle-minimal — dimension
  * joins broadcast, fact-fact joins shuffle on their equi-keys exactly once,
  * aggregates get map-side partial aggregation automatically, and range/as-of
  * joins are rewritten to equi-joins on coarse buckets so they never
  * degenerate into O(n²) nested-loop scans.
  */
object Relational {

  /** B1 — parquet scan with predicate pushdown + column pruning.
    * `explain` must show PushedFilters: [GreaterThanOrEqual(l_quantity,45.0)]
    * and ReadSchema limited to the 4 selected columns. */
  private val b01 = entry(
    "b01_scan_parquet",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem WHERE l_quantity >= 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .filter(col("l_quantity") >= 45)
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** B6 — projection: select/alias/arithmetic, struct build + flatten.
    * The struct round-trip exercises named_struct construction and field
    * access; Catalyst collapses it back to a flat projection (zero cost). */
  private val b06 = entry(
    "b06_project_struct",
    """SELECT c_custkey AS custkey, upper(c_name) AS name_upper,
      |       round(c_acctbal * 1.1, 4) AS scaled_bal,
      |       length(c_mktsegment) AS seg_len
      |FROM customer ORDER BY custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(struct(
        col("c_custkey").as("k"), col("c_name").as("n"),
        col("c_acctbal").as("b"), col("c_mktsegment").as("m")).as("rec"))
      .select(
        col("rec.k").as("custkey"),
        upper(col("rec.n")).as("name_upper"),
        round(col("rec.b") * 1.1, 4).as("scaled_bal"),
        length(col("rec.m")).as("seg_len"))
      .orderBy("custkey")
  }

  /** B7 — compound predicates: IN, BETWEEN, LIKE, RLIKE, null-safe equality.
    * All pushed toward the scan by PushDownPredicates. */
  private val b07 = entry(
    "b07_filter_predicates",
    """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_orderstatus IN ('O','F')
      |  AND o_totalprice BETWEEN 10000 AND 200000
      |  AND o_orderpriority LIKE '%-%'
      |  AND regexp_matches(o_orderpriority, '^[1-3]-')
      |  AND (o_orderstatus IS NOT DISTINCT FROM 'O'
      |       OR o_totalprice > 50000)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("O", "F")
        && col("o_totalprice").between(10000, 200000)
        && col("o_orderpriority").like("%-%")
        && col("o_orderpriority").rlike("^[1-3]-")
        && (col("o_orderstatus") <=> "O" || col("o_totalprice") > 50000))
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  /** B9 — inner equi hash join orders⋈customer on custkey. At scale this is
    * one shuffle on the join key each side (or zero if both pre-bucketed);
    * AQE converts to broadcast at runtime if one side turns out small. */
  private val b09 = entry(
    "b09_join_inner",
    """SELECT o.o_orderkey, c.c_name, o.o_totalprice
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE o.o_totalprice > 150000
      |ORDER BY o.o_orderkey""".stripMargin, bench = true) { (s, d) =>
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 150000)
    val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select(o("o_orderkey"), c("c_name"), o("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** B10 — full outer join with nulls surviving on both sides. ORDER BY keys
    * are nullable: Spark default is ASC NULLS FIRST, spelled explicitly in
    * the DuckDB oracle (whose default is NULLS LAST). */
  private val b10 = entry(
    "b10_join_outer",
    """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
      |FROM (SELECT * FROM customer WHERE c_custkey % 2 = 0) c
      |FULL JOIN (SELECT * FROM orders WHERE o_custkey % 3 = 0) o
      |  ON c.c_custkey = o.o_custkey
      |ORDER BY c.c_custkey NULLS FIRST, o.o_orderkey NULLS FIRST""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_custkey") % 2 === 0)
    val o = Tables.orders(s, d).filter(col("o_custkey") % 3 === 0)
    c.join(o, c("c_custkey") === o("o_custkey"), "full")
      .select(c("c_custkey"), c("c_name"), o("o_orderkey"), o("o_totalprice"))
      .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
  }

  /** B11 — left semi (EXISTS) and left anti (NOT EXISTS), tagged and
    * unioned. Semi/anti never materialize right-side columns → cheapest
    * possible existence check at scale. */
  private val b11 = entry(
    "b11_join_semi_anti",
    """SELECT c_custkey, 'has_order' AS tag FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |UNION ALL
      |SELECT c_custkey, 'no_order' AS tag FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey, tag""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_order").as("tag"))
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_order").as("tag"))
    semi.unionByName(anti).orderBy("c_custkey", "tag")
  }

  /** B12 — broadcast hash join through the nation/region dimension chain.
    * Explicit broadcast(): at 100 TB the fact side streams map-side against
    * replicated dims — zero shuffle for the dim joins, one for the agg. */
  private val b12 = entry(
    "b12_join_broadcast",
    """SELECT r.r_name, count(*) AS n_cust,
      |       round(sum(c.c_acctbal), 4) AS total_bal
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin, bench = true) { (s, d) =>
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(c("c_acctbal")), 4).as("total_bal"))
      .orderBy("r_name")
  }

  /** B13 — sort-merge join, forced via the merge hint (both sides large:
    * lineitem⋈orders). SMJ is the 100 TB default for fact-fact joins —
    * shuffle+sort each side on the key, stream-merge, spill-safe. */
  private val b13 = entry(
    "b13_join_sortmerge",
    """SELECT o.o_orderpriority, count(*) AS n_items,
      |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    bench = true) { (s, d) =>
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d).hint("merge")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(o("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(l("l_extendedprice") * (lit(1) - l("l_discount"))), 4).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** B14 — theta (non-equi) nested-loop join, aggregated to keep output
    * bounded. The p_size < 10 pre-filter bounds the loop's build side; at
    * 100 TB a theta join like this must always be banded or pre-filtered —
    * documented here as the pattern. */
  private val b14 = entry(
    "b14_join_theta",
    """SELECT s.s_suppkey, count(*) AS n_parts,
      |       round(sum(p.p_retailprice), 4) AS price_sum
      |FROM part p JOIN supplier s ON p.p_retailprice < s.s_acctbal
      |WHERE p.p_size < 10
      |GROUP BY s.s_suppkey ORDER BY s.s_suppkey""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d).filter(col("p_size") < 10)
    val sup = Tables.supplier(s, d)
    p.join(sup, p("p_retailprice") < sup("s_acctbal"))
      .groupBy(sup("s_suppkey"))
      .agg(count(lit(1)).as("n_parts"), round(sum(p("p_retailprice")), 4).as("price_sum"))
      .orderBy("s_suppkey")
  }

  /** B17 — TPC-H Q1-shaped hash aggregation on lineitem. Partial (map-side)
    * aggregation + final merge is automatic; with only a handful of groups
    * the shuffle is tiny regardless of input scale. Flagship bench query. */
  private val b17 = entry(
    "b17_agg_hash",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 4) AS sum_qty,
      |       round(sum(l_extendedprice), 4) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(avg(l_extendedprice), 4) AS avg_price,
      |       round(avg(l_discount), 4) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin, bench = true) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** B18 — exact multi-distinct aggregation. Spark expands multi-distinct
    * into an Expand + two-phase agg; exact distinct at 100 TB shuffles on
    * (group, value) — the approximate twin is B19. */
  private val b18 = entry(
    "b18_count_distinct",
    """SELECT o_orderstatus,
      |       count(DISTINCT o_custkey) AS n_cust,
      |       count(DISTINCT o_orderpriority) AS n_prio,
      |       count(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")
  }

  /** Spark SQL text path (the engine's second front door besides the
    * DataFrame API): a TPC-H Q5-shaped multi-join aggregation run via
    * spark.sql over temp views — same Catalyst plan machinery, proving the
    * SQL surface end-to-end. Identical SQL runs on the DuckDB side. */
  private val b41sql = entry(
    "b06_sql_multijoin",
    """SELECT n.n_name, count(*) AS n_items,
      |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin, bench = true) { (s, d) =>
    Tables.registerAll(s, d)
    s.sql(
      """SELECT n.n_name, count(*) AS n_items,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
  }

  /** B6++ SQL subquery path — correlated scalar subqueries + EXISTS,
    * exercising Catalyst's subquery decorrelation and
    * RewritePredicateSubquery (SURVEY §4B names both). "Customers above
    * their nation's average balance who have orders." The comparison is in
    * exact integer cents×count vs cent-sum form: a float avg's partial
    * merge order is run-dependent and a boundary row would flip. */
  private val b06sub = {
    val sql =
      """SELECT c.c_custkey, c.c_nationkey, round(c.c_acctbal, 4) AS bal
        |FROM customer c
        |WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) *
        |      (SELECT count(*) FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |       FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c.c_custkey""".stripMargin
    entry("b06_sql_subquery", sql) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(sql)
    }
  }

  /** B70 — LATERAL correlated subquery join (top-N per outer row): each
    * customer's two most expensive orders, via the SQL-standard
    * `FROM outer, LATERAL (correlated ORDER BY ... LIMIT n)` form both
    * engines accept verbatim. Catalyst decorrelates the per-row LIMIT
    * into a ranked-window plan (one shuffle on the correlation key) —
    * the rewrite that keeps the naive "run the subquery per outer row"
    * formulation viable at 100 TB, where a literal nested-loop execution
    * would be |outer| subquery scans. Customers with no orders drop
    * (inner lateral semantics, both engines). */
  private val b70 = {
    val sql =
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin
    entry("b70_join_lateral", sql) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(sql)
    }
  }

  val entries: Seq[Entry] =
    Seq(b01, b06, b41sql, b06sub, b07, b09, b10, b11, b12, b13, b14, b17, b18, b70)
}
