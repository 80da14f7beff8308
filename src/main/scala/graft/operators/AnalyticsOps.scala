package graft.operators

import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** Product-analytics operator family beyond the funnel/cohort/transition
  * rows (B117/B118/B195): association rules over order baskets (B197).
  *
  * Everything here follows the repo's exactness contract (SURVEY §2B
  * preamble): BIGINT fixed-point metrics (bp = 10⁴, micro = 10⁶) with
  * documented overflow bounds, floor division on POSITIVE operands only
  * (so Spark `div` ≡ DuckDB `//`), and a total ORDER BY over a unique
  * key.
  */
object AnalyticsOps {

  /** Minimum pair support (baskets containing both items). 2 is the
    * smallest non-trivial threshold and is non-vacuous at all three gate
    * SFs (2 324 / 3 445 / 3 573 surviving pairs at sf0.001/0.01/0.1). */
  private val MinSup = 2L

  /** B197 — MARKET-BASKET ASSOCIATION RULES (Agrawal & Srikant,
    * VLDB'94): the A-priori pair pass over order baskets. A basket is an
    * order's DISTINCT part set; for every co-occurring pair (p1 < p2)
    * surviving [[MinSup]] the row carries the classic rule metrics, all
    * exact BIGINT fixed point:
    *
    *   - support_bp  = n_pair·10⁴ div N          (share of all baskets)
    *   - conf12_bp   = n_pair·10⁴ div n(p1)      (confidence p1 → p2)
    *   - conf21_bp   = n_pair·10⁴ div n(p2)      (confidence p2 → p1)
    *   - lift_micro  = n_pair·N·10⁶ div (n(p1)·n(p2))
    *
    * Overflow bound: n_pair ≤ N, so lift's numerator ≤ N²·10⁶ — safe in
    * BIGINT while N < ~3·10⁶ baskets; past that, drop the lift scale to
    * 10⁴ (the bound is a property of the SCALE constant, not the plan).
    * All operands are positive, so floor division is truncation in both
    * engines.
    *
    * This is the rule-mining semantics over the same co-purchase
    * self-join shape B119 ranks with PageRank (GraphOps.copurchaseEdges):
    * per-order pair fanout is C(basket, 2), bounded by basket size
    * (≤ 13 distinct parts/order in the generated data), never |parts|².
    *
    * Scale posture (100 TB): one distinct pass over the fact table, one
    * self-join keyed on the order key with bounded fanout feeding a
    * map-combinable (p1, p2) count, then two joins against the
    * |parts|-sized item-count dimension (broadcast) and one O(1) basket
    * count scalar cross-broadcast (the b100/b109 one-row convention). No
    * window, no corpus-side all-pairs. */
  private val b197 = entry(
    "b197_basket_rules",
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |n AS (SELECT count(DISTINCT o) AS n_baskets FROM items),
       |itemn AS (SELECT p, count(*) AS n_item FROM items GROUP BY p),
       |pairs AS (
       |  SELECT a.p AS p1, b.p AS p2, count(*) AS n_pair
       |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
       |  GROUP BY a.p, b.p)
       |SELECT p.p1, p.p2, CAST(p.n_pair AS BIGINT) AS n_pair,
       |       CAST(p.n_pair * 10000 // n.n_baskets AS BIGINT) AS support_bp,
       |       CAST(p.n_pair * 10000 // i1.n_item AS BIGINT) AS conf12_bp,
       |       CAST(p.n_pair * 10000 // i2.n_item AS BIGINT) AS conf21_bp,
       |       CAST(p.n_pair * n.n_baskets * 1000000 // (i1.n_item * i2.n_item)
       |            AS BIGINT) AS lift_micro
       |FROM pairs p CROSS JOIN n
       |JOIN itemn i1 ON i1.p = p.p1
       |JOIN itemn i2 ON i2.p = p.p2
       |WHERE p.n_pair >= $MinSup
       |ORDER BY p.p1, p.p2""".stripMargin, bench = true) { (s, d) =>
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val nTot = items.agg(countDistinct(col("o")).as("n_baskets"))
    val itemN = items.groupBy("p").agg(count(lit(1)).as("n_item"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= MinSup)
    pairs
      .crossJoin(broadcast(nTot))
      .join(broadcast(itemN.select(col("p").as("p1"), col("n_item").as("n1"))),
        "p1")
      .join(broadcast(itemN.select(col("p").as("p2"), col("n_item").as("n2"))),
        "p2")
      .select(col("p1"), col("p2"), col("n_pair"),
        expr("CAST(n_pair * 10000 div n_baskets AS BIGINT)").as("support_bp"),
        expr("CAST(n_pair * 10000 div n1 AS BIGINT)").as("conf12_bp"),
        expr("CAST(n_pair * 10000 div n2 AS BIGINT)").as("conf21_bp"),
        expr("CAST(n_pair * n_baskets * 1000000 div (n1 * n2) AS BIGINT)")
          .as("lift_micro"))
      .orderBy("p1", "p2")
  }

  /** "now" for B199's recency metric: 2001-09-01T00:00Z in epoch µs — a
    * literal parameter (Registry determinism contract: never
    * current_timestamp()), one month past the orders table's max
    * o_orderdate (2001-08-01), so every recency is strictly positive. */
  private val NowUs = 999302400000000L

  /** B199 — RFM SEGMENTATION (Hughes 1994; the classic customer-value
    * quintile grid): per customer over orders,
    * recency_days = (now − max(o_orderdate)) div day (positive by the
    * [[NowUs]] choice), frequency = order count, monetary_cents =
    * Σ floor(o_totalprice·100 + 0.5) — the cents fixed point is taken
    * PER ROW before the sum (o_totalprice carries float error at the 3rd
    * decimal; floor(+0.5) of a 2-decimal-intended double is
    * engine-identical IEEE, and the BIGINT sum is then order-independent,
    * where a double sum would hash-diverge on summation order).
    * Quintiles are ntile(5) over total orders (metric, custkey) — ANSI
    * ntile (⌈n/5⌉-sized leading buckets) is deterministic given a total
    * order and identical in both engines; recency ranks ASC (most recent
    * = bucket 1), frequency/monetary rank DESC (best = bucket 1), and
    * rfm_code = r·100 + f·10 + m.
    *
    * Scale posture: one map-combinable aggregate keyed on the customer,
    * then three global ntile windows over the CUSTOMER DIMENSION — the
    * b28 global-sort cost class on a relation ~10⁴× smaller than the
    * fact table (the windows never see the order rows). */
  private val b199 = entry(
    "b199_rfm_segments",
    s"""WITH m AS (
       |  SELECT o_custkey,
       |         CAST(($NowUs - epoch_us(max(o_orderdate))) // 86400000000
       |              AS BIGINT) AS recency_days,
       |         count(*) AS frequency,
       |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
       |              AS BIGINT) AS monetary_cents
       |  FROM orders GROUP BY o_custkey),
       |q AS (
       |  SELECT o_custkey, recency_days, frequency, monetary_cents,
       |         CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey)
       |              AS BIGINT) AS r_q,
       |         CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
       |              AS BIGINT) AS f_q,
       |         CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey)
       |              AS BIGINT) AS m_q
       |  FROM m)
       |SELECT o_custkey, recency_days, frequency, monetary_cents,
       |       r_q, f_q, m_q, r_q * 100 + f_q * 10 + m_q AS rfm_code
       |FROM q ORDER BY o_custkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val m = Tables.orders(s, d).groupBy("o_custkey").agg(
      // o_orderdate decodes as TIMESTAMP_NTZ; the cast is exact under the
      // UTC session timezone (Tables.events note)
      expr(s"CAST(($NowUs - unix_micros(CAST(max(o_orderdate) AS TIMESTAMP)))" +
        " div 86400000000 AS BIGINT)").as("recency_days"),
      count(lit(1)).as("frequency"),
      sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .as("monetary_cents"))
    val rw = Window.orderBy(col("recency_days"), col("o_custkey"))
    val fw = Window.orderBy(col("frequency").desc, col("o_custkey"))
    val mw = Window.orderBy(col("monetary_cents").desc, col("o_custkey"))
    m.select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        ntile(5).over(rw).cast("long").as("r_q"),
        ntile(5).over(fw).cast("long").as("f_q"),
        ntile(5).over(mw).cast("long").as("m_q"))
      .withColumn("rfm_code",
        col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
      .orderBy("o_custkey")
  }

  /** Welch t² as ONE shared expression text (the bm25Expr float
    * convention): both engines take the exact BIGINT sufficient
    * statistics, promote via explicit CAST(· AS DOUBLE) — a bare `1.0`
    * literal parses as DECIMAL in BOTH engines and decimal arithmetic
    * does not hash like IEEE — and walk the identical left-associated
    * IEEE op sequence, so round(·,4) hashes. v/n is spelled
    * (n·Σx² − Σx·Σx) / (n²·(n−1)). */
  private val welchT2Expr: String =
    "round(((CAST(sum1 AS DOUBLE)/nu1 - CAST(sum0 AS DOUBLE)/nu0)" +
      " * (CAST(sum1 AS DOUBLE)/nu1 - CAST(sum0 AS DOUBLE)/nu0))" +
      " / ((CAST(nu0 AS DOUBLE)*ss0 - CAST(sum0 AS DOUBLE)*sum0)" +
      " / (CAST(nu0 AS DOUBLE)*nu0*(nu0-1))" +
      " + (CAST(nu1 AS DOUBLE)*ss1 - CAST(sum1 AS DOUBLE)*sum1)" +
      " / (CAST(nu1 AS DOUBLE)*nu1*(nu1-1))), 4)"

  /** B201 — A/B EXPERIMENT READOUT (the two-sample Welch test over a
    * deterministic assignment; Kohavi et al., KDD'07 practice): users
    * are assigned variant = knuth_scramble(user_id) % 2 — the SCRAMBLED
    * selector is mandatory for any keep/split gate (SCALE.md §3.9: raw
    * folds keep contiguous id runs wholesale) — and the metric is each
    * user's total purchase VALUE in exact cents (floor(value·100 + 0.5)
    * per event row, then BIGINT sums; users with no purchase events
    * count as 0 — intent-to-treat, so nu0+nu1 = all users). The readout
    * row carries the exact per-variant sufficient statistics (n, Σx,
    * Σx²), integer mean cents, and Welch's t² from [[welchT2Expr]] —
    * sufficient statistics make the whole test ONE map-combinable
    * aggregate (the b196 OLS argument, here for inference).
    *
    * Overflow bounds (documented, not checked per row): Σx² ≤
    * users·(maxUserCents)² ≈ 7.5·10¹³ at sf0.1 and sum0² ≈ 5.8·10¹⁶ —
    * inside BIGINT; past ~10⁸ users the float promotion moves before the
    * products (the expression constant changes, not the plan). */
  private val b201 = entry(
    "b201_ab_experiment",
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |v AS (SELECT user_id,
       |             (((user_id % 2147483648) * 2654435761) % 2147483648) % 2
       |               AS variant FROM u),
       |px AS (SELECT user_id,
       |              sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
       |       FROM events WHERE event_type = 'purchase' GROUP BY user_id),
       |x AS (SELECT v.variant, coalesce(px.cents, 0) AS cents
       |      FROM v LEFT JOIN px ON px.user_id = v.user_id),
       |st AS (SELECT variant, count(*) AS nu, sum(cents) AS sx,
       |              sum(cents * cents) AS sxx
       |       FROM x GROUP BY variant),
       |piv AS (SELECT
       |    CAST(sum(CASE WHEN variant = 0 THEN nu ELSE 0 END) AS BIGINT) AS nu0,
       |    CAST(sum(CASE WHEN variant = 1 THEN nu ELSE 0 END) AS BIGINT) AS nu1,
       |    CAST(sum(CASE WHEN variant = 0 THEN sx ELSE 0 END) AS BIGINT) AS sum0,
       |    CAST(sum(CASE WHEN variant = 1 THEN sx ELSE 0 END) AS BIGINT) AS sum1,
       |    CAST(sum(CASE WHEN variant = 0 THEN sxx ELSE 0 END) AS BIGINT) AS ss0,
       |    CAST(sum(CASE WHEN variant = 1 THEN sxx ELSE 0 END) AS BIGINT) AS ss1
       |  FROM st)
       |SELECT nu0, nu1, sum0, sum1, ss0, ss1,
       |       CAST(sum0 // nu0 AS BIGINT) AS mean0_cents,
       |       CAST(sum1 // nu1 AS BIGINT) AS mean1_cents,
       |       CAST(sum1 // nu1 AS BIGINT) - CAST(sum0 // nu0 AS BIGINT)
       |         AS diff_cents,
       |       $welchT2Expr AS t2
       |FROM piv""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val u = ev.select("user_id").distinct()
    val v = u.withColumn("variant",
      expr("(((user_id % 2147483648) * 2654435761) % 2147483648) % 2"))
    val px = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("cents"))
    val x = v.join(px, Seq("user_id"), "left")
      .select(col("variant"), coalesce(col("cents"), lit(0L)).as("cents"))
    val st = x.groupBy("variant").agg(
      count(lit(1)).as("nu"), sum("cents").as("sx"),
      sum(col("cents") * col("cents")).as("sxx"))
    st.agg(
        sum(when(col("variant") === 0, col("nu")).otherwise(0L)).as("nu0"),
        sum(when(col("variant") === 1, col("nu")).otherwise(0L)).as("nu1"),
        sum(when(col("variant") === 0, col("sx")).otherwise(0L)).as("sum0"),
        sum(when(col("variant") === 1, col("sx")).otherwise(0L)).as("sum1"),
        sum(when(col("variant") === 0, col("sxx")).otherwise(0L)).as("ss0"),
        sum(when(col("variant") === 1, col("sxx")).otherwise(0L)).as("ss1"))
      .select(col("nu0"), col("nu1"), col("sum0"), col("sum1"),
        col("ss0"), col("ss1"),
        expr("CAST(sum0 div nu0 AS BIGINT)").as("mean0_cents"),
        expr("CAST(sum1 div nu1 AS BIGINT)").as("mean1_cents"),
        expr("CAST(sum1 div nu1 AS BIGINT) - CAST(sum0 div nu0 AS BIGINT)")
          .as("diff_cents"),
        expr(welchT2Expr).as("t2"))
  }

  /** B202 — TIME-WEIGHTED AVERAGE VALUE per user (the TWAP/VWAP shape of
    * financial time series, on the events domain): each observation
    * holds until the next one (a right-continuous step function), so the
    * weight of a value is the interval to the user's NEXT event —
    * lead(ts) OVER (PARTITION BY user ORDER BY ts, event_id), event_id
    * breaking timestamp ties (the b195 total order), last observation
    * carrying no interval. twap_cents = Σ(cents·Δms) div Σ(Δms), exact
    * BIGINT end to end: cents = floor(value·100 + 0.5) per row and Δms =
    * Δµs div 1000 (ms keeps cents·Δms ≤ ~1.6·10¹⁵ per interval —
    * documented bound; Δ ≥ 0 by the ordering so all divisions are on
    * positive operands). Users whose events all share one timestamp
    * (Σms = 0) drop — the HAVING mirrors in both engines.
    *
    * Scale posture: one lead window PARTITIONED BY USER (state bounded
    * per user), one map-combinable per-user sum — the b195 cost class;
    * no global window, no driver traffic. */
  private val b202 = entry(
    "b202_twap_user",
    """WITH seq AS (
      |  SELECT user_id,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
      |         (lead(epoch_us(ts)) OVER (PARTITION BY user_id
      |                                   ORDER BY ts, event_id)
      |          - epoch_us(ts)) // 1000 AS d_ms
      |  FROM events),
      |agg AS (
      |  SELECT user_id, count(d_ms) AS n_iv,
      |         CAST(sum(d_ms) AS BIGINT) AS tot_ms,
      |         CAST(sum(cents * d_ms) AS BIGINT) AS wsum
      |  FROM seq WHERE d_ms IS NOT NULL
      |  GROUP BY user_id HAVING sum(d_ms) > 0)
      |SELECT user_id, n_iv, tot_ms,
      |       CAST(wsum // tot_ms AS BIGINT) AS twap_cents
      |FROM agg ORDER BY user_id""".stripMargin, bench = true) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val seq = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("d_us",
        lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
      .withColumn("d_ms", expr("d_us div 1000"))
      .filter(col("d_ms").isNotNull)
    seq.groupBy("user_id")
      .agg(count(col("d_ms")).as("n_iv"), sum("d_ms").as("tot_ms"),
        sum(col("cents") * col("d_ms")).as("wsum"))
      .filter(col("tot_ms") > 0)
      .select(col("user_id"), col("n_iv"), col("tot_ms"),
        expr("CAST(wsum div tot_ms AS BIGINT)").as("twap_cents"))
      .orderBy("user_id")
  }

  val entries: Seq[Entry] = Seq(b197, b199, b201, b202)
}
