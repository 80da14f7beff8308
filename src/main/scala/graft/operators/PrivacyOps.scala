package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.llm.Winnowing
import graft.sources.Tables

/** B262 — K-ANONYMITY GENERALIZATION LADDER (Sweeney '02 / Samarati '01:
  * the release-readiness check any table with quasi-identifiers passes
  * before publication): walk a QI generalization hierarchy from finest
  * to coarsest and report, per level, the equivalence-class statistics —
  * class count, minimum class size (the k the level actually achieves),
  * and the violating classes/rows under the k ≥ [[K]] policy — then mark
  * the CHOSEN level: the first whose violation mass is zero, i.e. the
  * finest safe release. The ladder here is the classic single-path
  * lattice over customer QIs:
  *
  *   L0 (nation, segment, acctbal band-500) → L1 (nation, segment)
  *   → L2 (segment) → L3 (*)
  *
  * The walk is observably non-trivial at every gate SF: L0 always
  * violates (bands shatter classes below k), and the chosen level moves
  * with table size (level 2 at sf0.001 where 150 customers leave
  * (nation, segment) classes of 1; level 1 at sf0.01/0.1) — the
  * suppression-vs-generalization tradeoff a privacy officer actually
  * reads off this table. l-diversity over a sensitive column is the
  * natural companion (same per-class aggregate with a countDistinct);
  * the ladder is the operator contract.
  *
  * Integer-exact: class sizes and violation masses are counts; the band
  * is `CAST(floor(acctbal) AS BIGINT) div 500` with TRUNC division
  * committed on both sides (negative balances band toward zero in both
  * engines — any deterministic bucketing satisfies the QI contract).
  *
  * Scale posture (100 TB): each level is one map-combinable aggregate
  * collapsing to class counts, then to a one-row summary — classes are
  * COUNTED, never materialized; the ladder output is O(levels). A full
  * Samarati lattice (all QI subsets) is 2^|QI| such aggregates over one
  * cached scan; the chosen-level rule is the same driver-free min. */
object PrivacyOps {

  /** Release policy: every equivalence class must hold ≥ K rows. */
  val K = 5L

  private case class Level(level: Int, qi: String, cols: Seq[String])

  private val Ladder = Seq(
    Level(0, "nation,segment,band500", Seq("c_nationkey", "c_mktsegment", "band")),
    Level(1, "nation,segment", Seq("c_nationkey", "c_mktsegment")),
    Level(2, "segment", Seq("c_mktsegment")),
    Level(3, "*", Seq.empty))

  private def levelStats(base: DataFrame, lv: Level): DataFrame = {
    val classes =
      if (lv.cols.isEmpty) base.agg(count(lit(1)).as("n"))
      else base.groupBy(lv.cols.map(col): _*).agg(count(lit(1)).as("n"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      min("n").as("min_k"),
      sum(when(col("n") < K, 1L).otherwise(0L)).as("viol_classes"),
      sum(when(col("n") < K, col("n")).otherwise(0L)).as("viol_rows"))
      .select(lit(lv.level.toLong).as("level"), lit(lv.qi).as("qi"),
        col("n_classes"), col("min_k"), col("viol_classes"),
        col("viol_rows"))
  }

  private val b262 = entry(
    "b262_kanon_generalization", {
      val per = Ladder.map { lv =>
        val grp = if (lv.cols.isEmpty) "" else " GROUP BY " +
          lv.cols.mkString(", ")
        s"""  SELECT ${lv.level} AS level, '${lv.qi}' AS qi,
           |         CAST(count(*) AS BIGINT) AS n_classes,
           |         CAST(min(n) AS BIGINT) AS min_k,
           |         CAST(sum(CASE WHEN n < $K THEN 1 ELSE 0 END) AS BIGINT)
           |           AS viol_classes,
           |         CAST(sum(CASE WHEN n < $K THEN n ELSE 0 END) AS BIGINT)
           |           AS viol_rows
           |  FROM (SELECT count(*) AS n FROM c$grp)""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH c AS (
         |  SELECT c_nationkey, c_mktsegment,
         |         CAST(floor(c_acctbal) AS BIGINT) // 500 AS band
         |  FROM customer),
         |lv AS (
         |$per),
         |ch AS (SELECT min(level) AS chosen FROM lv WHERE viol_rows = 0)
         |SELECT CAST(level AS BIGINT) AS level, qi, n_classes, min_k,
         |       viol_classes, viol_rows,
         |       CAST(level = (SELECT chosen FROM ch) AS BIGINT) AS chosen
         |FROM lv ORDER BY level""".stripMargin
    }) { (s, d) =>
    val base = Tables.customer(s, d).select(
      col("c_nationkey"), col("c_mktsegment"),
      expr("CAST(floor(c_acctbal) AS BIGINT) div 500").as("band"))
    val lv = Ladder.map(levelStats(base, _)).reduce(_.unionByName(_))
    val chosen = lv.filter(col("viol_rows") === 0)
      .agg(min("level").as("chosen_lv"))
    lv.crossJoin(broadcast(chosen))
      .select(col("level"), col("qi"), col("n_classes"), col("min_k"),
        col("viol_classes"), col("viol_rows"),
        (col("level") === col("chosen_lv")).cast("long").as("chosen"))
      .orderBy("level")
  }

  /** l-diversity policy: every class needs ≥ L distinct sensitive values. */
  val L = 2L

  /** B266 — L-DIVERSITY AUDIT (Machanavajjhala et al. '06 — B262's
    * standard companion: k-anonymity bounds RE-IDENTIFICATION, l-diversity
    * bounds ATTRIBUTE DISCLOSURE — a k-safe class whose members all share
    * one sensitive value still leaks it): per (nation, acctbal band-500)
    * equivalence class, the class size k, the number of distinct
    * sensitive values l (sensitive = market segment — the column a
    * released customer table would protect), and both policy flags
    * (k < [[K]], l < [[L]]). Homogeneous classes exist at every gate SF
    * (122/118/3 l-violations) without being universal — both directions
    * observable, the make-it-bite rule.
    *
    * Scale posture: ONE aggregate — count + count(DISTINCT sensitive)
    * per class (the countDistinct expands the scan by the one sensitive
    * column, the b185 NDV shape); output is |classes| rows, catalog-
    * sized relative to the table. The production 100 TB path swaps exact
    * NDV for the b78 HLL sketch per class at l-thresholds ≫ 2. */
  private val b266 = entry(
    "b266_ldiversity_audit",
    s"""WITH cls AS (
       |  SELECT c_nationkey,
       |         CAST(floor(c_acctbal) AS BIGINT) // 500 AS band,
       |         CAST(count(*) AS BIGINT) AS k,
       |         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
       |  FROM customer GROUP BY 1, 2)
       |SELECT c_nationkey, band, k, l,
       |       CAST(k < $K AS BIGINT) AS k_viol,
       |       CAST(l < $L AS BIGINT) AS l_viol
       |FROM cls ORDER BY c_nationkey, band""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(col("c_nationkey"),
        expr("CAST(floor(c_acctbal) AS BIGINT) div 500").as("band"),
        col("c_mktsegment"))
      .groupBy("c_nationkey", "band")
      .agg(count(lit(1)).as("k"),
        countDistinct(col("c_mktsegment")).as("l"))
      .select(col("c_nationkey"), col("band"), col("k"), col("l"),
        (col("k") < K).cast("long").as("k_viol"),
        (col("l") < L).cast("long").as("l_viol"))
      .orderBy("c_nationkey", "band")
  }

  /** t-closeness policy: class-vs-global sensitive-distribution distance
    * (total variation, bp) must stay ≤ this. Sized measured-binding:
    * violations 132/363/3 of 133/488/528 classes across the gate SFs —
    * both directions observable everywhere. */
  val TClosenessBp = 4000L

  /** B267 — T-CLOSENESS AUDIT (Li et al. ICDE'07, completing the
    * release-audit triad with B262 k-anonymity and B266 l-diversity:
    * l-diversity counts distinct sensitive values, t-closeness bounds how
    * far a class's sensitive DISTRIBUTION may drift from the global one —
    * a class can be l-diverse yet still skewed enough to shift an
    * attacker's prior): per (nation, band-500) class, the total-variation
    * distance between the class's market-segment distribution and the
    * corpus-wide one, in basis points, EXACTLY in integers:
    * tvd_bp = Σ_s |cnt_s·G − g_s·k| · 10⁴ div (2·k·G) — the common-
    * denominator spelling avoids any per-class division before the sum.
    * Overflow bound: the numerator is ≤ 2·k·G·10⁴, exact in BIGINT only
    * while k·G < ~4.6e14 (Σ ≤ 2kG ≤ 4.5e8 at sf0.1 — five orders of
    * headroom at the gate SFs, and any k-anonymous release grain keeps
    * k ≪ G). A full-population 100 TB run (G ~ 1.5e10 with classes of
    * k ≳ 3e4) crosses it: that regime needs the DECIMAL(38,0) spelling
    * of the same arithmetic (both engines support it) or per-class
    * pre-division at 10⁸ fixed point — the exact-BIGINT claim here is
    * scoped to k·G < 4.6e14, not unconditional.
    * Missing segments contribute their full global mass (the dense
    * class × segment grid — the coalesce(0) rows are exactly the
    * homogeneity l-diversity misses).
    *
    * Scale posture: two class-keyed aggregates (class sizes, class ×
    * segment counts) + a broadcast of the |segments| global distribution
    * and the one-row total; the grid is |classes|·|segments| — catalog-
    * sized; everything map-combines. */
  private val b267 = entry(
    "b267_tcloseness_audit",
    s"""WITH c AS (
       |  SELECT c_nationkey,
       |         CAST(floor(c_acctbal) AS BIGINT) // 500 AS band,
       |         c_mktsegment
       |  FROM customer),
       |g AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS gs
       |      FROM c GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS gt FROM c),
       |cls AS (SELECT c_nationkey, band, CAST(count(*) AS BIGINT) AS k
       |        FROM c GROUP BY 1, 2),
       |cs AS (SELECT c_nationkey, band, c_mktsegment,
       |              CAST(count(*) AS BIGINT) AS cnt
       |       FROM c GROUP BY 1, 2, 3),
       |grid AS (
       |  SELECT cls.c_nationkey, cls.band, cls.k, g.c_mktsegment, g.gs,
       |         coalesce(cs.cnt, 0) AS cnt
       |  FROM cls CROSS JOIN g
       |  LEFT JOIN cs USING (c_nationkey, band, c_mktsegment)),
       |tv AS (
       |  SELECT c_nationkey, band, k,
       |         CAST(sum(abs(cnt * (SELECT gt FROM tot) - gs * k)) * 10000
       |              // (2 * k * (SELECT gt FROM tot)) AS BIGINT) AS tvd_bp
       |  FROM grid GROUP BY 1, 2, 3)
       |SELECT c_nationkey, band, k, tvd_bp,
       |       CAST(tvd_bp > $TClosenessBp AS BIGINT) AS t_viol
       |FROM tv ORDER BY c_nationkey, band""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).select(col("c_nationkey"),
      expr("CAST(floor(c_acctbal) AS BIGINT) div 500").as("band"),
      col("c_mktsegment"))
    val g = c.groupBy("c_mktsegment").agg(count(lit(1)).as("gs"))
    val tot = c.agg(count(lit(1)).as("gt"))
    val cls = c.groupBy("c_nationkey", "band").agg(count(lit(1)).as("k"))
    val cs = c.groupBy("c_nationkey", "band", "c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
    cls.crossJoin(broadcast(g))
      .join(cs, Seq("c_nationkey", "band", "c_mktsegment"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(tot))
      .groupBy("c_nationkey", "band", "k")
      .agg(max("gt").as("gt"),
        sum(expr("abs(cnt * gt - gs * k)")).as("sdev"))
      .select(col("c_nationkey"), col("band"), col("k"),
        expr("CAST(sdev * 10000 div (2 * k * gt) AS BIGINT)").as("tvd_bp"))
      .withColumn("t_viol",
        (col("tvd_bp") > TClosenessBp).cast("long"))
      .orderBy("c_nationkey", "band")
  }

  /** Release budget for B268 in basis points: ε = 1.0000. */
  val EpsBp = 10000L

  /** Uniform range for the seeded draw: 31 bits (the b167 convention). */
  val UniformM: Long = 1L << 31

  private[graft] val Knuth = 2654435761L

  /** Two-sided-geometric inverse CDF as a CASE ladder over an integer
    * uniform u ∈ [0, 2³¹) — the ONE text both engines evaluate. The
    * mechanism (Ghosh, Roughgarden & Sundararajan, STOC'09) is the
    * discrete analogue of Laplace and is ε-DP for sensitivity-1 counting
    * queries with α = exp(−ε): P(K = k) = (1−α)/(1+α)·α^|k|. CDF
    * boundaries F(k) = α^(−k)/(1+α) for k < 0 and 1 − α^(k+1)/(1+α) for
    * k ≥ 0 are frozen to BIGINT thresholds t_k = ⌊F(k)·2³¹⌋ at ladder-
    * GENERATION time (driver-side doubles, shared literals — the same
    * freeze as the BPE merge table), so both engines walk identical
    * integer comparisons: noise = min{k : u < t_k}. The ladder is finite
    * because the uniform is: |k| ≤ ⌈ln(2³¹)/ε⌉+1 covers every
    * representable u (beyond it the thresholds saturate at 0 / 2³¹). */
  private[graft] def geomNoiseLadder(uCol: String, epsBp: Long): String = {
    require(epsBp > 0, "epsilon must be positive")
    val alpha = math.exp(-epsBp.toDouble / 10000.0)
    def cdf(k: Int): Double =
      if (k < 0) math.pow(alpha, -k) / (1 + alpha)
      else 1.0 - math.pow(alpha, k + 1) / (1 + alpha)
    val kCap = math.ceil(math.log(UniformM.toDouble) *
      10000.0 / epsBp).toInt + 1
    val whens = (-kCap until kCap).flatMap { k =>
      val t = math.floor(cdf(k) * UniformM).toLong
      if (t <= 0L) None // dead branch: u >= 0 always
      else Some(s"WHEN $uCol < $t THEN $k")
    }
    s"(CASE ${whens.mkString(" ")} ELSE $kCap END)"
  }

  /** The seeded uniform: Knuth-scrambled polynomial fold of the salted
    * class key (the b167 ratio-statistic rule — the raw fold's magnitude
    * clusters on near-identical keys; one odd multiplicative scramble
    * mod 2³¹ is a bijection, so u stays uniform and engine-identical). */
  private def uSpark(keyExpr: String): String =
    s"(((${graft.llm.Winnowing.polyFoldSpark(keyExpr)}) % $UniformM)" +
      s" * $Knuth) % $UniformM"
  private def uDuck(keyExpr: String): String =
    s"(((${graft.llm.Winnowing.polyFoldDuck(keyExpr)}) % $UniformM)" +
      s" * $Knuth) % $UniformM"

  /** B268 — DETERMINISTIC ε-DP RELEASED AGGREGATE (Dwork et al. TCC'06
    * accounting; Ghosh et al. STOC'09 mechanism — completing the privacy
    * surface: B262/B266/B267 AUDIT disclosure risk, this RELEASES a
    * protected aggregate): the class counts of B262's chosen
    * generalization level, each perturbed by seeded two-sided-geometric
    * noise and clamped at zero (post-processing preserves DP), with the
    * per-release budget column. True counts never appear in the output.
    *
    * Accounting: the classes partition the population, so parallel
    * composition applies — the whole release costs ε = [[EpsBp]] bp
    * (NOT |classes|·ε), the arithmetic PrivacyOpsSpec pins. The noise is
    * a pure function of the class key (scrambled fold → frozen inverse
    * CDF), so the release is rerun-, engine- and partitioning-stable —
    * the b56/b167 determinism rules; a production system would swap the
    * key-seeded draw for a secret-seeded PRF (same plan shape), since a
    * public seed reveals the noise — the determinism here is what makes
    * the mechanism t2-able, and the DISTRIBUTION arguments are identical.
    *
    * Scale posture: B262's ladder aggregates (map-combinable, classes
    * counted not materialized) + one O(levels) driver-free chosen-level
    * broadcast; the noise is a map-side scalar over |classes| rows —
    * catalog-sized. The CASE ladder is ~45 integer comparisons per row,
    * whole-stage-codegen'd. */
  private val b268 = entry(
    "b268_dp_release", {
      val levels = Seq(
        0 -> "concat(CAST(c_nationkey AS VARCHAR), '|', c_mktsegment, '|', CAST(band AS VARCHAR))",
        1 -> "concat(CAST(c_nationkey AS VARCHAR), '|', c_mktsegment)",
        2 -> "c_mktsegment",
        3 -> "'*'")
      val per = levels.map { case (lv, key) =>
        s"""  SELECT $lv AS level, $key AS class_key,
           |         CAST(count(*) AS BIGINT) AS n
           |  FROM c GROUP BY 2""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH c AS (
         |  SELECT c_nationkey, c_mktsegment,
         |         CAST(floor(c_acctbal) AS BIGINT) // 500 AS band
         |  FROM customer),
         |cls AS (
         |$per),
         |lv AS (SELECT level,
         |              sum(CASE WHEN n < $K THEN n ELSE 0 END) AS viol_rows
         |       FROM cls GROUP BY 1),
         |ch AS (SELECT min(level) AS chosen FROM lv WHERE viol_rows = 0),
         |rel AS (SELECT class_key, n FROM cls
         |        WHERE level = (SELECT chosen FROM ch)),
         |seeded AS (
         |  SELECT class_key, n,
         |         ${uDuck("('dp:' || class_key)")} AS u
         |  FROM rel)
         |SELECT class_key,
         |       CAST(greatest(0, n + ${geomNoiseLadder("u", EpsBp)})
         |            AS BIGINT) AS released_n,
         |       CAST($EpsBp AS BIGINT) AS eps_bp
         |FROM seeded ORDER BY class_key""".stripMargin
    }) { (s, d) =>
    val base = Tables.customer(s, d).select(
      col("c_nationkey"), col("c_mktsegment"),
      expr("CAST(floor(c_acctbal) AS BIGINT) div 500").as("band"))
    val keyExprs = Seq(
      0 -> "concat(CAST(c_nationkey AS STRING), '|', c_mktsegment, '|', CAST(band AS STRING))",
      1 -> "concat(CAST(c_nationkey AS STRING), '|', c_mktsegment)",
      2 -> "c_mktsegment",
      3 -> "'*'")
    val cls = keyExprs.map { case (lv, key) =>
      base.groupBy(expr(key).as("class_key"))
        .agg(count(lit(1)).as("n"))
        .select(lit(lv.toLong).as("level"), col("class_key"), col("n"))
    }.reduce(_.unionByName(_))
    val lv = cls.groupBy("level")
      .agg(sum(when(col("n") < K, col("n")).otherwise(0L)).as("viol_rows"))
    val chosen = lv.filter(col("viol_rows") === 0)
      .agg(min("level").as("chosen"))
    cls.join(broadcast(chosen), col("level") === col("chosen"))
      .select(col("class_key"), col("n"),
        expr(uSpark("concat('dp:', class_key)")).as("u"))
      .select(col("class_key"),
        expr(s"CAST(greatest(0, n + ${geomNoiseLadder("u", EpsBp)})" +
          " AS BIGINT)").as("released_n"),
        lit(EpsBp).as("eps_bp"))
      .orderBy("class_key")
  }

  /** B273 — ε-DP HISTOGRAM WITH CONSISTENCY POST-PROCESSING (Hay et al.
    * VLDB'10 "boosting the accuracy of differentially private histograms
    * through consistency" — B268's companion on the TIME-SERIES release
    * surface): per-month order counts, each perturbed by the same seeded
    * geometric mechanism, then post-processed into a CONSISTENT release —
    * noisy counts prefix-summed, the cumulative series forced monotone
    * nondecreasing and nonnegative (running max + zero clamp), and the
    * released per-bin counts re-derived as consecutive differences. Raw
    * geometric noise yields negative bins and a non-monotone CDF; the
    * post-processing is a pure function of the NOISY release, so DP is
    * preserved (the post-processing invariance the spec pins), and the
    * released histogram is one a downstream consumer can actually load.
    * Bins partition the orders, so parallel composition applies: the
    * whole release costs ε = [[EpsBp]] bp.
    *
    * Bins are DAYS — the grain where the repair observably bites at the
    * gate SFs (measured with the deterministic seed: 97 negative noisy
    * bins / 157 cumulative repairs at sf0.001, 6/6 at sf0.01; at sf0.1
    * daily counts (~600) dwarf the ε=1 noise and the repair is
    * correctly a no-op — the regime where raw release ≈ consistent
    * release, which the hash pins just the same). Bin domain note: bins
    * are the OBSERVED days (dense on this fixture); a production
    * release materializes the fixed calendar domain so absent bins
    * release noise too rather than leaking emptiness — same plan with a
    * calendar dimension union.
    *
    * Scale posture: one map-combinable day aggregate; noise is the
    * same frozen CASE ladder map-side; the prefix/monotone windows run
    * over the |days| rollup (bounded cardinality — the b125
    * exception), never the fact table. */
  private val b273 = entry(
    "b273_dp_histogram",
    s"""WITH bins AS (
       |  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate)
       |              AS BIGINT) AS day_id,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM orders GROUP BY 1),
       |seeded AS (
       |  SELECT day_id,
       |         n + ${geomNoiseLadder(
      s"(((${Winnowing.polyFoldDuck("('dph:' || CAST(day_id AS VARCHAR))")})" +
        s" % $UniformM) * $Knuth) % $UniformM", EpsBp)} AS noisy
       |  FROM bins),
       |cum0 AS (
       |  SELECT day_id,
       |         sum(noisy) OVER (ORDER BY day_id
       |                          ROWS UNBOUNDED PRECEDING) AS prefix
       |  FROM seeded),
       |cum AS (
       |  SELECT day_id,
       |         greatest(0, max(prefix) OVER (ORDER BY day_id
       |                                       ROWS UNBOUNDED PRECEDING))
       |           AS released_cum
       |  FROM cum0)
       |SELECT day_id,
       |       CAST(released_cum
       |            - coalesce(lag(released_cum) OVER (ORDER BY day_id), 0)
       |            AS BIGINT) AS released_n,
       |       CAST(released_cum AS BIGINT) AS released_cum,
       |       CAST($EpsBp AS BIGINT) AS eps_bp
       |FROM cum ORDER BY day_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val bins = Tables.orders(s, d)
      .groupBy(expr("CAST(datediff(o_orderdate, DATE '1992-01-01')" +
        " AS BIGINT)").as("day_id"))
      .agg(count(lit(1)).as("n"))
    val uExpr =
      s"(((${Winnowing.polyFoldSpark("concat('dph:', CAST(day_id AS STRING))")})" +
        s" % $UniformM) * $Knuth) % $UniformM"
    // the windows run over the |months| rollup (bounded — the b125
    // exception), so the single-partition ordering is O(bins), not corpus
    val w = Window.orderBy(col("day_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .select(col("day_id"),
        (col("n") + expr(geomNoiseLadder(s"($uExpr)", EpsBp))).as("noisy"))
      .withColumn("prefix", sum(col("noisy")).over(w))
      .withColumn("released_cum", greatest(lit(0L), max(col("prefix")).over(w)))
      .withColumn("released_n",
        (col("released_cum") -
          coalesce(lag(col("released_cum"), 1)
            .over(Window.orderBy(col("day_id"))), lit(0L))).cast("long"))
      .select(col("day_id"), col("released_n"),
        col("released_cum").cast("long").as("released_cum"),
        lit(EpsBp).as("eps_bp"))
      .orderBy("day_id")
  }

  /** B280 ε sweep in basis points: the budgets a release board actually
    * debates (0.5, 1, 2). Each budget is one independent release. */
  val MedianEpsBp = Seq(5000L, 10000L, 20000L)

  /** B280 fixed public candidate grid: acctbal's TPC-H domain is
    * [-999.99, 9999.99], so the b262 band (floor(bal) div 500, trunc
    * committed both sides) ranges over [-2, 19] — 22 literal candidates
    * independent of the data (the b273 bin-domain note made structural:
    * an observed-domain grid would leak which bands are nonempty). */
  val MedianBandLo = -2L
  val MedianBandHi = 19L

  /** B280 — ε-DP MEDIAN VIA REPORT-NOISY-MAX (McSherry & Talwar FOCS'07
    * exponential mechanism; the noisy-max instantiation of Dwork & Roth
    * Claim 3.9 — completing the release surface's third query class:
    * B268 releases COUNTS, B273 a HISTOGRAM, this SELECTS a statistic
    * from a candidate set, where output perturbation is useless because
    * the median itself has unbounded sensitivity): for each candidate
    * band c in the fixed public grid, the rank utility
    *
    *   u(c) = −|2·cum(c) − N|,  cum(c) = #{customers with band ≤ c}
    *
    * (sensitivity 1: one added/removed record moves 2·cum − N by exactly
    * ±1), plus seeded two-sided-geometric noise drawn at ε/2 per the
    * noisy-max accounting; the released median is the argmax by
    * (noisy score, band) — ONE value per budget, costing exactly ε.
    * Swept over [[MedianEpsBp]]; each budget's draw is independently
    * seeded ('dpm:ε:band'), so the sweep is 3 separate releases, not a
    * composition. The same b268 determinism caveat applies: a public
    * key-seeded draw is what makes the mechanism t2-able; production
    * swaps in a secret-seeded PRF with the same plan shape.
    *
    * Scale posture: ONE map-combinable band-count aggregate over the
    * fact table; the candidate grid is 22 literals, so cum/utility/
    * noise/argmax all run on |grid|- and |grid|×|ε|-row relations (the
    * b125 exception); the cum join is bounded-×-bounded (22 × ≤22 — the
    * sanctioned bounded-dimension BNLJ); true counts and the true
    * median never appear in the output. */
  private val b280 = entry(
    "b280_dp_median", {
      val scoreCase = "CASE " + MedianEpsBp.map(e =>
        s"WHEN eps_bp = $e THEN u + ${geomNoiseLadder("uu", e / 2)}")
        .mkString(" ") + " ELSE NULL END"
      s"""WITH c AS (
         |  SELECT CAST(floor(c_acctbal) AS BIGINT) // 500 AS band
         |  FROM customer),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
         |bc AS (SELECT band, CAST(count(*) AS BIGINT) AS cnt
         |       FROM c GROUP BY band),
         |cand AS (SELECT CAST(g AS BIGINT) AS cand
         |         FROM UNNEST(generate_series($MedianBandLo, $MedianBandHi))
         |           t(g)),
         |cum AS (SELECT cand,
         |               CAST(coalesce(sum(CASE WHEN band <= cand THEN cnt
         |                                      END), 0) AS BIGINT) AS cum
         |        FROM cand LEFT JOIN bc ON bc.band <= cand
         |        GROUP BY cand),
         |u AS (SELECT cand, -abs(2 * cum - n) AS u FROM cum CROSS JOIN n),
         |sweep AS (
         |  SELECT CAST(e.eps_bp AS BIGINT) AS eps_bp, cand, u,
         |         ${uDuck("('dpm:' || CAST(e.eps_bp AS VARCHAR) || ':' || CAST(cand AS VARCHAR))")}
         |           AS uu
         |  FROM u CROSS JOIN (VALUES ${MedianEpsBp.map(e => s"($e)").mkString(", ")}) e(eps_bp)),
         |scored AS (SELECT eps_bp, cand, $scoreCase AS score FROM sweep),
         |r AS (SELECT eps_bp, cand,
         |             row_number() OVER (PARTITION BY eps_bp
         |                                ORDER BY score DESC, cand) AS rn
         |      FROM scored)
         |SELECT eps_bp, cand AS released_band
         |FROM r WHERE rn = 1 ORDER BY eps_bp""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val c = Tables.customer(s, d)
      .select(expr("CAST(floor(c_acctbal) AS BIGINT) div 500").as("band"))
    val n = c.agg(count(lit(1)).as("n"))
    val bc = c.groupBy("band").agg(count(lit(1)).as("cnt"))
    val cands = s.range(MedianBandLo, MedianBandHi + 1)
      .select(col("id").as("cand"))
    val cum = cands.join(broadcast(bc), col("band") <= col("cand"), "left")
      .groupBy("cand")
      .agg(coalesce(sum("cnt"), lit(0L)).as("cum"))
    val scoreCase = "CASE " + MedianEpsBp.map(e =>
      s"WHEN eps_bp = $e THEN u + ${geomNoiseLadder("uu", e / 2)}")
      .mkString(" ") + " ELSE NULL END"
    val w = Window.partitionBy(col("eps_bp"))
      .orderBy(col("score").desc, col("cand"))
    cum
      .crossJoin(broadcast(n))
      .select(col("cand"), (-abs(lit(2L) * col("cum") - col("n"))).as("u"))
      .crossJoin(broadcast(MedianEpsBp.toDF("eps_bp")))
      .withColumn("uu", expr(uSpark(
        "concat('dpm:', CAST(eps_bp AS STRING), ':', CAST(cand AS STRING))")))
      .withColumn("score", expr(scoreCase))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("eps_bp"), col("cand").as("released_band"))
      .orderBy("eps_bp")
  }

  val entries: Seq[Entry] = Seq(b262, b266, b267, b268, b273, b280)
}
