package graft.operators

import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** SURVEY §2B scalar function repertoire (B8, B32-B38): string, date, math,
  * conditional, array (+ higher-order), map, JSON functions, and try_cast.
  * Everything is a codegen'd built-in — these queries exist to pin the t2
  * semantics of each function family against the DuckDB oracle (regex kept
  * POSIX-simple, format patterns expressed per-dialect, SURVEY §2B rules).
  */
object Scalars {

  /** B8 — try_cast with A9 semantics: malformed numeric strings → null
    * (never a job failure, unlike ANSI cast). */
  private val b08 = entry(
    "b08_try_cast",
    """SELECT event_id,
      |       TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_num,
      |       TRY_CAST(event_type AS DOUBLE) AS bad_num,
      |       TRY_CAST(substr(CAST(ts AS VARCHAR), 1, 10) AS DATE) AS ts_day
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").try_cast("double").as("k_num"),
        col("event_type").try_cast("double").as("bad_num"),
        substring(col("ts").cast("string"), 1, 10).try_cast("date").as("ts_day"))
      .orderBy("event_id")
  }

  /** B32 — string functions. Regexes kept POSIX-simple so Java and RE2-ish
    * dialects agree (SURVEY §2B). */
  private val b32 = entry(
    "b32_scalar_string",
    """SELECT c_custkey,
      |       concat(upper(c_mktsegment), '-', lower(c_name)) AS tag,
      |       substr(c_name, 1, 8) AS name8,
      |       length(c_name) AS name_len,
      |       trim(rpad(c_mktsegment, 12, ' ')) AS trimmed,
      |       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
      |       replace(c_name, '#', '_') AS name_repl,
      |       regexp_replace(c_name, '[0-9]+', 'N') AS name_nonum,
      |       regexp_extract(c_name, '([0-9]+)', 1) AS name_num,
      |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_xlate,
      |       string_split(c_name, '#')[1] AS name_head
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        concat(upper(col("c_mktsegment")), lit("-"), lower(col("c_name"))).as("tag"),
        substring(col("c_name"), 1, 8).as("name8"),
        length(col("c_name")).as("name_len"),
        trim(rpad(col("c_mktsegment"), 12, " ")).as("trimmed"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded_key"),
        regexp_replace(col("c_name"), "#", "_").as("name_repl"),
        regexp_replace(col("c_name"), "[0-9]+", "N").as("name_nonum"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_num"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_xlate"),
        split(col("c_name"), "#").getItem(0).as("name_head"))
      .orderBy("c_custkey")
  }

  /** B33 — date/time functions. Format patterns differ per dialect
    * (yyyy-MM-dd vs %Y-%m-%d) but outputs are canonical strings; extract
    * fields avoid dow (Spark 1=Sunday vs DuckDB 0=Sunday). */
  private val b33 = entry(
    "b33_scalar_date",
    """SELECT o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS d_str,
      |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |       CAST(extract(year FROM o_orderdate) AS INTEGER) AS yr,
      |       CAST(extract(month FROM o_orderdate) AS INTEGER) AS mo,
      |       CAST(extract(day FROM o_orderdate) AS INTEGER) AS dom,
      |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      |       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS plus90,
      |       CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since
      |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_format(col("o_orderdate") + expr("INTERVAL 90 DAYS"), "yyyy-MM-dd").as("plus90"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"))
      .orderBy("o_orderkey")
  }

  /** B34 — math functions. pmod has no DuckDB twin and is spelled
    * ((x % n) + n) % n there. */
  private val b34 = entry(
    "b34_scalar_math",
    """SELECT p_partkey,
      |       round(p_retailprice, 1) AS price_r1,
      |       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      |       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
      |       abs(p_size - 25) AS size_dev,
      |       round(pow(p_size, 2), 4) AS size_sq,
      |       round(ln(p_retailprice), 4) AS price_ln,
      |       round(log10(p_retailprice), 4) AS price_log10,
      |       round(sqrt(p_retailprice), 4) AS price_sqrt,
      |       CAST(sign(p_size - 25) AS INTEGER) AS size_sign,
      |       ((p_partkey % 7) + 7) % 7 AS key_pmod
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        round(col("p_retailprice"), 1).as("price_r1"),
        floor(col("p_retailprice")).as("price_floor"),
        ceil(col("p_retailprice")).as("price_ceil"),
        abs(col("p_size") - 25).as("size_dev"),
        round(pow(col("p_size"), 2), 4).as("size_sq"),
        round(log(col("p_retailprice")), 4).as("price_ln"),
        round(log10(col("p_retailprice")), 4).as("price_log10"),
        round(sqrt(col("p_retailprice")), 4).as("price_sqrt"),
        signum(col("p_size") - 25).cast("int").as("size_sign"),
        pmod(col("p_partkey"), lit(7)).as("key_pmod"))
      .orderBy("p_partkey")
  }

  /** B35 — conditionals: CASE WHEN, coalesce, nullif, nvl, greatest/least. */
  private val b35 = entry(
    "b35_scalar_cond",
    """SELECT c_custkey,
      |       CASE WHEN c_acctbal < 0 THEN 'debt'
      |            WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_band,
      |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
      |       round(greatest(c_acctbal, 0.0), 4) AS bal_pos,
      |       round(least(c_acctbal, 1000.0), 4) AS bal_capped
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "low").otherwise("high").as("bal_band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_or_other"),
        round(greatest(col("c_acctbal"), lit(0.0)), 4).as("bal_pos"),
        round(least(col("c_acctbal"), lit(1000.0)), 4).as("bal_capped"))
      .orderBy("c_custkey")
  }

  /** B36 — array construction + higher-order functions (transform, filter,
    * aggregate, zip_with) and array utilities; generator coverage (explode)
    * lives in B40. */
  private val b36 = entry(
    "b36_scalar_array",
    """SELECT p_partkey,
      |       array_to_string(list_sort([p_size, p_size * 2, 42]), ',') AS arr_sorted,
      |       len([p_size, p_size * 2, 42]) AS arr_len,
      |       list_contains([p_size, p_size * 2, 42], 42) AS has42,
      |       len(list_distinct([p_size, p_size, 42])) AS n_distinct,
      |       array_to_string(list_transform([p_size, p_size * 2, 42], x -> x * 10), ',') AS times10,
      |       array_to_string(list_filter([p_size, p_size * 2, 42], x -> x > 40), ',') AS over40,
      |       CAST(list_sum(list_transform([p_size, p_size * 2, 42], x -> x + 1)) AS BIGINT) AS sum_plus1,
      |       array_to_string(list_transform(generate_series(1, 3), i -> i * p_size), ',') AS seq_scaled,
      |       array_to_string(flatten([[p_size], [42]]), ',') AS flat,
      |       [p_size, p_size * 2, 42][2] AS second_elem
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    // array/map-typed OUTPUT columns crash the driver's pandas row-sort
    // (r01: unhashable ndarray) — the HOFs still run, but every collection
    // is serialized through array_join before leaving the query.
    //
    // The base array is materialized in its OWN projection, not repeated
    // inline in every output column: six copies of the subtree make
    // subexpression elimination hoist it, and the HOF fallbacks then
    // reference the hoisted isNull across a codegen split-method boundary
    // — janino "isNull_N is not an rvalue", the whole projection falling
    // back to interpreted mode. Two stacked projections keep codegen
    // compiled AND evaluate the array once per row. (CollapseProject
    // leaves this alone: the alias is non-cheap and multiply referenced.)
    val arr = col("arr")
    def joined(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      array_join(transform(c, x => x.cast("string")), ",")
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_size"),
        array(col("p_size"), col("p_size") * 2, lit(42)).as("arr"))
      .select(
        col("p_partkey"),
        joined(sort_array(arr)).as("arr_sorted"),
        size(arr).as("arr_len"),
        array_contains(arr, 42).as("has42"),
        size(array_distinct(array(col("p_size"), col("p_size"), lit(42)))).as("n_distinct"),
        joined(transform(arr, x => x * 10)).as("times10"),
        joined(filter(arr, x => x > 40)).as("over40"),
        aggregate(transform(arr, x => (x + 1).cast("long")), lit(0L), (acc, x) => acc + x)
          .as("sum_plus1"),
        joined(transform(sequence(lit(1), lit(3)), i => i * col("p_size"))).as("seq_scaled"),
        joined(flatten(array(array(col("p_size")), array(lit(42))))).as("flat"),
        // element_at over the arr ATTRIBUTE, not an inline CreateArray:
        // Spark 4.1.2 splits ElementAt(CreateArray(nullable), lit) into a
        // helper method that assigns the parent's undeclared isNull —
        // janino "isNull_N is not an rvalue" — and the whole projection
        // silently drops to interpreted mode.
        element_at(arr, 2).as("second_elem"))
      .orderBy("p_partkey")
  }

  /** B37 — map functions. DuckDB map extraction returns a list, so the
    * oracle spells element access m[k][1]. */
  private val b37 = entry(
    "b37_scalar_map",
    """SELECT c_custkey,
      |       array_to_string(map_keys(map(['seg', 'name'], [c_mktsegment, c_name])), ',') AS ks,
      |       array_to_string(map_values(map(['seg', 'name'], [c_mktsegment, c_name])), ',') AS vs,
      |       map(['seg', 'name'], [c_mktsegment, c_name])['seg'][1] AS seg_val,
      |       CAST(cardinality(map(['seg', 'name'], [c_mktsegment, c_name])) AS BIGINT) AS n_entries
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    // list outputs serialized (driver pandas-sort constraint, see b36)
    val m = map(lit("seg"), col("c_mktsegment"), lit("name"), col("c_name"))
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        array_join(map_keys(m), ",").as("ks"),
        array_join(map_values(m), ",").as("vs"),
        element_at(m, "seg").as("seg_val"),
        size(m).cast("long").as("n_entries"))
      .orderBy("c_custkey")
  }

  /** B38 — JSON functions over events.props ({"k": n} strings). */
  private val b38 = entry(
    "b38_scalar_json",
    """SELECT event_id,
      |       json_extract_string(props, '$.k') AS k_str,
      |       CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
      |       CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing,
      |       json_valid(props) AS is_valid
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        get_json_object(col("props"), "$.missing").as("missing"),
        get_json_object(col("props"), "$").isNotNull.as("is_valid"))
      .orderBy("event_id")
  }

  val entries: Seq[Entry] = Seq(b08, b32, b33, b34, b35, b36, b37, b38)
}
