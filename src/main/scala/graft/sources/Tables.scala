package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §2).
  *
  * Scale posture: every loader is a plain columnar parquet scan — Catalyst
  * pushes predicates and prunes columns into the scan (verify via
  * `PushedFilters` / `ReadSchema` in explain output). At 100 TB these paths
  * would be partitioned directories (e.g. by date); `spark.read.parquet` on a
  * partitioned root gets partition pruning for free, so nothing here changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has changed physical type across driver testdata
    * generations, so this loader adapts to whatever the parquet footer
    * declares rather than assuming one encoding:
    *
    *  - parquet timestamp[ns] (pre-2026-08-13 testdata): Spark 4 refuses to
    *    read ns as a timestamp (PARQUET_TYPE_ILLEGAL), so the legacy conf
    *    surfaces it as raw int64 nanos which we truncate to µs. DuckDB's
    *    reader yields the same µs values (no sub-µs components existed).
    *  - parquet timestamp[us], isAdjustedToUTC=false (testdata regenerated
    *    2026-08-13): Spark reads TIMESTAMP_NTZ; under the repo-wide UTC
    *    session timezone, casting to TimestampType preserves the exact µs
    *    instant, which is byte-identical to what DuckDB reads.
    *  - timestamp[us] adjusted-to-UTC: already TimestampType, passthrough.
    *
    * All downstream queries see the same `ts: TimestampType` (µs, UTC)
    * regardless of generation. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Harmless for µs data (conf only affects ns columns); required so a
    // ns-generation file is readable at all instead of failing footer decode.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet-decoded type $other (expected int64-ns, timestamp_ntz, or timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views for the spark.sql(...) path
    * (events goes through its schema-adaptive loader). Skipped only when
    * THIS session's views already point at THIS dir — each load() re-lists
    * files and re-reads parquet footers, which would otherwise be billed
    * to every bench repetition of the SQL-path query. Keyed by the
    * session's LAST dir (not a (session, dir) set): a set would turn a
    * dirA → dirB → dirA sequence into a silent no-op serving dirB's data.
    * WeakHashMap so stopped sessions are collectable.
    *
    * Resilience (round-9 postmortem): one unreadable table must not take
    * down the whole SQL-text path — in r9 a corrupt events load killed
    * b06_sql/b08/b70 which never touch events. Each registration is
    * independent; a failed table's view is dropped (never serve a stale
    * prior-dir view) and the failure surfaces only when a query actually
    * references that name (TABLE_OR_VIEW_NOT_FOUND). The dir is still
    * cached so bench repetitions don't pay a retry storm; a caller that
    * needs the failed table gets a clear error either way.
    *
    * Transient-failure recovery (ADVICE r10): a failed table is remembered
    * and retried on the NEXT registerAll call for the same dir, so a
    * transient IO error (e.g. testdata being regenerated mid-session)
    * doesn't permanently drop the view for the session's lifetime.
    * Successfully loaded tables are never reloaded, preserving the
    * no-retry-storm property — the retry cost is bounded by the (normally
    * empty) failed set, not the table count. */
  private val registered =
    new java.util.WeakHashMap[SparkSession, (String, Set[String])]()
  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    val prev = Option(registered.get(spark))
    val toLoad = prev match {
      case Some((`dir`, failed)) => failed // same dir: retry only failures
      case _                     => names.toSet
    }
    if (toLoad.nonEmpty) {
      val stillFailed = toLoad.filter { n =>
        try {
          val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
          df.createOrReplaceTempView(n)
          false
        } catch {
          case scala.util.control.NonFatal(e) =>
            spark.catalog.dropTempView(n)
            System.err.println(
              s"[graft] registerAll: table '$n' failed to load from $dir " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}); view dropped, " +
              "others unaffected; will retry on next registerAll")
            true
        }
      }
      registered.put(spark, (dir, stillFailed))
    }
  }
}
