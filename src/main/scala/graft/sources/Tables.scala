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
  /** events.ts is parquet timestamp[ns], which Spark 4 refuses to read as a
    * timestamp (PARQUET_TYPE_ILLEGAL). Read the raw int64 nanos via the
    * legacy conf and truncate to microseconds — DuckDB's reader yields the
    * same µs values (verified: no sub-µs components in the testdata), so
    * both engines see identical timestamps (FIXTURES.md §2 caution). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views for the spark.sql(...) path
    * (events goes through its nanos-safe loader). Skipped only when THIS
    * session's views already point at THIS dir — each load() re-lists
    * files and re-reads parquet footers, which would otherwise be billed
    * to every bench repetition of the SQL-path query. Keyed by the
    * session's LAST dir (not a (session, dir) set): a set would turn a
    * dirA → dirB → dirA sequence into a silent no-op serving dirB's data.
    * WeakHashMap so stopped sessions are collectable. */
  private val registered = new java.util.WeakHashMap[SparkSession, String]()
  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    if (registered.get(spark) != dir) {
      names.foreach { n =>
        val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
        df.createOrReplaceTempView(n)
      }
      registered.put(spark, dir)
    }
  }
}
