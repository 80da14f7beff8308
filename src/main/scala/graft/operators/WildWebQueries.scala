package graft.operators

import java.time.Instant

import org.apache.spark.sql.functions._
import graft.Registry._
import graft.wildweb.{WildWebConfig, WildWebPipeline}

/** SURVEY §2B rows backed by the wildweb reference pipeline: B2 (nested JSON
  * envelope scan) and B41 (the full A1-A14 chain as one composed query —
  * the reference-capability parity milestone, SURVEY §7 Phase 1).
  *
  * Input is the checked-in fixture (FIXTURES.md §1.5), not sfDir — the
  * wildweb JSON envelope IS the reference's input surface; `now` is the
  * fixture's pinned literal, never wall clock.
  */
object WildWebQueries {

  private val fixtureDir = "/root/repo/fixtures/wildweb/run_ok"
  private val cfg = WildWebConfig("1 Week", Instant.parse("2026-01-15T12:00:00Z"))

  /** Shared DuckDB fragment: decode the envelope files the same way the
    * engine's from_json does. Dates in the fixture are always '...Z' with
    * seconds, so a timezone-free strptime is exact under any DuckDB TZ. */
  private val duckFires =
    """SELECT unnest(data) AS fire
      |FROM read_json('/root/repo/fixtures/wildweb/run_ok/*.json',
      |  format='array',
      |  columns={retrieved: 'VARCHAR',
      |           data: 'STRUCT(ic VARCHAR, "date" VARCHAR, name VARCHAR,
      |                  "type" VARCHAR, uuid VARCHAR, acres VARCHAR,
      |                  fuels VARCHAR, inc_num VARCHAR, fire_num VARCHAR,
      |                  latitude VARCHAR, location VARCHAR, longitude VARCHAR,
      |                  resources VARCHAR[], webComment VARCHAR,
      |                  fire_status VARCHAR, fiscal_data VARCHAR)[]'})""".stripMargin

  /** B2 — schema'd scan of the nested JSON envelope: one row per center
    * envelope with its incident cardinality (A3+A5 surface). */
  private val b02 = entry(
    "b02_scan_json",
    s"""SELECT regexp_extract(filename, '([^/]+)\\.json$$', 1) AS center,
       |       retrieved, coalesce(len(data), 0) AS n_incidents
       |FROM read_json('/root/repo/fixtures/wildweb/run_ok/*.json',
       |  format='array', filename=true,
       |  columns={retrieved: 'VARCHAR',
       |           data: 'STRUCT(ic VARCHAR, "date" VARCHAR, name VARCHAR,
       |                  "type" VARCHAR, uuid VARCHAR, acres VARCHAR,
       |                  fuels VARCHAR, inc_num VARCHAR, fire_num VARCHAR,
       |                  latitude VARCHAR, location VARCHAR, longitude VARCHAR,
       |                  resources VARCHAR[], webComment VARCHAR,
       |                  fire_status VARCHAR, fiscal_data VARCHAR)[]'})
       |ORDER BY center""".stripMargin) { (s, _) =>
    WildWebPipeline.readEnvelopes(s, fixtureDir)
      .select(col("center"), explode(col("envelope")).as("env"))
      .select(
        col("center"),
        col("env.retrieved").as("retrieved"),
        coalesce(size(col("env.data")), lit(0)).as("n_incidents"))
      .orderBy("center")
  }

  /** B41 — the composed reference pipeline (A2-A11) over the fixture,
    * flattened to scalars for the oracle hash. Coordinates stay exact
    * doubles: string→double cast and negation are bit-exact both sides. */
  private val b41 = entry(
    "b41_wildweb_pipeline",
    s"""WITH fires AS ($duckFires),
       |parsed AS (
       |  SELECT fire.uuid AS uuid, fire.name AS name, fire.acres AS acres,
       |         fire.fire_status AS fire_status, fire.location AS location,
       |         strptime(replace(replace(fire."date", 'T', ' '), 'Z', ''),
       |                  '%Y-%m-%d %H:%M:%S') AS ts,
       |         TRY_CAST(fire.longitude AS DOUBLE) AS lon_d,
       |         TRY_CAST(fire.latitude AS DOUBLE) AS lat_d
       |  FROM fires)
       |SELECT 'wildweb-' || uuid AS id, name AS callsign,
       |       strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS start,
       |       -lon_d AS lon, lat_d AS lat, acres, fire_status, location
       |FROM parsed
       |WHERE ts >= TIMESTAMP '2026-01-08 12:00:00'
       |  AND lon_d IS NOT NULL AND lon_d <> 0
       |  AND lat_d IS NOT NULL AND lat_d <> 0
       |ORDER BY id""".stripMargin) { (s, _) =>
    val feats = WildWebPipeline.features(
      WildWebPipeline.incidents(WildWebPipeline.readEnvelopes(s, fixtureDir)), cfg)
    feats.select(
        col("id"),
        col("properties.callsign").as("callsign"),
        col("properties.start").as("start"),
        element_at(col("geometry.coordinates"), 1).as("lon"),
        element_at(col("geometry.coordinates"), 2).as("lat"),
        col("properties.metadata.acres").as("acres"),
        col("properties.metadata.fire_status").as("fire_status"),
        col("properties.metadata.location").as("location"))
      .orderBy("id")
  }

  val entries: Seq[Entry] = Seq(b02, b41)
}
