package graft.wildweb

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's whole dataflow (A1-A14, reference task.ts:67-158)
  * re-expressed as one declarative Spark plan.
  *
  * The per-center HTTP fetch loop (A2, task.ts:76-86) is replaced by a
  * directory of landed JSON files, one envelope per center — the live
  * ingestion layer stays outside the engine (and must keep fetch
  * concurrency = 1 per host to honor the upstream rate limit,
  * CHANGELOG v1.2.0); a `center` column replaces the loop variable.
  *
  * Bug-compatible semantics preserved deliberately (SURVEY §7 "what's hard"):
  *   - A4: ANY center whose envelope has != 1 elements aborts the ENTIRE run
  *     with nothing submitted and no error raised (task.ts:93-97);
  *   - A10: longitude negation is unconditional, so an already-negative
  *     source longitude flips positive (task.ts:138);
  *   - A8: the date is normalized BEFORE the metadata embed, so
  *     `properties.metadata.date` is also normalized (task.ts:118,133);
  *   - A9: empty/whitespace/non-numeric/zero coordinates are all dropped —
  *     Spark's cast-to-null merges the JS falsy/NaN/zero branches into
  *     null-or-zero checks with the same kept-set (task.ts:120-124).
  *
  * Scale posture: everything is one narrow pipeline (scan → filter → project)
  * with zero shuffles; at 100 TB the input directory is partitioned by
  * center/day and the plan parallelizes per file split. Only the A4 guard
  * runs a driver-side count, over one tiny row per center.
  */
object WildWebPipeline {

  /** A15 — machine-readable schema/capabilities introspection (reference
    * task.ts:52-65 `schema(type, flow)`): the declared input (Environment +
    * incident envelope) and output (GeoJSON Feature) contracts as Spark
    * schema JSON, for config UIs / layer wiring. */
  def schema(end: String): String = end match {
    case "input"  => WildWebSchemas.envelope.json
    case "output" => WildWebSchemas.feature.json
    case _        => "{}" // outgoing flow → empty contract (task.ts:63)
  }

  sealed trait Outcome
  /** A4 tripped: whole run aborted, nothing submitted (task.ts:93-97). */
  case object Aborted extends Outcome
  /** features ready to submit; errors = per-center quarantine (A14). The
    * reference delivers partial results and fails AFTER submit when errors
    * exist (task.ts:144-157) — callers must do the same. */
  final case class Completed(features: DataFrame, errors: DataFrame) extends Outcome

  /** A2/A3 — read one JSON envelope file per center and decode it against
    * the declared schema. Corrupt/mismatched bodies yield a null envelope
    * (PERMISSIVE) and are quarantined by [[run]], mirroring the per-center
    * try/catch (A14) rather than failing the job. */
  def readEnvelopes(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .select(
        regexp_extract(col("_metadata.file_path"), "([^/]+)\\.json$", 1).as("center"),
        col("value"))
      .withColumn("envelope", from_json(col("value"), WildWebSchemas.envelope))

  /** A5/A6 — explode envelopes into one row per incident. `explode` on a
    * null `data` array emits zero rows, which is exactly the null-collection
    * coalesce (task.ts:101-104). */
  def incidents(envelopes: DataFrame): DataFrame =
    envelopes
      .filter(col("envelope").isNotNull)
      .select(col("center"), explode(col("envelope").getItem(0).getField("data")).as("fire"))

  /** A8 as a column: minute-truncated UTC "yyyy-MM-dd HH:mm" (task.ts:118);
    * null for unparseable input (see features() for the semantics note). */
  def normalizedDate(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_format(date_trunc("minute", try_to_timestamp(c)), "yyyy-MM-dd HH:mm")

  /** A9 as a column: true iff the string parses to a nonzero finite double
    * (task.ts:120-124 — JS falsy/NaN/zero branches collapse to
    * null-or-zero under Spark's trimming try_cast). */
  def coordValid(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val d = c.try_cast("double")
    d.isNotNull && d =!= 0.0 && !isnan(d)
  }

  /** A7-A11 — the per-incident transform chain, ending in GeoJSON Feature
    * structs (schema [[WildWebSchemas.feature]] + a `center` column). */
  def features(incidents: DataFrame, config: WildWebConfig): DataFrame = {
    val cutoffTs = lit(Timestamp.from(config.cutoff))
    incidents
      // A7 — keep iff date >= now - range (strictly-older dropped, task.ts:113).
      // try_to_timestamp: ANSI mode is on (Spark 4 default) and a plain
      // to_timestamp would fail the job on one malformed date.
      .filter(try_to_timestamp(col("fire.date")) >= cutoffTs)
      // A8 — truncate to minute, UTC, "yyyy-MM-dd HH:mm"; mutate BEFORE the
      // metadata embed so metadata.date is normalized too (task.ts:118)
      .withColumn("fire", col("fire").withField("date", normalizedDate(col("fire.date"))))
      // A9 — geo-validity: both coords must cast to nonzero finite doubles
      // (task.ts:120-124; '' / ' ' / 'abc' → null via try_cast, 0/'0' → zero
      // — all dropped; ANSI cast would throw on 'abc' instead)
      .filter(coordValid(col("fire.longitude")) && coordValid(col("fire.latitude")))
      .withColumn("lon_d", col("fire.longitude").try_cast("double"))
      .withColumn("lat_d", col("fire.latitude").try_cast("double"))
      // A10 (unconditional negation, task.ts:138) + A11 (feature projection)
      .select(
        col("center"),
        concat(lit("wildweb-"), col("fire.uuid")).as("id"),
        lit("Feature").as("type"),
        struct(
          col("fire.name").as("callsign"),
          col("fire.date").as("start"),
          col("fire").as("metadata")).as("properties"),
        struct(
          lit("Point").as("type"),
          array(-col("lon_d"), col("lat_d")).as("coordinates")).as("geometry"))
  }

  /** Full A1-A14 run over a landed directory. */
  def run(spark: SparkSession, dir: String, config: WildWebConfig): Outcome = {
    val envelopes = readEnvelopes(spark, dir).cache()
    try {
      // A14 — quarantine centers whose body failed schema decode (the
      // reference catches per center and continues, task.ts:75,144-146)
      val errors = envelopes.filter(col("envelope").isNull)
        .select(col("center"), lit("envelope decode failed").as("error"))
      // A4 — cardinality guard: != 1 element aborts the whole run silently.
      // Driver-side count over one row per center — never data-scale.
      val badCardinality = envelopes
        .filter(col("envelope").isNotNull && size(col("envelope")) =!= 1)
        .count()
      if (badCardinality > 0) Aborted
      else {
        val feats = features(incidents(envelopes), config)
        Completed(feats.localCheckpoint(true), errors.localCheckpoint(true))
      }
    } finally envelopes.unpersist()
  }

  /** A12/A13 — assemble the FeatureCollection JSON (task.ts:70-73,142,149).
    * Collects to the driver: this is the submit-sink edge (one HTTP POST in
    * the reference), test-scale by definition. The 100 TB path writes
    * feature JSON-lines with `df.write.json` instead and submits per batch
    * via foreachBatch. */
  def featureCollectionJson(features: DataFrame): String = {
    val featJson = features
      .orderBy("id")
      // ignoreNullFields=false: JSON.stringify keeps explicit nulls — the
      // reference emits "ic": null, not an absent field (task.ts:133)
      .select(to_json(
        struct(col("id"), col("type"), col("properties"), col("geometry")),
        java.util.Map.of("ignoreNullFields", "false"))).as[String](
          features.sparkSession.implicits.newStringEncoder)
      .collect()
    featJson.mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")
  }
}
