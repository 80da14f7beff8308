package graft.wildweb

import org.apache.spark.sql.types._

/** Declared schemas of the WildWeb/WildCAD source surface, mirrored from the
  * reference's TypeBox declarations (reference task.ts:7-24 envelope at
  * task.ts:88-91, config at task.ts:26-45). Nullability mirrors the
  * `Type.Union([X, Type.Null()])` pattern field by field.
  */
object WildWebSchemas {

  /** WildCadIncident (task.ts:7-24). All numerics are strings at the source
    * ("stringly-typed doubles"); parsing happens in-pipeline with cast-null
    * semantics. `resources` is `array<any>` upstream — represented as
    * array<string> of raw JSON elements, the one intentional representation
    * change (Spark has no AnyType); see FIXTURES.md §1.2.
    */
  val incident: StructType = StructType(Seq(
    StructField("ic", StringType, nullable = true),
    StructField("date", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("uuid", StringType, nullable = false),
    StructField("acres", StringType, nullable = true),
    StructField("fuels", StringType, nullable = true),
    StructField("inc_num", StringType, nullable = true),
    StructField("fire_num", StringType, nullable = true),
    StructField("latitude", StringType, nullable = true),
    StructField("location", StringType, nullable = true),
    StructField("longitude", StringType, nullable = true),
    StructField("resources", ArrayType(StringType), nullable = true),
    StructField("webComment", StringType, nullable = true),
    StructField("fire_status", StringType, nullable = false),
    StructField("fiscal_data", StringType, nullable = false),
  ))

  /** HTTP response envelope (task.ts:88-91): exactly-one-element array of
    * {retrieved, data}; `data: null` is a legal zero-incident response
    * (task.ts:101-104, CHANGELOG v3.1.0). */
  val envelope: ArrayType = ArrayType(StructType(Seq(
    StructField("retrieved", StringType, nullable = false),
    StructField("data", ArrayType(incident), nullable = true),
  )))

  /** GeoJSON Feature output shape (task.ts:126-140); see FIXTURES.md §1.4. */
  val feature: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("properties", StructType(Seq(
      StructField("callsign", StringType, nullable = false),
      StructField("start", StringType, nullable = false),
      StructField("metadata", incident, nullable = false),
    )), nullable = false),
    StructField("geometry", StructType(Seq(
      StructField("type", StringType, nullable = false),
      StructField("coordinates", ArrayType(DoubleType), nullable = false),
    )), nullable = false),
  ))
}

/** Typed incident record for the Dataset path (same 16 fields as
  * [[WildWebSchemas.incident]]; `resources` as raw JSON strings). Use
  * `incidents(df).select("fire.*").as[WildCadIncident]` when compile-time
  * field checks matter; the DataFrame path when schema stays dynamic. */
final case class WildCadIncident(
    ic: Option[String], date: String, name: String, `type`: String,
    uuid: String, acres: Option[String], fuels: Option[String],
    inc_num: Option[String], fire_num: Option[String],
    latitude: Option[String], location: Option[String],
    longitude: Option[String], resources: Option[Seq[String]],
    webComment: Option[String], fire_status: String, fiscal_data: String)

/** Run config mirroring the reference `Environment` (task.ts:26-45).
  * `now` is an explicit parameter — never wall clock — so every run is
  * reproducible and t2-checkable (SURVEY §2B determinism rules).
  * `debug` is carried as a no-op to match the reference's dead flag
  * (task.ts:41-44, A17).
  */
final case class WildWebConfig(
    incidentRange: String,
    now: java.time.Instant,
    debug: Boolean = false,
) {
  /** "24 Hours"|"48 Hours"|"72 Hours"|"1 Week" → hours (task.ts:109-112). */
  def rangeHours: Long = incidentRange match {
    case "24 Hours" => 24L
    case "48 Hours" => 48L
    case "72 Hours" => 72L
    case "1 Week"   => 168L
    case other => throw new IllegalArgumentException(
      s"invalid IncidentRange '$other' (task.ts:26-34 enum)")
  }

  /** Keep incidents with date >= cutoff (strictly-older dropped, task.ts:113). */
  def cutoff: java.time.Instant = now.minus(java.time.Duration.ofHours(rangeHours))
}
