package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Registry._
import graft.sources.Tables

/** Multimodal column handling (SURVEY B47 + driver mandate): media payloads
  * as opaque binary columns with typed metadata, plus the decode /
  * feature-extract plumbing a real pipeline would run.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic fake — but the Spark-side plumbing is real:
  * schema (binary payload + struct metadata), partition-preserving
  * mapPartitions batch shape (the Scala analog of mapInPandas: one iterator
  * per partition, decoder state initialized once per partition, never per
  * row), and typed output. Swapping the stub for a JNI/codec call changes
  * no plan shape.
  *
  * Scale posture: payloads never shuffle — metadata extraction projects
  * scalars before any wide operation; group-bys run on the extracted
  * columns. At 100 TB the payload column stays in parquet until the final
  * per-partition decode.
  */
object Multimodal {

  /** Typed decoded-media record (what a real decoder would emit). */
  final case class MediaFeature(
      media_id: Long, kind: String, size_bytes: Long,
      width: Int, height: Int, frames: Int)

  /** A synthetic media table derived deterministically from documents: the
    * text bytes stand in for an opaque media payload. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("content_type"),
        col("n_chars").cast("long").as("declared_size"),
        col("source").as("origin")).as("meta"))

  /** STUB decoder (marked per driver instructions): derives fake
    * width/height/frames from a payload hash — deterministic, cheap, and
    * shaped exactly like a real per-partition codec call. The hash is the
    * engine-wide cross-dialect 40-bit polynomial fold (not JVM
    * Arrays.hashCode), so the whole decode pipeline is replicable in the
    * DuckDB oracle and b47_multimodal_decode is t2 hash-matched. */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    // fold CODEPOINTS of the decoded payload (Winnowing.polyFoldString),
    // not raw bytes: DuckDB's ascii(substr(text,j,1)) iterates characters,
    // so a per-byte fold would silently diverge from the oracle on the
    // first non-ASCII character (identical for ASCII, but the invariant
    // should live in code, not in an assumption about the fixtures)
    val h = Winnowing.polyFoldString(
      new String(payload, java.nio.charset.StandardCharsets.UTF_8))
    val w = (h % 1920).toInt + 1
    val ht = ((h / 1920) % 1080).toInt + 1
    val frames = kind match {
      case k if k.startsWith("video") => (h % 300).toInt + 1
      case k if k.startsWith("audio") => (h % 48000).toInt + 1
      case _ => 1
    }
    (w, ht, frames)
  }

  /** The mapPartitions decode pass: iterator-in/iterator-out per partition
    * (decoder init happens once per partition, not per row — the batch
    * shape that matters for a real codec). */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.content_type").as("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (e.g. codec context)
        rows.map { case (id, payload, kind) =>
          val (w, h, f) = decodeStub(kind, payload)
          MediaFeature(id, kind, payload.length.toLong, w, h, f)
        }
      }
  }

  /** Resize stage (STUB math, real plan shape): fit decoded dims into a
    * bounding box preserving aspect ratio — a narrow typed map, no
    * shuffle; chains after [[decodeFeatures]] like a real codec pass.
    *
    * INTEGER arithmetic throughout (compare cross-products to pick the
    * binding dimension, then one multiply + floor-div): a float
    * `round(dim * scale)` would make the result depend on the engine's
    * half-way rounding at representation boundaries (the b22 trap), while
    * this is exactly replicable in the b79 oracle's SQL. */
  def resize(features: Dataset[MediaFeature], maxW: Int, maxH: Int): Dataset[MediaFeature] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f => resizeDims(f, maxW, maxH) }
  }

  /** JVM twin of the b79 oracle's resize expressions. The scaled dimension
    * rounds to NEAREST via `(num + den/2) div den` — floor division would
    * lose up to a pixel on the small dimension of extreme aspect ratios
    * (visible aspect drift), and a float `round` would reintroduce the
    * engine-dependent half-way case this exists to avoid. */
  def resizeDims(f: MediaFeature, maxW: Int, maxH: Int): MediaFeature =
    if (f.width <= maxW && f.height <= maxH) f
    else if (maxW.toLong * f.height <= maxH.toLong * f.width)
      // width-bound: width pins to maxW, height scales by maxW/width
      f.copy(width = maxW,
        height = math.max(1,
          ((f.height.toLong * maxW + f.width / 2) / f.width).toInt))
    else
      f.copy(width = math.max(1,
          ((f.width.toLong * maxH + f.height / 2) / f.height).toInt),
        height = maxH)

  /** Frame sampling (video/audio): keep every `stride`-th frame index —
    * deterministic, one row per kept frame carrying the (possibly resized)
    * dims for downstream per-frame feature extraction. Generator-shaped,
    * still shuffle-free. THE one stride definition — b79 consumes this
    * same function, so the t2 oracle pins it. */
  def sampleFrames(features: Dataset[MediaFeature], stride: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.flatMap(f =>
        (0 until f.frames by stride).map(i => (f.media_id, f.kind, f.width, f.height, i)))
      .toDF("media_id", "kind", "width", "height", "frame_idx")
  }

  /** B47 — binary payload + metadata: size, digests, content-type dispatch.
    * All t2-checkable (digests of identical bytes agree across engines). */
  private val b47 = entry(
    "b47_multimodal_binary",
    """SELECT doc_id AS media_id,
      |       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |            ELSE 'video/mp4' END AS content_type,
      |       octet_length(text::BLOB) AS size_bytes,
      |       md5(text) AS payload_md5,
      |       sha256(text) AS payload_sha256,
      |       substr(text, 1, 8) AS head_bytes_utf8
      |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
    mediaTable(s, d)
      .select(
        col("media_id"),
        col("meta.content_type").as("content_type"),
        length(col("payload")).cast("long").as("size_bytes"),
        md5(col("payload")).as("payload_md5"),
        sha2(col("payload"), 256).as("payload_sha256"),
        substring(col("payload").cast("string"), 1, 8).as("head_bytes_utf8"))
      .orderBy("media_id")
  }

  /** Decoded-feature aggregation (stub decode → per-kind stats). The
    * decode runs engine-local in mapPartitions, but because the stub's
    * hash is the cross-dialect polynomial fold the ORACLE re-derives the
    * identical features in SQL — a full t2 hash-match through typed
    * Dataset plumbing. avg is spelled as exact-integer-sum / count in
    * both dialects (a native float avg's partial merge order is
    * run-dependent). The fold is codepoint-based on all three surfaces
    * (JVM stub, Spark SQL, DuckDB) — non-ASCII equivalence incl. astral
    * codepoints is pinned by the b45_fold_unicode fixture entry. */
  private val b47d = entry(
    "b47_multimodal_decode",
    s"""WITH feat AS (
       |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
       |              WHEN doc_id % 3 = 1 THEN 'audio/wav'
       |              ELSE 'video/mp4' END AS kind,
       |         octet_length(text::BLOB) AS size_bytes,
       |         ${Winnowing.polyFoldDuck("text")} AS h
       |  FROM documents),
       |dims AS (
       |  SELECT kind, size_bytes,
       |         (h % 1920) + 1 AS width,
       |         CASE WHEN kind LIKE 'video%' THEN (h % 300) + 1
       |              WHEN kind LIKE 'audio%' THEN (h % 48000) + 1
       |              ELSE 1 END AS frames
       |  FROM feat)
       |SELECT kind, count(*) AS n,
       |       CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
       |       round(CAST(CAST(sum(width) AS BIGINT) AS DOUBLE) / count(*), 4) AS avg_width,
       |       CAST(max(frames) AS INTEGER) AS max_frames
       |FROM dims GROUP BY kind ORDER BY kind""".stripMargin) { (s, d) =>
    decodeFeatures(mediaTable(s, d)).toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(col("size_bytes")).as("total_bytes"),
        round(sum(col("width")).cast("double") / count(lit(1)), 4).as("avg_width"),
        max(col("frames")).as("max_frames"))
      .orderBy("kind")
  }

  /** B79 — the decode → resize → frame-sample chain, driver-visible: per
    * sampled video frame one (media_id, width, height, frame_idx) row, the
    * unit of work a per-frame feature extractor consumes. All three stages
    * are STUB math with real plan shape (mapPartitions decode, narrow typed
    * resize map, generator-shaped sampling — zero shuffles before the final
    * t2 ORDER BY); because the stub derives everything from the
    * cross-dialect polynomial fold and the resize is integer-exact, the
    * ORACLE replays the whole chain in SQL — a full t2 hash-match through
    * typed Dataset plumbing. Stride 30 ≈ one frame per second of 30 fps
    * video. */
  private val b79 = entry(
    "b79_multimodal_frames",
    s"""WITH feat AS (
       |  SELECT doc_id AS media_id,
       |         ${Winnowing.polyFoldDuck("text")} AS h
       |  FROM documents WHERE doc_id % 3 = 2),
       |dims AS (
       |  SELECT media_id,
       |         CAST((h % 1920) + 1 AS INTEGER) AS w,
       |         CAST(((h // 1920) % 1080) + 1 AS INTEGER) AS ht,
       |         CAST((h % 300) + 1 AS INTEGER) AS frames
       |  FROM feat),
       |resized AS (
       |  SELECT media_id, frames,
       |         CASE WHEN w <= 224 AND ht <= 224 THEN w
       |              WHEN 224 * ht <= 224 * w THEN 224
       |              ELSE greatest(1, CAST((w * 224 + ht // 2) // ht AS INTEGER)) END AS width,
       |         CASE WHEN w <= 224 AND ht <= 224 THEN ht
       |              WHEN 224 * ht <= 224 * w THEN greatest(1, CAST((ht * 224 + w // 2) // w AS INTEGER))
       |              ELSE 224 END AS height
       |  FROM dims)
       |SELECT media_id, width, height,
       |       CAST(unnest(generate_series(0, frames - 1, 30)) AS INTEGER) AS frame_idx
       |FROM resized
       |ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
    // filter BEFORE the typed decode: Catalyst cannot push a predicate
    // through mapPartitions, so filtering on kind afterwards would run
    // the (stand-in for an expensive) codec on the 2/3 non-video rows
    val videos = resize(
      decodeFeatures(mediaTable(s, d)
        .filter(col("meta.content_type") === "video/mp4")),
      maxW = 224, maxH = 224)
    sampleFrames(videos, stride = 30)
      .select("media_id", "width", "height", "frame_idx")
      .orderBy("media_id", "frame_idx")
  }

  val entries: Seq[Entry] = Seq(b47, b47d, b79)
}
