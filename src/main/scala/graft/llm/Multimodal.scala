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

  // ---------------------------------------------------------------------
  // B174 — REAL decode leg (VERDICT r13 item 7): a pure-JVM decoder for
  // an uncompressed raster format closes the "decode is a stub" caveat.
  // PPM P6 (Poskanzer, netpbm): ASCII header "P6 <w> <h> <maxval>\n"
  // followed by w·h·3 raw RGB bytes — the simplest format that still
  // exercises everything a real codec path needs (magic check, header
  // parse, payload-length validation, pixel arithmetic).
  // ---------------------------------------------------------------------

  /** Decoded PPM record: real dimensions + real pixel statistics. */
  final case class PpmFeature(
      media_id: Long, width: Int, height: Int, n_bytes: Long, luma_sum: Long)

  /** Deterministic P6 payload for a media id: w = (id % 48) + 16,
    * h = (id % 32) + 8, pixel byte i = (id + i) mod 256. A pure function
    * of the id so the DuckDB oracle can predict every decoded statistic
    * analytically — while the Spark side must actually PARSE the bytes it
    * generated (a header-offset or length bug breaks the hash). */
  def ppmPayload(id: Long): Array[Byte] = {
    val w = (id % 48).toInt + 16
    val h = (id % 32).toInt + 8
    val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < 3 * w * h) {
      out(header.length + i) = ((id + i) % 256).toByte
      i += 1
    }
    out
  }

  /** REAL P6 parser (no codecs needed — the format is uncompressed):
    * validates the magic, reads the three whitespace-separated ASCII
    * header ints, requires maxval ≤ 255 and an exact-length payload,
    * and computes the pixel statistics from the ACTUAL bytes. Throws on
    * malformed input (a quarantine wrapper is the caller's choice —
    * the A14 per-center pattern). */
  def decodePpm(id: Long, payload: Array[Byte]): PpmFeature = {
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
      s"media $id: not a P6 PPM payload")
    var pos = 2
    def nextInt(): Int = {
      while (pos < payload.length && Character.isWhitespace(payload(pos))) pos += 1
      require(pos < payload.length, s"media $id: truncated PPM header")
      var v = 0
      while (pos < payload.length && !Character.isWhitespace(payload(pos))) {
        val c = payload(pos) - '0'
        require(c >= 0 && c <= 9, s"media $id: non-numeric PPM header")
        v = v * 10 + c
        pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(w > 0 && h > 0 && maxval > 0 && maxval <= 255,
      s"media $id: unsupported PPM dims/maxval $w x $h / $maxval")
    pos += 1 // the single whitespace byte after maxval
    val n = 3L * w * h
    require(payload.length - pos == n,
      s"media $id: PPM payload ${payload.length - pos} bytes, expected $n")
    var luma = 0L
    var i = pos
    while (i < payload.length) { luma += payload(i) & 0xFF; i += 1 }
    PpmFeature(id, w, h, n, luma)
  }

  /** B174 — the decode→resize chain with a REAL decoder: generate P6
    * payloads (one per image-slot doc), parse them byte-for-byte in the
    * same per-partition batch shape as [[decodeFeatures]], and feed the
    * REAL decoded dims into the b79 resize stage (32×32 box). The oracle
    * predicts every column analytically from the id formula — width/
    * height from the header the parser must recover, luma_sum as the
    * mod-256 pixel series the parser must sum from actual bytes, resize
    * through the b79 integer CASE — so the hash fails on any
    * header-offset, length, sign (byte → unsigned), or rounding defect.
    * The [[decodeStub]] path stays as the documented fallback for
    * formats the container genuinely cannot decode.
    *
    * Scale posture: generate and decode are one fused mapPartitions pass
    * — payloads never shuffle (the Multimodal rule), output is O(1)
    * scalars per media row; the final ORDER BY is gate presentation. */
  private val b174 = entry(
    "b174_multimodal_ppm_decode",
    s"""WITH ids AS (
       |  SELECT doc_id AS media_id,
       |         CAST((doc_id % 48) + 16 AS INTEGER) AS w,
       |         CAST((doc_id % 32) + 8 AS INTEGER) AS ht
       |  FROM documents WHERE doc_id % 3 = 0),
       |decoded AS (
       |  SELECT media_id, w, ht,
       |         CAST(3 * w * ht AS BIGINT) AS n_bytes,
       |         CAST(list_sum(list_transform(
       |           generate_series(0, 3 * w * ht - 1),
       |           i -> (media_id + i) % 256)) AS BIGINT) AS luma_sum
       |  FROM ids)
       |SELECT media_id, w AS width, ht AS height,
       |       CASE WHEN w <= 32 AND ht <= 32 THEN w
       |            WHEN 32 * ht <= 32 * w THEN 32
       |            ELSE greatest(1, CAST((w * 32 + ht // 2) // ht AS INTEGER)) END AS rs_width,
       |       CASE WHEN w <= 32 AND ht <= 32 THEN ht
       |            WHEN 32 * ht <= 32 * w THEN greatest(1, CAST((ht * 32 + w // 2) // w AS INTEGER))
       |            ELSE 32 END AS rs_height,
       |       n_bytes, luma_sum
       |FROM decoded
       |ORDER BY media_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions { ids =>
        // per-partition decoder init would go here (codec context); the
        // decode→resize chain is one fused narrow pass — payloads never
        // leave the partition, resize consumes the SAME resizeDims the
        // b79 stub chain (and its oracle) pin
        ids.map { id =>
          val f = decodePpm(id, ppmPayload(id))
          val rs = resizeDims(
            MediaFeature(f.media_id, "image/ppm", f.n_bytes, f.width, f.height, 1),
            maxW = 32, maxH = 32)
          (f.media_id, f.width, f.height, rs.width, rs.height, f.n_bytes, f.luma_sum)
        }
      }
      .toDF("media_id", "width", "height", "rs_width", "rs_height",
        "n_bytes", "luma_sum")
      .orderBy("media_id")
  }

  val entries: Seq[Entry] = Seq(b47, b47d, b79, b174)
}
