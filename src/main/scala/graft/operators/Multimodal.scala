package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7): image/audio/video as opaque
  * `binary` columns with typed metadata, batch feature extraction via a
  * partition-iterator transform.
  *
  * Two tiers of "decode" (round 8): container HEADER parsing
  * (`parseHeader`/`describeHeaders`) is REAL — PNG/GIF/WAV/JPEG/BMP
  * magic + dimensions/sample-rate from raw bytes, no codec needed,
  * oracle-checked by q100's construct→parse round trip. Pixel/sample
  * decode (`extractFeatures`) stays a STUB — media codecs aren't
  * available in this environment — but its Spark-side plumbing is real
  * and tested: the schema, the per-partition batching (the Scala analog
  * of a vectorized Python mapInPandas decode), the UDF signature, and
  * the partitioning that keeps a media blob and its features
  * co-located. Swap `decodeStub` for a real codec call and nothing
  * else changes.
  */
object Multimodal {

  /** Output schema of the feature extractor. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Wrap any table into a media table: an opaque binary payload plus
    * typed metadata (here: utf-8 bytes of a text column stand in for an
    * image/audio blob — the engine treats payloads as opaque anyway). */
  def asMediaTable(df: DataFrame, id: Column, payload: Column,
                   kind: String): DataFrame =
    df.select(id.cast("long").as("media_id"),
      lit(kind).as("kind"),
      payload.cast("binary").as("blob"),
      length(payload.cast("binary")).cast("long").as("n_bytes"))

  /** STUB decoder: a real implementation would decode the blob with a
    * codec and pool pixel/sample values; this deterministic fake is
    * testable end-to-end AND oracle-checkable: the leading 4 features are
    * real byte statistics of the blob — length, unsigned-byte sum mod
    * 2^24 (exact in a Float), min byte, max byte — which a second engine
    * can recompute on the same payload (q80's DuckDB row). The remaining
    * dims are rolling-hash filler. Replace for production. */
  private[operators] def decodeStub(blob: Array[Byte], dim: Int): Array[Float] = {
    // ---- STUB: replace with real image/audio decode + pooling ----
    val out = new Array[Float](dim)
    var sum = 0L; var mn = 256; var mx = -1
    var h = 1125899906842597L
    var i = 0
    while (i < blob.length) {
      val b = blob(i) & 0xFF
      sum += b; if (b < mn) mn = b; if (b > mx) mx = b
      h = 31 * h + b
      i += 1
    }
    if (blob.isEmpty) { mn = 0; mx = 0 }
    val stats = Array(blob.length.toFloat, (sum % 16777216L).toFloat,
      mn.toFloat, mx.toFloat)
    var j = 0
    while (j < dim && j < stats.length) { out(j) = stats(j); j += 1 }
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 33).toDouble / (1L << 31).toDouble - 0.5).toFloat
      j += 1
    }
    out
  }

  // -- REAL header decode (round-8: the one decode stage that needs no
  // codec library — container metadata straight from the bytes) --------

  /** Parsed container metadata. Dimensions are 0 where the format has
    * none (audio), audio fields 0 for images; `valid=false` (format
    * "unknown", all zeros) for truncated or unrecognized payloads. */
  final case class MediaHeader(format: String, width: Long, height: Long,
                               channels: Long, sampleRate: Long, valid: Boolean)

  private val UnknownHeader = MediaHeader("unknown", 0L, 0L, 0L, 0L, valid = false)

  /** REAL (not stubbed) header parser for the common containers:
    * PNG (8-byte signature + IHDR big-endian dims), GIF87a/89a
    * (little-endian u16 logical-screen dims), WAV (RIFF/WAVE/fmt:
    * little-endian channels + sample rate), JPEG (SOI then a segment
    * walk to the first SOF0/1/2 frame header, big-endian dims), BMP
    * ("BM" + little-endian i32 dims). Pure byte arithmetic — the
    * metadata-extraction half of a media pipeline needs no codec; only
    * pixel/sample DECODE (extractFeatures' stub) does. Total: any
    * truncated or unrecognized payload yields the unknown header, never
    * a throw — at 100 TB some blobs WILL be garbage. */
  def parseHeader(blob: Array[Byte]): MediaHeader = {
    @inline def u8(i: Int): Int = blob(i) & 0xFF
    @inline def be16(i: Int): Long = ((u8(i) << 8) | u8(i + 1)).toLong
    @inline def le16(i: Int): Long = ((u8(i + 1) << 8) | u8(i)).toLong
    @inline def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le32(i: Int): Long =
      (u8(i + 3).toLong << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)
    def ascii(i: Int, s: String): Boolean =
      blob.length >= i + s.length && s.indices.forall(j => u8(i + j) == s.charAt(j))
    val n = blob.length
    if (n >= 24 && u8(0) == 0x89 && ascii(1, "PNG") && u8(4) == 0x0D &&
        u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A && ascii(12, "IHDR"))
      MediaHeader("png", be32(16), be32(20), 0L, 0L, valid = true)
    else if ((ascii(0, "GIF87a") || ascii(0, "GIF89a")) && n >= 10)
      MediaHeader("gif", le16(6), le16(8), 0L, 0L, valid = true)
    else if (ascii(0, "RIFF") && ascii(8, "WAVE") && ascii(12, "fmt ") && n >= 28)
      MediaHeader("wav", 0L, 0L, le16(22), le32(24), valid = true)
    else if (ascii(0, "BM") && n >= 26)
      MediaHeader("bmp", le32(18), le32(22), 0L, 0L, valid = true)
    else if (n >= 4 && u8(0) == 0xFF && u8(1) == 0xD8 && u8(2) == 0xFF) {
      // JPEG: walk segments to the first frame header (SOF0/1/2)
      var i = 2
      var out = UnknownHeader
      var done = false
      while (!done && i + 3 < n && u8(i) == 0xFF) {
        val marker = u8(i + 1)
        if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2) {
          if (i + 8 < n) out = MediaHeader("jpeg", be16(i + 7), be16(i + 5),
            0L, 0L, valid = true)
          done = true
        } else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) {
          i += 2 // standalone marker, no length field
        } else {
          i += 2 + be16(i + 2).toInt
        }
      }
      out
    } else UnknownHeader
  }

  val headerSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("valid", BooleanType, nullable = false)))

  /** Per-blob header metadata — the same partition-batched shape as
    * `extractFeatures`, but the parse is REAL. Input needs
    * (media_id, blob). */
  def describeHeaders(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(headerSchema)
    media.select("media_id", "blob")
      .mapPartitions { rows =>
        rows.map { r =>
          val h = parseHeader(r.getAs[Array[Byte]]("blob"))
          Row(r.getLong(0), h.format, h.width, h.height, h.channels,
            h.sampleRate, h.valid)
        }
      }(enc)
  }

  /** Batch feature extraction: one partition = one decoder session
    * (mirrors mapInPandas batch semantics — codec init amortized across
    * the partition, not per row). */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "kind", "blob", "n_bytes")
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec handles, model)
        rows.map { r =>
          val blob = r.getAs[Array[Byte]]("blob")
          Row(r.getLong(0), r.getString(1), r.getLong(3),
            decodeStub(blob, dim).toSeq)
        }
      }(enc)
  }
}
