package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7): image/audio/video as opaque
  * `binary` columns with typed metadata, batch feature extraction via a
  * partition-iterator transform.
  *
  * The decode step is a STUB — media codecs aren't available in this
  * environment — but the Spark-side plumbing is real and tested: the
  * schema, the per-partition batching (the Scala analog of a vectorized
  * Python mapInPandas decode), the UDF signature, and the partitioning
  * that keeps a media blob and its features co-located. Swap
  * `decodeStub` for a real codec call and nothing else changes.
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
