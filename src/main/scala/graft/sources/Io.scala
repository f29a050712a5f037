package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Readers/writers (SURVEY.md §2.1 S1-S2).
  *
  * CSV is the reference's only format (`src/data/loader.py:41`); Parquet
  * is this engine's primary format (columnar, pushdown, statistics).
  * CSV reads take an EXPLICIT schema — inferSchema costs a full extra
  * pass at 100 TB and is reserved for ad-hoc exploration.
  */
object Io {

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Ad-hoc only: schema inference double-reads the data. */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines source/sink (interchange format; same explicit-schema
    * discipline as CSV — inference would double-read at scale). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Per-invocation scratch sink path under java.io.tmpdir/<family>/:
    * a fresh UUID child (concurrent runs never collide), sweeping
    * siblings older than the TTL first. Round-trip queries cannot
    * clean up after themselves — the frame they return reads the sink
    * lazily — so each run retires its predecessors' leftovers. The
    * sweep deletes RECURSIVELY (a crashed write leaves a nested
    * `_temporary/` subtree a flat delete would strand forever), and the
    * 6-hour TTL is far beyond any single session's lifetime, so a
    * long-lived session's still-lazily-read sink is never swept by a
    * newer run. */
  def scratchDir(family: String, staleAfterMs: Long = 6 * 60 * 60 * 1000L): String = {
    val parent = new java.io.File(System.getProperty("java.io.tmpdir"), family)
    parent.mkdirs()
    val cutoff = System.currentTimeMillis() - staleAfterMs
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete()
    }
    Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(_.lastModified() < cutoff)
      .foreach(deleteRec)
    new java.io.File(parent, java.util.UUID.randomUUID().toString).getAbsolutePath
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Parquet sink, optionally partitioned — partition columns become
    * directory pruning keys for downstream readers. */
  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC source/sink (Spark-native orc-core): the columnar warehouse
    * format next to parquet — same pushdown/pruning behavior through
    * the DataSource V2 scan, proven lossless by the q158 round trip. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
