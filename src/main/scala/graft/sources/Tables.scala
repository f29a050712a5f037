package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness star schema (TESTDATA.md).
  *
  * One parquet file per table; schemas are fixed by the driver so we read
  * them as-is (Parquet self-describes; Catalyst prunes columns and pushes
  * predicates into the scan). At cluster scale the same loaders work on a
  * directory of many files — nothing here assumes a single file.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "region")
  /** Normalize an event-time column to proper TIMESTAMP no matter how
    * the writer encoded it — the driver testdata has shipped `events.ts`
    * in two physical forms across rounds:
    *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
    *    with the legacy nanos-as-long conf it arrives as LongType nanos,
    *    floored to µs here (the same ns→µs floor DuckDB applies);
    *  - parquet timestamp[us] with isAdjustedToUTC=false: Spark ≥3.4
    *    infers TIMESTAMP_NTZ. Every graft session pins the UTC session
    *    timezone, so `cast(ntz as timestamp)` reinterprets the wall
    *    clock as UTC — the exact epoch micros DuckDB's naive TIMESTAMP
    *    read yields for the same file.
    * Either way downstream code sees one type (TimestampType, UTC), and
    * `unix_micros`/`window()`/`getTimestamp` all keep working when the
    * driver regenerates the data in the other encoding. */
  def normalizeTs(df: DataFrame, c: String = "ts"): DataFrame =
    df.schema.find(_.name == c).map(_.dataType) match {
      case Some(LongType)         => df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      case Some(TimestampNTZType) => df.withColumn(c, col(c).cast(TimestampType))
      case _                      => df
    }

  /** The nanos-as-long conf is save/restored around the read, not left
    * set (round-8 leak fix): the parquet relation captures its hadoop
    * conf when `spark.read.parquet` builds it, so later actions on the
    * returned lazy frame don't need the session conf anymore (probed
    * empirically: count/collect succeed after an unset), while a leaked
    * `true` would make any OTHER nanos-parquet read silently see longs.
    * It is a no-op for the µs-NTZ encoding. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try normalizeTs(read(spark, dir, "events"))
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Register every harness table as a temp view, giving the engine a
    * SQL front-end: the ANSI-portable part of the oracle corpus runs
    * verbatim through `spark.sql` (SqlSurfaceSpec asserts identical
    * results to the DataFrame forms). */
  def registerViews(spark: SparkSession, dir: String): Unit = Seq(
    "lineitem" -> lineitem _, "orders" -> orders _, "customer" -> customer _,
    "supplier" -> supplier _, "part" -> part _, "nation" -> nation _,
    "region" -> region _, "events" -> events _, "documents" -> documents _,
    "embeddings" -> embeddings _
  ).foreach { case (n, f) => f(spark, dir).createOrReplaceTempView(n) }
}
