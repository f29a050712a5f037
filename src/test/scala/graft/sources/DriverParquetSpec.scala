package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-20 optimization gate: the serving loads (`ModelRegistry.load*`,
  * `LocalAnn.load`, `Hnsw.load[Shard]`, `Ivf.loadLocal`) now read their
  * parquet tables driver-locally through [[DriverParquet]] instead of
  * `spark.read.parquet(...).collect()`. This spec pins the swap's only
  * risk: the driver-local rows must be VALUE-IDENTICAL (bit-for-bit on
  * floats/doubles) to the Spark reader's collect on every layout the
  * registry writes — primitives, strings, nulls, float/double/long
  * arrays, nested long arrays (hnsw links), null array cells, and
  * multi-part-file tables. */
class DriverParquetSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Canonical, bit-faithful form of one cell. */
  private def canon(v: Any): Any = v match {
    case null => "<null>"
    case f: Float => java.lang.Float.floatToRawIntBits(f)
    case d: Double => java.lang.Double.doubleToRawLongBits(d)
    case s: scala.collection.Seq[_] => s.map(canon).toVector
    case other => other
  }

  private def canonRows(rows: Seq[Row]): Seq[Vector[Any]] =
    rows.map(r => (0 until r.length).map(i =>
      canon(if (r.isNullAt(i)) null else r.get(i))).toVector)

  /** Both readers over `path`, same column order, rows sorted by their
    * canonical form (cross-file row order is not part of the contract). */
  private def assertSame(path: String, cols: Seq[String]): Unit = {
    val viaSpark = spark.read.parquet(path)
      .select(cols.map(col): _*).collect().toSeq
    val viaDriver = DriverParquet.readRows(spark, path, cols).toSeq
    assert(canonRows(viaDriver).sortBy(_.toString()) ==
      canonRows(viaSpark).sortBy(_.toString()),
      s"driver-local read of $path diverged from the Spark reader")
  }

  test("primitives + strings + nulls (registry meta layout)") {
    val p = tmp("dp_meta")
    Seq(("m1", 1L, "/a/v1", "auc", 0.91), ("m1", 2L, "/a/v2", "", Double.NaN),
        ("m2", 1L, "/b/v1", "__tombstoned", -0.0))
      .toDF("name", "version", "path", "metric", "value")
      .withColumn("value", when(col("version") === 1L, col("value")))
      .repartition(1).write.mode("overwrite").parquet(s"$p/t")
    assertSame(s"$p/t", Seq("name", "version", "path", "metric", "value"))
  }

  test("float/double/long/int arrays, null cells, null arrays (codes layouts)") {
    val p = tmp("dp_arrays")
    Seq(
      (1L, Seq(1.5f, -0.0f, Float.NaN), Seq(1, 2), Seq(0.25, -1e300), Seq(7L, 1L << 62)),
      (2L, Seq.empty[Float], Seq.empty[Int], Seq.empty[Double], Seq.empty[Long]))
      .toDF("id", "vec", "codes", "planes", "words")
      // a null array cell and a whole-null array column value
      .withColumn("codes", when(col("id") === 2L, lit(null)).otherwise(col("codes")))
      .repartition(1).write.mode("overwrite").parquet(s"$p/t")
    assertSame(s"$p/t", Seq("id", "vec", "codes", "planes", "words"))
  }

  test("nested long arrays (hnsw links layout) + boolean meta") {
    val p = tmp("dp_nested")
    Seq((10L, Seq(Seq(1L, 2L), Seq.empty[Long], Seq(3L)), true),
        (11L, Seq(Seq(5L)), false))
      .toDF("id", "links", "heuristic")
      .repartition(1).write.mode("overwrite").parquet(s"$p/t")
    assertSame(s"$p/t", Seq("id", "links", "heuristic"))
  }

  test("multi-part-file tables read completely; column projection + schemaOf") {
    val p = tmp("dp_parts")
    spark.range(1000).select(col("id"),
        (col("id") % 7).cast("int").as("k"),
        array(col("id").cast("float") * 0.5f).as("v"))
      .repartition(5).write.mode("overwrite").parquet(s"$p/t")
    assertSame(s"$p/t", Seq("id", "k", "v"))
    assertSame(s"$p/t", Seq("v", "id")) // projected + reordered
    assert(DriverParquet.schemaOf(spark, s"$p/t") ==
      spark.read.parquet(s"$p/t").schema)
    assert(DriverParquet.columnNames(spark, s"$p/t") == Seq("id", "k", "v"))
  }

  test("writeRows round-trips through BOTH readers (hnsw artifact layout)") {
    import org.apache.spark.sql.types._
    val p = tmp("dp_write")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("vec", ArrayType(FloatType)),
      StructField("level", IntegerType),
      StructField("links", ArrayType(ArrayType(LongType))),
      StructField("label", LongType),
      StructField("heuristic", BooleanType), StructField("note", StringType)))
    val rows = Seq(
      Row(1L, Seq(0.5f, -0.0f, Float.NaN), 2, Seq(Seq(2L, 3L), Seq.empty[Long]),
        7L, true, "a"),
      Row(2L, Seq.empty[Float], 0, Seq(Seq(1L)), 8L, false, null))
    DriverParquet.writeRows(spark, s"$p/t", schema, rows)
    // the Spark reader sees the same values
    val viaSpark = spark.read.parquet(s"$p/t")
      .select(schema.fieldNames.map(col): _*).collect().toSeq
    assert(canonRows(viaSpark).sortBy(_.toString()) ==
      canonRows(rows).sortBy(_.toString()),
      "spark.read of a DriverParquet-written file diverged")
    // and the driver-local reader round-trips
    val viaDriver = DriverParquet.readRows(spark, s"$p/t",
      schema.fieldNames.toSeq).toSeq
    assert(canonRows(viaDriver).sortBy(_.toString()) ==
      canonRows(rows).sortBy(_.toString()))
    // overwrite replaces, not appends
    DriverParquet.writeRows(spark, s"$p/t", schema, rows.take(1))
    assert(DriverParquet.readRows(spark, s"$p/t").length == 1)
  }

  test("missing path / missing column fail loudly") {
    intercept[IllegalArgumentException] {
      DriverParquet.readRows(spark, "/nonexistent/dp_path")
    }
    val p = tmp("dp_cols")
    Seq((1L, 2L)).toDF("a", "b").write.mode("overwrite").parquet(s"$p/t")
    val e = intercept[IllegalArgumentException] {
      DriverParquet.readRows(spark, s"$p/t", Seq("c"))
    }
    assert(e.getMessage.contains("no column `c`"))
  }

  test("row access parity: getAs by name, fieldIndex, getFloat/getLong") {
    val p = tmp("dp_access")
    Seq((0, 1, 0.5, Seq(0.1, 0.2))).toDF("out_dim", "eigen_rank", "eigenvalue", "row")
      .repartition(1).write.mode("overwrite").parquet(s"$p/t")
    val r = DriverParquet.headRow(spark, s"$p/t",
      Seq("out_dim", "eigen_rank", "eigenvalue", "row"))
    assert(r.getInt(0) == 0 && r.getInt(1) == 1 && r.getDouble(2) == 0.5)
    assert(r.getAs[scala.collection.Seq[Double]]("row").toArray.toSeq == Seq(0.1, 0.2))
    assert(r.schema.fieldIndex("eigenvalue") == 2)
  }
}
