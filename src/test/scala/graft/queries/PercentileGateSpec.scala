package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate-percentile helpers (round-10 verdict #1/#2): discPercentiles
  * must return ACTUAL data values at the SQL-standard ceil-rank;
  * interpPercentiles must agree with the builtin interpolated
  * percentile to double precision while using only explicit arithmetic
  * (so both engines hash identical bits). */
class PercentileGateSpec extends SparkSpec {
  import spark.implicits._

  test("discPercentiles: ceil-rank data values, grouped and global, ties included") {
    // group a: 1..10 → p50 at rank ceil(5.0)=5 → 5.0; p01 rank ceil(0.1)=1 → 1.0
    // group b: ties [2,2,2,7] → p50 rank ceil(2.0)=2 → 2.0
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      Seq(("b", 2.0), ("b", 2.0), ("b", 2.0), ("b", 7.0))).toDF("g", "v")
    val r = Util.discPercentiles(df, Seq("g"), "v",
        Seq(("p50", 1, 2), ("p01", 1, 100), ("p99", 99, 100)))
      .orderBy("g").collect()
    assert(r(0).getDouble(1) == 5.0 && r(0).getDouble(2) == 1.0 && r(0).getDouble(3) == 10.0)
    assert(r(1).getDouble(1) == 2.0 && r(1).getDouble(3) == 7.0)
    // global (empty groupCols): single row
    val g = Util.discPercentiles(df.filter($"g" === "a"), Seq.empty, "v",
      Seq(("p50", 1, 2))).collect()
    assert(g.length == 1 && g(0).getDouble(0) == 5.0)
  }

  test("discPercentiles: every returned value is an element of the input") {
    val df = (1 to 997).map(i => math.sin(i) * 1000).toDF("v")
    val vals = df.collect().map(_.getDouble(0)).toSet
    val r = Util.discPercentiles(df, Seq.empty, "v",
      Seq(("p01", 1, 100), ("p50", 1, 2), ("p99", 99, 100))).collect()(0)
    (0 until 3).foreach(i => assert(vals.contains(r.getDouble(i)),
      s"column $i returned a non-data value ${r.getDouble(i)}"))
  }

  test("interpPercentiles matches builtin percentile() to 1e-12 relative") {
    val df = ((1 to 101).map(i => ("odd", math.cos(i) * 500)) ++
      (1 to 100).map(i => ("even", math.sin(i) * 500))).toDF("g", "v")
    val mine = Util.interpPercentiles(df, Seq("g"), "v",
        Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .orderBy("g").collect()
    val ref = df.groupBy("g")
      .agg(expr("percentile(v, array(0.5, 0.9, 0.99))").as("ex"))
      .orderBy("g").collect()
    for (row <- 0 to 1; i <- 0 until 3) {
      val m = mine(row).getDouble(i + 1)
      val e = ref(row).getAs[Seq[Double]]("ex")(i)
      assert(math.abs(m - e) <= 1e-12 * math.max(1.0, math.abs(e)),
        s"row $row p$i: $m vs builtin $e")
    }
  }

  test("interpPercentiles: exact-rank hit has zero interpolation; nulls filtered") {
    // n=5 (after null filter), p50 → index (5-1)/2=2 exact → v=30 exactly
    val df = Seq(Some(10.0), Some(20.0), Some(30.0), None, Some(40.0), Some(50.0))
      .toDF("v")
    val r = Util.interpPercentiles(df, Seq.empty, "v", Seq(("p50", 1, 2))).collect()
    assert(r(0).getDouble(0) == 30.0)
  }

  test("randomized property: interp matches builtin, disc is a member, at every group size 1..40") {
    // group g_k has exactly k rows — exercises every tiny-group edge
    // (single element, even/odd counts, rank clamping) in one frame
    val rnd = new scala.util.Random(41)
    val rows = for (k <- 1 to 40; i <- 1 to k) yield (f"g$k%02d", rnd.nextGaussian() * 100)
    val df = rows.toDF("g", "v")
    val byGroup = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSet }
    val mine = Util.interpPercentiles(df, Seq("g"), "v",
        Seq(("p25", 1, 4), ("p50", 1, 2), ("p95", 19, 20)))
      .join(Util.discPercentiles(df, Seq("g"), "v",
        Seq(("d25", 1, 4), ("d50", 1, 2), ("d95", 19, 20))), Seq("g"))
    val ref = df.groupBy("g")
      .agg(expr("percentile(v, array(0.25, 0.5, 0.95))").as("ex"))
    val joined = mine.join(ref, Seq("g")).collect()
    assert(joined.length == 40)
    joined.foreach { r =>
      val g = r.getString(0)
      val ex = r.getAs[scala.collection.Seq[Double]]("ex")
      Seq(("p25", 0), ("p50", 1), ("p95", 2)).foreach { case (c, i) =>
        val m = r.getAs[Double](c)
        assert(math.abs(m - ex(i)) <= 1e-12 * math.max(1.0, math.abs(ex(i))),
          s"$g $c: $m vs builtin ${ex(i)}")
      }
      Seq("d25", "d50", "d95").foreach { c =>
        assert(byGroup(g).contains(r.getAs[Double](c)),
          s"$g $c returned a non-member value")
      }
    }
  }

  test("interpSql/discSql twins: DuckDB-shaped SQL runs in Spark and matches the helpers") {
    // SqlSurfaceSpec proves the oracle corpus parses; this pins the
    // generated snippets' VALUES to the DataFrame helpers on a shared corpus
    val df = (1 to 250).map(i => (s"g${i % 3}", math.sin(i * 7) * 100)).toDF("g", "v")
    df.createOrReplaceTempView("pg_t")
    val sql = spark.sql(
      s"""WITH r AS (
         | SELECT g, v,
         |  row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
         |  count(*) OVER (PARTITION BY g) AS n
         | FROM pg_t WHERE v IS NOT NULL)
         |SELECT g, ${Util.interpSql("v", 1, 2)} AS p50i,
         | ${Util.discSql("v", 99, 100)} AS p99d
         |FROM r GROUP BY g ORDER BY g""".stripMargin).collect()
    val helper = Util.interpPercentiles(df, Seq("g"), "v", Seq(("p50i", 1, 2)))
      .join(Util.discPercentiles(df, Seq("g"), "v", Seq(("p99d", 99, 100))), Seq("g"))
      .orderBy("g").collect()
    sql.zip(helper).foreach { case (a, b) =>
      assert(a.getDouble(1) == b.getDouble(1) && a.getDouble(2) == b.getDouble(2))
    }
  }
}
