package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BoundedTopK contracts: exact parity with the row_number window
  * shortlist under (key desc, id asc), at any partitioning. */
class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val scored = {
    val rnd = new scala.util.Random(7)
    // duplicate keys included so tie-break-by-id is exercised
    (0 until 5000).map { i =>
      (i % 7L, math.floor(rnd.nextDouble() * 50) / 50.0, i.toLong)
    }.toDF("g", "key", "id")
  }

  test("aggregate shortlist equals the window-rank shortlist, at 1 and " +
    "32 partitions") {
    val w = Window.partitionBy("g").orderBy(col("key").desc, col("id").asc)
    val expected = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 25).select("g", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (parts <- Seq(1, 32)) {
      val got = BoundedTopK.shortlist(scored.repartition(parts), "g", "key",
          "id", 25)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"parity failed at $parts partitions")
    }
  }

  test("NaN keys rank LAST and deterministically (round-18 advice): a " +
    "NaN score never displaces a real one, at any partitioning") {
    // 3 NaN rows seeded among 40 real ones; with the pre-fix comparator
    // a NaN inserted at position 0 and always won
    val rows = (0 until 40).map(i => (1L, i / 40.0, i.toLong)) ++
      Seq((1L, Double.NaN, 100L), (1L, Double.NaN, 101L), (1L, Double.NaN, 99L))
    val df = rows.toDF("g", "key", "id")
    for (parts <- Seq(1, 32)) {
      val top5 = BoundedTopK.shortlist(df.repartition(parts), "g", "key", "id", 5)
        .collect().map(_.getLong(1)).toSeq
      assert(top5 == Seq(39L, 38L, 37L, 36L, 35L),
        s"NaN displaced a real key at $parts partitions: $top5")
    }
    // when k exceeds the real rows, NaNs fill the TAIL, ties by id asc —
    // LocalAnn's canonical (sim desc, id asc, NaN last) merge key
    val all = BoundedTopK.shortlist(df, "g", "key", "id", 43)
      .collect().map(_.getLong(1)).toSeq
    assert(all.takeRight(3) == Seq(99L, 100L, 101L))
  }

  test("round-20 rankHits equals the row_number window bit-for-bit: " +
    "null keys last, boundary ties by id, every partitioning") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    // duplicate key values force boundary ties; ~10% null keys
    val rows = (0 until 500).map { i =>
      (i % 7L, if (rnd.nextInt(10) == 0) null else java.lang.Double.valueOf(
        (rnd.nextInt(25) / 10.0)), i.toLong)
    }
    val df = rows.toDF("g", "key", "id")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) "null"
        else java.lang.Double.doubleToLongBits(r.getDouble(2)).toString))
        .sortBy(t => (t._1, t._2)).toSeq
    for (k <- Seq(1, 3, 80); parts <- Seq(1, 4, 13)) {
      val part = df.repartition(parts)
      val w = Window.partitionBy("g").orderBy(desc("key"), col("id").asc)
      val viaWindow = part.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("g", "id", "key")
      val viaAgg = BoundedTopK.rankHits(part, "g", "key", "id", k)
        .select("g", "id", "key")
      assert(canon(viaAgg) == canon(viaWindow),
        s"rankHits diverged from the window at k=$k parts=$parts")
    }
  }

  test("k larger than the group returns the whole group, ranked") {
    val tiny = Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.5, 9L))
      .toDF("g", "key", "id")
    val got = BoundedTopK.shortlist(tiny, "g", "key", "id", 10)
      .collect().map(_.getLong(1)).toSeq
    // explode preserves buffer order: (key desc, id asc)
    assert(got == Seq(11L, 9L, 10L))
  }
}
