package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SplitEncodingSpec extends SparkSpec {
  import spark.implicits._

  test("TimeSplit: exact positional 70/15/15 by (ts, id)") {
    val rows = (1 to 20).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00")))
    val df = rows.toDF("id", "ts")
    val out = TimeSplit.assign(df, $"ts", $"id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // floor(.7*20)=14 train, floor(.85*20)=17 -> 3 val, 3 test
    assert(out == Map("train" -> 14L, "val" -> 3L, "test" -> 3L))
  }

  test("TimeSplit: chronological — max(train ts) < min(test ts)") {
    val rows = (1 to 50).map(i => (i.toLong,
      new Timestamp(1700000000000L + (i * 7919 % 50) * 86400000L)))
    val df = rows.toDF("id", "ts")
    val agg = TimeSplit.assign(df, $"ts", $"id").groupBy("split")
      .agg(min("ts").as("mn"), max("ts").as("mx")).collect()
      .map(r => r.getString(0) -> (r.getTimestamp(1), r.getTimestamp(2))).toMap
    assert(!agg("train")._2.after(agg("val")._1))
    assert(!agg("val")._2.after(agg("test")._1))
  }

  test("TimeSplit.assignApprox: fractions within tolerance, still chronological") {
    val rows = (1 to 2000).map(i => (i.toLong,
      new Timestamp(1700000000000L + (i * 104729 % 2000) * 3600000L)))
    val df = rows.toDF("id", "ts")
    val out = TimeSplit.assignApprox(df, "ts").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("train") - 1400L) <= 30)
    assert(math.abs(out("val") - 300L) <= 30)
    val agg = TimeSplit.assignApprox(df, "ts").groupBy("split")
      .agg(min("ts").as("mn"), max("ts").as("mx")).collect()
      .map(r => r.getString(0) -> (r.getTimestamp(1), r.getTimestamp(2))).toMap
    assert(!agg("train")._2.after(agg("val")._1))
    assert(!agg("val")._2.after(agg("test")._1))
  }

  test("TimeSplit.assignApprox rejects non-quantileable keys with a clear error") {
    val df = Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("id", "day")
    val e = intercept[IllegalArgumentException] {
      TimeSplit.assignApprox(df, col("day"), 0.7, 0.85, 0.001)
    }
    assert(e.getMessage.contains("numeric, timestamp, or date"))
  }

  test("TimeSplit: date-typed keys split on both the exact and approx paths") {
    import java.sql.Date
    val rows = (1 to 2000).map(i =>
      (i.toLong, new Date(1700000000000L + (i * 104729 % 2000) * 86400000L)))
    val df = rows.toDF("id", "day")
    val exact = TimeSplit.assign(df, $"day", $"id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == Map("train" -> 1400L, "val" -> 300L, "test" -> 300L))
    // approx path: date quantiles over epoch days (unix_date) — fractions
    // within tolerance and still chronological
    val approx = TimeSplit.assignApprox(df, $"day", 0.7, 0.85, 0.001)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(approx("train") - 1400L) <= 30)
    assert(math.abs(approx("val") - 300L) <= 30)
    val agg = TimeSplit.assignApprox(df, $"day", 0.7, 0.85, 0.001)
      .groupBy("split").agg(min("day").as("mn"), max("day").as("mx")).collect()
      .map(r => r.getString(0) -> (r.getDate(1), r.getDate(2))).toMap
    assert(!agg("train")._2.after(agg("val")._1))
    assert(!agg("val")._2.after(agg("test")._1))
    // the auto-reroute accepts date keys too (quantileable now)
    val rerouted = TimeSplit.assign(df, $"day", $"id", exactMaxRows = 100L)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(rerouted("train") - 1400L) <= 30)
  }

  test("TimeSplit.assign auto-reroutes to the approx path above exactMaxRows") {
    // all rows share one ts: the exact path splits inside the tie via the
    // id tiebreaker (14/3/3), the approx path cannot — so the output
    // reveals which path ran
    val tied = (1 to 20).map(i =>
      (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("id", "ts")
    val exact = TimeSplit.assign(tied, $"ts", $"id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == Map("train" -> 14L, "val" -> 3L, "test" -> 3L))
    val rerouted = TimeSplit.assign(tied, $"ts", $"id", exactMaxRows = 5L)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rerouted == Map("train" -> 20L)) // quantile cutoff swallows the tie
  }

  test("TimeSplit.assign reads non-timestamp/non-long boundary types generically") {
    // long ordering key + int id: the old code hardcoded
    // getTimestamp/getLong and threw ClassCastException here
    val df = (1 to 20).map(i => (i, i * 100L)).toDF("id", "k")
    val out = TimeSplit.assign(df, $"k", $"id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("train" -> 14L, "val" -> 3L, "test" -> 3L))
  }

  test("TargetEncoding: train-only fit, broadcast join back, default for unseen") {
    val train = Seq(("a", 1.0), ("a", 0.0), ("b", 1.0)).toDF("k", "y")
    val apply = Seq("a", "b", "c").toDF("k")
    val out = TargetEncoding.fitTransform(train, apply, "k", $"y", default = 0.25)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 0.5 && out("b") == 1.0 && out("c") == 0.25)
  }

  test("ordered TS: exact prefix means + prior, and a row NEVER sees its own label") {
    // key a: labels 1, 0, 1 at order 1, 2, 3 — global mean P = 3/4
    val df = Seq(("a", 1, 1), ("a", 0, 2), ("a", 1, 3), ("b", 1, 4))
      .toDF("k", "y", "ord")
    val out = TargetEncoding.orderedEncode(df, "k", $"y", $"ord", smoothing = 1.0)
      .orderBy("ord").collect().map(_.getAs[Double]("ordered_ts"))
    val p = 0.75
    assert(out(0) == (0 + p) / 1.0)       // no history: pure prior
    assert(out(1) == (1 + p) / 2.0)       // saw only y=1
    assert(out(2) == (1 + 0 + p) / 3.0)   // saw 1, 0 — NOT its own 1
    assert(out(3) == (0 + p) / 1.0)       // key b: fresh history
    // leakage probe: flipping a LATER row's label must not change any
    // earlier row's encoding (only the global prior is held fixed, as
    // CatBoost does per permutation)
    val flipped = Seq(("a", 1, 1), ("a", 0, 2), ("a", 0, 3), ("b", 1, 4))
      .toDF("k", "y", "ord")
    val out2 = TargetEncoding.orderedEncode(flipped, "k", $"y", $"ord",
        smoothing = 1.0)
      .orderBy("ord").collect().map(_.getAs[Double]("ordered_ts"))
    // recompute with flipped prior P2 = 2/4: rows 1-2 change ONLY via
    // the global prior term, never via their history
    val p2 = 0.5
    assert(out2(0) == (0 + p2) / 1.0 && out2(1) == (1 + p2) / 2.0)
  }
}
