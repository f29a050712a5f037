package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.SparkSpec

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._
  import StreamingOps._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed counts with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = windowedCounts(events, watermarkDelay = "10 minutes", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:01:00"), "click", 1.0),
        (ts("2024-01-01 10:02:00"), "click", 2.0),
        (ts("2024-01-01 10:07:00"), "view", 5.0),
        // advance watermark far enough to close the earlier windows
        (ts("2024-01-01 11:00:00"), "click", 1.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 12:00:00"), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .orderBy("window_start", "event_type").collect()
      val clicks = rows.find(r => r.getString(1) == "click" &&
        r.getTimestamp(0) == ts("2024-01-01 10:00:00")).get
      assert(clicks.getLong(2) == 2 && clicks.getDouble(3) == 3.0)
      val views = rows.find(_.getString(1) == "view").get
      assert(views.getLong(2) == 1 && views.getTimestamp(0) == ts("2024-01-01 10:05:00"))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops in-horizon duplicates, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "content_hash", "value")
    val q = dedupWithinWatermark(events, Seq("content_hash"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:01:00"), 1L, 2.0),  // dup within horizon -> dropped
        (ts("2024-01-01 10:02:00"), 2L, 3.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:03:00"), 1L, 4.0)) // still in horizon
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2) // keys {1, 2} once each
      // advance the watermark far past key 1's state, then resend it:
      // the key re-admits — the documented bounded-state trade
      input.addData((ts("2024-01-01 11:00:00"), 99L, 0.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 11:01:00"), 1L, 5.0))
      q.processAllAvailable()
      val keys = spark.table("dedup_stream").groupBy("content_hash").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(keys == Map(1L -> 2L, 2L -> 1L, 99L -> 1L))
    } finally q.stop()
  }

  test("running stats in update mode (H6 analog)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Double, Double)]
    val scored = input.toDF().toDF("risk_score", "latency_ms")
    val q = runningStats(scored)
      .writeStream.format("memory").queryName("run_stats")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((0.9, 5.0), (0.1, 7.0), (0.7, 6.0))
      q.processAllAvailable()
      val r = spark.table("run_stats").collect()(0)
      assert(r.getAs[Long]("prediction_count") == 3)
      assert(r.getAs[Long]("fraud_count") == 2)
      assert(math.abs(r.getAs[Double]("avg_latency_ms") - 6.0) < 1e-12)
    } finally q.stop()
  }

  test("session windows close after the inactivity gap (event-time, watermarked)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val q = sessionCounts(events, gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:10:00"), 1L, 2.0),  // same session (10 min gap)
        (ts("2024-01-01 11:30:00"), 1L, 5.0),  // new session (80 min gap)
        (ts("2024-01-01 15:00:00"), 1L, 9.0))  // advances watermark far ahead
      q.processAllAvailable()
      input.addData((ts("2024-01-01 18:00:00"), 2L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions").orderBy("session_start").collect()
      assert(rows.length >= 2)
      assert(rows(0).getAs[Long]("n_events") == 2 &&
        rows(0).getAs[Double]("total_value") == 3.0)
      assert(rows(0).getTimestamp(1) == ts("2024-01-01 10:40:00")) // 10:10 + gap
      assert(rows(1).getAs[Long]("n_events") == 1 &&
        rows(1).getAs[Double]("total_value") == 5.0)
    } finally q.stop()
  }

  test("RiskScore column expressions run unchanged on a stream (batch/stream reuse)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, Int)]
    val txns = input.toDF().toDF("id", "amount", "hour")
    val scored = txns.select($"id",
      graft.serve.RiskScore.heuristicScore($"amount", $"hour",
        lit(false), lit(false)).as("score"))
      .withColumn("risk_level", graft.serve.RiskScore.riskLevel($"score"))
    val q = scored.writeStream.format("memory").queryName("stream_scores")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, 29.99, 14), (2L, 8500.0, 2))
      q.processAllAvailable()
      val rows = spark.table("stream_scores").orderBy("id").collect()
      assert(rows(0).getString(2) == "MINIMAL" || rows(0).getString(2) == "LOW")
      assert(rows(1).getString(2) == "CRITICAL")
      // identical expression on a batch frame gives identical scores
      val batch = Seq((1L, 29.99, 14), (2L, 8500.0, 2)).toDF("id", "amount", "hour")
        .select($"id", graft.serve.RiskScore.heuristicScore($"amount", $"hour",
          lit(false), lit(false)).as("score")).orderBy("id").collect()
      assert(batch(0).getDouble(1) == rows(0).getDouble(1))
      assert(batch(1).getDouble(1) == rows(1).getDouble(1))
    } finally q.stop()
  }

  test("mapGroupsWithState maintains per-user running profile across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = input.toDS()
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateProfile)
      .writeStream.format("memory").queryName("profiles")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Event(1L, ts("2024-01-01 10:00:00"), 10.0),
        Event(1L, ts("2024-01-01 10:01:00"), 20.0))
      q.processAllAvailable()
      input.addData(Event(1L, ts("2024-01-01 10:05:00"), 5.0))
      q.processAllAvailable()
      val r = spark.table("profiles").orderBy(desc("n")).collect()(0)
      assert(r.getAs[Long]("n") == 3 && r.getAs[Double]("total") == 35.0 &&
        r.getAs[Double]("maxValue") == 20.0)
    } finally q.stop()
  }

  test("file-source stream: parquet drops feed the same windowed aggregation") {
    // the production no-Kafka shape: a directory where batch jobs drop
    // parquet files, consumed incrementally as a stream — same
    // windowedCounts transform as the MemoryStream test
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    Seq((ts("2024-01-01 10:01:00"), "click", 1.0),
        (ts("2024-01-01 10:02:00"), "click", 2.0))
      .toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
    assert(stream.isStreaming)
    val q = windowedCounts(stream, watermarkDelay = "10 minutes", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("file_win")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // second file drop advances the watermark and closes the first window
      Seq((ts("2024-01-01 11:00:00"), "view", 5.0))
        .toDF("ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val closed = spark.table("file_win").collect()
      val clicks = closed.find(_.getString(1) == "click").get
      assert(clicks.getTimestamp(0) == ts("2024-01-01 10:00:00"))
      assert(clicks.getLong(2) == 2 && clicks.getDouble(3) == 3.0)
    } finally q.stop()
  }

  test("observe() metrics ride the scoring action itself (H6 alternative)") {
    val scored = Seq(0.9, 0.1, 0.7, 0.3).toDF("risk_score")
    val observed = observedScoring(scored)
    observed.collect() // metrics materialize with the action, no extra pass
    val m = observed.queryExecution.observedMetrics("score_stats")
    assert(m.getAs[Long]("prediction_count") == 4L)
    assert(m.getAs[Long]("fraud_count") == 2L) // 0.9 and 0.7 >= 0.6
    assert(math.abs(m.getAs[Double]("avg_score") - 0.5) < 1e-12)
  }
}
