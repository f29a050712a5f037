package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType
import Util.{Q, qz}

/** Streaming queries with BATCH oracles (SURVEY.md §2.10 H6).
  *
  * The streaming engine's event-time semantics are spec-covered
  * (StreamingOpsSpec: watermarks, session windows, keyed state, dedup);
  * what a correctness gate can additionally pin is the STREAM ≡ BATCH
  * equivalence Structured Streaming promises: the same aggregation over
  * the same input must produce identical results whether it arrives as
  * a bounded table or as a file-source stream. q78 runs the real
  * streaming path (readStream → event-time tumbling windows → memory
  * sink, AvailableNow trigger) and the DuckDB oracle is the batch
  * date_trunc form — hash equality IS the equivalence proof.
  */
object StreamingQueries {

  private val sinkId = new AtomicInteger(0)

  def queries: Map[String, Q] = Map(
    // hourly event-time tumbling windows per event type, computed by the
    // streaming engine over a file-source stream of the events table.
    // Complete output mode: every window is in the sink when the
    // AvailableNow run terminates (append would withhold windows newer
    // than the final watermark — a trailing-window hole the oracle would
    // catch). Result size is bounded by the time span (hours/year x
    // event types), not the row count — safe to materialize at any SF.
    "q78_stream_agg" -> ((s, dir) => {
      // same ns->us normalization as Tables.events, but through the
      // streaming reader (schema must be given explicitly for streams)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
      // the harness table may be a bare file (driver layout) or a
      // directory of part files (Spark layout); a non-glob FILE path
      // trips the file-stream source's basePath-must-be-a-directory
      // inference, while a glob path skips that inference entirely and
      // matches both layouts
      val stream = s.readStream.schema(rawSchema)
        .parquet(s"$dir/events.parque[t]")
      val evs =
        if (rawSchema("ts").dataType == LongType)
          stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else stream
      val agg = evs
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
      val name = s"q78_sink_${sinkId.incrementAndGet()}"
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(name)
        .select(col("window_start"), col("event_type"), col("n"),
          qz(col("total_value"), 4).as("total_value"))
        .orderBy("window_start", "event_type")
      // materialize NOW, then drop the sink's temp view — returning the
      // sink table lazily would leak one registered view per invocation
      val rows = out.collect()
      s.catalog.dropTempView(name)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    }),

    // streaming exact dedup: the content-hash dropDuplicates path run by
    // the STREAMING engine over a file-source stream of documents plus
    // planted copies of every 20th doc (q61's planting — so the dedup
    // state provably discards something). Which arrival survives is
    // partition-order dependent, so the emitted surface is the
    // arrival-order-free one: the distinct content-hash set, which must
    // EQUAL DuckDB's batch DISTINCT md5(text) — the stream ≡ batch
    // equivalence proof for the dedup operator. Bounded state: one
    // 32-char hash per distinct text, no payload retained.
    "q88_stream_dedup" -> ((s, dir) => {
      val rawSchema = s.read.parquet(s"$dir/documents.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .parquet(s"$dir/documents.parque[t]")
      val withCopies = stream.unionByName(
        stream.filter(col("doc_id") % 20 === 0)
          .withColumn("doc_id", col("doc_id") + lit(100000000L)))
      val deduped = withCopies
        .select(md5(col("text")).as("content_hash"))
        .dropDuplicates("content_hash")
      val name = s"q88_sink_${sinkId.incrementAndGet()}"
      val q = deduped.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(name).orderBy("content_hash")
      val rows = out.collect()
      s.catalog.dropTempView(name)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    }),

    // custom keyed state through the real streaming engine:
    // mapGroupsWithState maintains per-user running count/sum/max across
    // micro-batches (the streaming analog of the batch expanding
    // windows W1-W5). Update mode emits a profile row per key per batch;
    // the FINAL profile per user (n is monotone — max_by(·, n)) must
    // equal the batch groupBy aggregates DuckDB computes. The sum is
    // qz(4)-quantized: state folds in arrival order, the oracle in scan
    // order — associativity slack is below 1e-4 at this value range.
    "q89_stream_state" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .parquet(s"$dir/events.parque[t]")
      val evs =
        (if (rawSchema("ts").dataType == LongType)
          stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else stream)
          .select(col("user_id"), col("ts"), col("value"))
          .as[graft.streaming.StreamingOps.Event]
      val profiles = evs.groupByKey(_.user_id)
        .mapGroupsWithState(
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(
          graft.streaming.StreamingOps.updateProfile)
      val name = s"q89_sink_${sinkId.incrementAndGet()}"
      val q = profiles.toDF().writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.table(name)
        .groupBy("user_id")
        .agg(max(col("n")).as("n"),
          qz(max_by(col("total"), col("n")), 4).as("total_value"),
          max_by(col("maxValue"), col("n")).as("max_value"))
        .orderBy("user_id")
      val rows = out.collect()
      s.catalog.dropTempView(name)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    })
  )

  def oracle: Map[String, String] = Map(
    // the batch twin: tumbling 1-hour event-time windows are exactly
    // date_trunc('hour') buckets (Spark's window() is epoch-aligned)
    "q78_stream_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | count(*) AS n,
        | round((sum(value)) * 10000.0) / 10000.0 + 0.0 AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // batch twin: planted copies add no new distinct hash, so the
    // deduped set is exactly the corpus's distinct content hashes
    "q88_stream_dedup" ->
      """SELECT DISTINCT md5(text) AS content_hash
        |FROM documents ORDER BY content_hash""".stripMargin,

    // batch twin of the keyed-state profile: expanding aggregates at
    // end-of-stream are plain per-key aggregates
    "q89_stream_state" ->
      """SELECT user_id, count(*) AS n,
        | round((sum(value)) * 10000.0) / 10000.0 + 0.0 AS total_value,
        | max(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
