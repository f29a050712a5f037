package graft

import graft.sources.Tables

/** SQL front-end surface: the ANSI-portable subset of the oracle corpus
  * (the exact SQL strings DuckDB validates against) runs verbatim through
  * `spark.sql` over registered temp views, and must produce results
  * identical to the DataFrame-API forms — same engine, two front-ends.
  * Excluded queries use DuckDB-only syntax (epoch_us, isodow, ASOF JOIN,
  * list_* / regexp_split_to_array lambdas).
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val portable = Seq(
    "q01_pricing_summary", "q02_filter_project", "q03_topk_users",
    "q04_event_histogram", "q05_describe_by_type", "q06_null_counts",
    "q07_distinct_per_group", "q08_join_left", "q09_join_semi",
    "q10_join_anti", "q11_join_multiway", "q12_set_ops",
    "q17_approx_distinct", "q19_rollup", "q20_cum_features",
    "q22_pct_rank_pandas", "q25_sliding_window", "q26_time_split",
    "q27_sequences", "q28_rank_suite", "q29_two_key_window",
    "q32_risk_score", "q34_onehot", "q35_impute", "q36_lookback_literal",
    "q38_onehot_rows", "q47_recall_floor", "q61_dup_groups", "q68_unpivot",
    "q78_stream_agg",
    "q88_stream_dedup", "q89_stream_state",
    // round 14: the sequence-serving and ANN-reload oracles are
    // dual-dialect by construction (driver-compared flags are literal
    // TRUE; the discrete grouping/count surface is plain SQL) — running
    // them here proves it, and exercises the HTTP/reload builders once
    // more against their own SQL twins
    "q142_http_sequence", "q143_ann_reload",
    // round 14: the leaderboard oracle is generated SQL (lbBlock) —
    // proving it dual-dialect guards the generator, not just one query
    "q144_model_leaderboard",
    // round 14: literal-flag row (q145) and the q32 score chain folded
    // to the global stats row (q146) — both plain ANSI
    "q145_stacking_scaled", "q146_stream_running_stats",
    "q147_config_dtype", "q148_ann_append",
    // round 14: the PCA-ANN oracle (exact counts + machinery flags) is
    // plain ANSI — running it here proves the dual dialect and
    // exercises the full fit→project→rerank builder once more
    "q157_pca_ann",
    // round 16: the HTTP-ANN oracle (count inventory + literal flags)
    // is plain ANSI — running it exercises the register→serve→compare
    // builder once more against its own twin
    "q162_ann_http")
  // q75/q76 excluded: DuckDB GROUPING(a, b) is Spark grouping_id (arity)
  // q77/q79 excluded: DuckDB ASOF JOIN / epoch_us
  // q81-q87 excluded: list_transform/unnest/'0x' UBIGINT casts/'g' flag
  // q64 excluded: its max_date surfaces as TIMESTAMP_NTZ through the
  // parquet view but TIMESTAMP through the explicit CSV schema — equal
  // values, different temporal classes (same class of note as q46)
  // q46 excluded: Spark types the oracle's `count * 1000.0` arithmetic
  // as DECIMAL under ANSI where DuckDB/DataFrame produce DOUBLE — values
  // agree, row types don't

  test("oracle SQL corpus runs via spark.sql, identical to the DataFrame forms") {
    Tables.registerViews(spark, dir)
    portable.foreach { name =>
      val viaSql = SparkEntry.oracleSql(name)
      val sqlRows = spark.sql(viaSql).collect().toSeq
      val apiRows = SparkEntry.queries(name)(spark, dir).collect().toSeq
      // q10 (anti join) is legitimately empty at this SF; equality still
      // asserts both paths agree on emptiness
      assert(sqlRows == apiRows,
        s"$name: spark.sql and DataFrame results differ " +
          s"(sql=${sqlRows.take(2)} api=${apiRows.take(2)})")
    }
    info(s"${portable.size} oracle queries verified through spark.sql")
  }
}
