package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.BehaviorWindows
import graft.queries.{CoreQueries, CurationQueries, EmbeddingQueries, EvalQueries, FeatureQueries, MlQueries, PipelineQueries, StreamingQueries, TextQueries, WindowQueries, Util}
import graft.serve.RiskScore
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized by operator family (SURVEY.md §2):
  *  - CoreQueries    q01-q14: scans, filters, aggs, joins, set ops, JSON
  *  - WindowQueries  q20-q26: the window-function feature engine
  *  - FeatureQueries q30-q32: scalar functions + heuristic risk scoring
  *  - EvalQueries    q40-q44: evaluation metrics as set-oriented queries
  */
object SparkEntry {

  /** Flagship: full behavioral-feature + risk-scoring pipeline over the
    * events stream — per-user expanding stats, inter-arrival velocity,
    * heuristic score, risk bucket. One shuffle (user_id) end to end. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val c = BehaviorWindows.Cols()
    val feats = BehaviorWindows.cumulativeFeatures(c) ++ BehaviorWindows.lagFeatures(c)
    val featured = Util.addCols(Tables.events(spark, dir), feats)
    val amt = col("value") * 20.0
    val heuristic = RiskScore.heuristicScore(
      amt, hour(col("ts")),
      col("event_type") === "error", col("event_type") === "signup")
    featured
      .withColumn("risk_score", RiskScore.blend(least(lit(1.0), amt / 10000.0), heuristic))
      .withColumn("risk_level", RiskScore.riskLevel(col("risk_score")))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ WindowQueries.queries ++
      FeatureQueries.queries ++ EvalQueries.queries ++
      TextQueries.queries ++ EmbeddingQueries.queries ++ MlQueries.queries ++
      PipelineQueries.queries ++ StreamingQueries.queries ++
      CurationQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ WindowQueries.oracle ++
      FeatureQueries.oracle ++ EvalQueries.oracle ++
      TextQueries.oracle ++ EmbeddingQueries.oracle ++ MlQueries.oracle ++
      PipelineQueries.oracle ++ StreamingQueries.oracle ++
      CurationQueries.oracle
}
