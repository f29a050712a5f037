package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model comparison leaderboard (SURVEY.md §2.11 E8).
  *
  * One metrics row per scored model (AUC, AP, point metrics at τ),
  * unioned and sorted by ROC-AUC descending — the reference's
  * `compare_models` table (`src/evaluation/metrics.py:203-237`).
  */
object Comparison {

  def metricsRow(name: String, scored: DataFrame, label: Column,
                 score: Column, tau: Double = 0.5): DataFrame = {
    val auc = Metrics.rocAuc(scored, label, score)
      .first().getDouble(0)
    val ap = Metrics.averagePrecision(scored, label, score)
      .first().getDouble(0)
    Metrics.confusionAt(scored, label, score, tau)
      .select(lit(name).as("model"), lit(auc).as("roc_auc"), lit(ap).as("pr_auc"),
        col("precision"), col("recall"), col("f1"), col("cost"))
  }

  /** Leaderboard over (name, scoredDf) pairs, best AUC first. */
  def leaderboard(models: Seq[(String, DataFrame)], label: Column,
                  score: Column, tau: Double = 0.5): DataFrame =
    models.map { case (n, df) => metricsRow(n, df, label, score, tau) }
      .reduce(_.unionByName(_))
      .orderBy(desc("roc_auc"))
}
