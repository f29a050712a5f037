package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.eval.Comparison
import graft.functions.{AmountFeatures, TimeFeatures}
import graft.ml.FraudModel
import graft.operators.{BehaviorWindows, TargetEncoding, TimeSplit}
import graft.queries.Util.addCols
import graft.sources.{Io, Profiler, SyntheticData}

/** End-to-end training orchestration (SURVEY.md §2.9 M11) — the engine's
  * equivalent of the reference's `train_pipeline.py` 10-step script:
  * load → profile → features (temporal, amount, behavior windows, target
  * encoding fit on train only) → chronological split → class-weighted GBT
  * ×3 variants (the reference's three engines) → stacking LR meta-model
  * fit on val predictions → leaderboard → persist models + importance +
  * stacked weights.
  *
  * One lazy plan from scan to features; actions happen only at fit/write.
  * Usage: runMain graft.TrainPipeline [outDir] [nRows]
  */
object TrainPipeline {

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/graft_train"
    val n = if (args.length > 1) args(1).toLong else 50000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, outDir, n)
    spark.stop()
  }

  def run(spark: SparkSession, outDir: String, n: Long): Unit = {
    // 1-2. load + profile
    val raw = SyntheticData.transactions(spark, n)
      .withColumn("ts", timestamp_seconds(col("transaction_dt")))
    Profiler.summary(raw.select("transaction_id", "transaction_amt",
      "p_emaildomain", "device_info")).show(truncate = false)

    // 3. split FIRST (chronological), so every fitted stage sees train only
    val split = TimeSplit.assign(raw, col("ts"), col("transaction_id"))

    // 4. features: one select per family (no withColumn chains)
    val c = BehaviorWindows.Cols("card1", "ts", "transaction_amt", "transaction_id")
    def featurize(df: DataFrame): DataFrame = addCols(addCols(addCols(df,
      TimeFeatures.all(col("ts"))),
      AmountFeatures.all(col("transaction_amt"))),
      BehaviorWindows.cumulativeFeatures(c) ++ BehaviorWindows.lagFeatures(c))

    val trainRaw = split.filter(col("split") === "train")
    val enc = TargetEncoding.fit(trainRaw, "card2",
      col("is_fraud").cast("double"), smoothing = 50.0)
    val featured = TargetEncoding.transform(featurize(split), enc, "card2", 0.035)
      .na.fill(-999.0)

    // card2_enc stays OUT of the model features: the synthetic generator
    // gives merchants no fraud signal, so the 1000-cardinality encoding is
    // pure label noise — measured cost ~17 AUC points on the held-out
    // split even with smoothing. The encoding capability itself is
    // exercised (computed + joined) and oracle-tested in q13.
    val featureCols = Seq("transaction_amt", "v1", "v2", "v3",
      "hour", "dow", "is_weekend", "is_night", "log_amt", "amt_bin",
      "prior_count", "cum_mean", "amt_deviation", "time_diff",
      "spending_rate")

    // Early stopping (the reference's valid_sets=[val] +
    // early_stopping_rounds, `lightgbm_model.py:96-110`,
    // `config/config.yaml:43`) and the stacking fold must be DISJOINT:
    // the val rows that pick each base model's tree count are
    // optimistically biased, so fitting the meta-LR on them would
    // overweight exactly the noise the bases already optimized against.
    // Carve val deterministically in half by row-key hash — es-half
    // flags early stopping inside the fit frame, stack-half feeds the
    // meta-model. (The reference stacks on TRAIN preds, ensemble.py:107,
    // which is in-fold for the bases; both halves here are out-of-fold.)
    val isEsHalf = graft.operators.Sampling.keepRow(
      col("transaction_id"), 0.5, "esfold")
    val trainOnly = featured.filter(col("split") === "train")
    val train = FraudModel.withClassWeight(
      featured.filter(col("split") =!= "test")
        .filter(col("split") === "train" || isEsHalf)
        .withColumn("is_val", col("split") === "val"), col("is_fraud"),
      // scale_pos_weight stays a pure function of TRAIN labels
      // (`lightgbm_model.py:81-84`), not of the early-stopping holdout
      statsOn = Some(trainOnly))
    val va = featured.filter(col("split") === "val" && !isEsHalf)
    val test = featured.filter(col("split") === "test")

    // 5. three GBT variants — the reference trains three engines
    // (lightgbm / xgboost / catboost, `src/models/ensemble.py:39-133`);
    // on Spark they are hyperparameter variants of one GBT capability,
    // each early-stopped on the val split
    def variant(maxDepth: Int) = FraudModel.gbtPipeline(featureCols, "is_fraud",
      maxIter = 15, maxDepth = maxDepth,
      validationIndicatorCol = Some("is_val")).fit(train)
    val variants = Seq(
      "gbt_shallow" -> variant(4),
      "gbt_mid" -> variant(5),
      "gbt_deep" -> variant(6))

    def preds(m: PipelineModel, name: String, df: DataFrame): DataFrame =
      FraudModel.withProbability(m.transform(df), s"p_$name")
        .select(col("transaction_id"), col(s"p_$name"))
    def predMatrix(df: DataFrame): DataFrame =
      variants.foldLeft(df.select("transaction_id", "is_fraud")) {
        case (acc, (name, m)) => acc.join(preds(m, name, df), "transaction_id")
      }
    val predCols = variants.map { case (name, _) => s"p_$name" }

    // 6. stacking meta-model (M7) fit on the VAL split's base predictions
    // — out-of-training-fold, the reference's stacking discipline
    val (stackModel, stackWeights) = FraudModel.stackingEnsemble(
      FraudModel.withClassWeight(predMatrix(va), col("is_fraud")),
      predCols, "is_fraud")

    // 7. leaderboard over the TEST split: three base engines + the stack
    def score(m: PipelineModel) = FraudModel.withProbability(m.transform(test))
    val stackScored = FraudModel.withProbability(
      stackModel.transform(predMatrix(test)))
    // materialize the (4-row) leaderboard ONCE — it re-runs every model
    // transform + metric suite per action otherwise
    val board = Comparison.leaderboard(
      variants.map { case (name, m) => name -> score(m) } :+
        ("stacked" -> stackScored),
      col("is_fraud"), col("p_fraud")).cache()
    board.show(truncate = false)
    val aucs = board.select("model", "roc_auc").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

    // 8. persist models + importance + leaderboard + stacked weights
    // (S5 artifact sink); "best" = the top-AUC BASE engine per the
    // leaderboard (the stack is persisted separately)
    // (auc, name) max: AUC ties (identical test rankings) break on the
    // name, so the choice is deterministic and spec-reproducible
    val bestName = variants.map(_._1).maxBy(n => (aucs(n), n))
    val bestModel = variants.toMap.apply(bestName)
    bestModel.write.overwrite().save(s"$outDir/model_$bestName")
    stackModel.write.overwrite().save(s"$outDir/model_stacked")
    import spark.implicits._
    Io.writeParquet(
      FraudModel.featureImportance(bestModel, featureCols).toDF("feature", "importance"),
      s"$outDir/feature_importance")
    Io.writeParquet(board, s"$outDir/leaderboard")
    Io.writeParquet(stackWeights.toDF("model", "weight"), s"$outDir/stacked_weights")

    // 9. registry (H7): versioned artifacts + health probe
    graft.serve.ModelRegistry.register(spark, s"$outDir/registry", bestName,
      bestModel, Map("roc_auc" -> aucs(bestName)))
    graft.serve.ModelRegistry.register(spark, s"$outDir/registry", "stacked",
      stackModel, Map("roc_auc" -> aucs("stacked")))
    graft.serve.ModelRegistry.health(spark, s"$outDir/registry").show()
    board.unpersist(blocking = false)
    println(s"[train] artifacts written to $outDir")
  }
}
