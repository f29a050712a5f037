package graft.eval

import java.nio.file.Files
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._
import graft.{SparkSpec, TrainPipeline}
import graft.ml.FraudModel
import graft.sources.SyntheticData

class ComparisonPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("leaderboard: one row per model, sorted by ROC-AUC desc (E8)") {
    val good = Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)).toDF("y", "p")
    val bad = good.withColumn("p", lit(1.0) - $"p")
    val board = Comparison.leaderboard(
      Seq("good" -> good, "bad" -> bad), $"y", $"p").collect()
    assert(board.map(_.getString(0)).toSeq == Seq("good", "bad"))
    assert(board(0).getAs[Double]("roc_auc") == 1.0)
    assert(board(1).getAs[Double]("roc_auc") == 0.0)
  }

  test("model artifact save/load roundtrip predicts identically (S5)") {
    val dir = Files.createTempDirectory("graft_model").toString
    val data = FraudModel.withClassWeight(
      SyntheticData.transactions(spark, 3000L), col("is_fraud"))
    val cols = Seq("transaction_amt", "v1", "v2", "v3")
    val model = FraudModel.gbtPipeline(cols, "is_fraud", maxIter = 5).fit(data)
    model.write.overwrite().save(s"$dir/m")
    val loaded = PipelineModel.load(s"$dir/m")
    val a = FraudModel.withProbability(model.transform(data))
      .agg(sum($"p_fraud")).first().getDouble(0)
    val b = FraudModel.withProbability(loaded.transform(data))
      .agg(sum($"p_fraud")).first().getDouble(0)
    assert(a == b)
  }

  test("TrainPipeline end-to-end: 3 TRUE engines + stack, family-aware registry (M11)") {
    val dir = Files.createTempDirectory("graft_train").toString
    TrainPipeline.run(spark, dir, 4000L)
    val board = spark.read.parquet(s"$dir/leaderboard")
    assert(board.count() == 4) // gbt_mllib, leafboost_lgb, leafboost_xgb, stacked
    assert(board.filter($"model".isin("gbt_mllib", "leafboost_lgb",
      "leafboost_xgb")).count() == 3)
    assert(board.filter($"model" === "stacked").count() == 1)
    assert(board.agg(max($"roc_auc")).first().getDouble(0) > 0.8)
    // every engine must actually learn, not just the best one
    assert(board.agg(min($"roc_auc")).first().getDouble(0) > 0.7)
    val imp = spark.read.parquet(s"$dir/feature_importance")
    assert(imp.count() > 5)
    val w = spark.read.parquet(s"$dir/stacked_weights")
    assert(w.count() == 3) // one learned weight per base engine
    // H7/S5: all four models registered, each under its family's format
    val reg = s"$dir/registry"
    val h = graft.serve.ModelRegistry.health(spark, reg).collect()(0)
    assert(h.getString(0) == "healthy" && h.getLong(1) == 4L)
    assert(graft.serve.ModelRegistry.kindOf(spark, reg, "gbt_mllib") == "pipeline")
    assert(graft.serve.ModelRegistry.kindOf(spark, reg, "stacked") == "pipeline")
    assert(graft.serve.ModelRegistry.kindOf(spark, reg, "leafboost_lgb") == "leafboost")
    assert(graft.serve.ModelRegistry.kindOf(spark, reg, "leafboost_xgb") == "leafboost")
    assert(graft.serve.ModelRegistry.load(spark, reg, "stacked").stages.length == 2)
    // the XGBoost-semantics engine respected its depth cap; the
    // LightGBM-semantics engine is free to grow unbalanced
    val xgb = graft.serve.ModelRegistry.loadLeafBoost(spark, reg, "leafboost_xgb")
    def depthOf(t: graft.ml.LeafBoost.Tree): Int = {
      def go(i: Int): Int =
        if (t.nodes(i).isLeaf) 1
        else 1 + math.max(go(t.nodes(i).left), go(t.nodes(i).right))
      go(0)
    }
    assert(xgb.trees.forall(t => depthOf(t) <= 6)) // maxDepth 5 ⇒ ≤ 6 levels of nodes
  }
}
