package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.eval.Metrics
import graft.operators.TimeSplit
import graft.sources.SyntheticData

/** End-to-end ML sanity (SURVEY.md §5.5): synthetic fraud data →
  * chronological split → class-weighted GBT → ROC-AUC well above 0.5
  * (the reference's own quality bar), leakage-safe scaler, ensembles.
  */
class FraudModelSpec extends SparkSpec {
  import spark.implicits._

  private val featureCols = Seq("transaction_amt", "v1", "v2", "v3")

  private lazy val data = SyntheticData.transactions(spark, 20000L)
    .withColumn("ts", timestamp_seconds(col("transaction_dt")))

  private lazy val (trainDf, testDf) = {
    val split = TimeSplit.assign(data, col("ts"), col("transaction_id"))
    (FraudModel.withClassWeight(split.filter($"split" === "train"), $"is_fraud"),
      split.filter($"split" === "test"))
  }

  test("synthetic generator: deterministic, ~3.5% fraud, amounts in range") {
    def probe() = SyntheticData.transactions(spark, 5000L).agg(
      avg($"is_fraud"), min($"transaction_amt"), max($"transaction_amt"),
      sum(pmod(xxhash64($"product_cd", $"card4"), lit(1000000007L)))).first()
    val a = probe(); val b = probe()
    assert(a == b) // bit-identical across runs
    assert(a.getDouble(0) > 0.02 && a.getDouble(0) < 0.05)
    assert(a.getDouble(1) >= 1.0 && a.getDouble(2) <= 10000.0)
  }

  test("GBT with class weights reaches AUC well above 0.5 on held-out") {
    val model = FraudModel.gbtPipeline(featureCols, "is_fraud", maxIter = 10)
      .fit(trainDf)
    val scored = FraudModel.withProbability(model.transform(testDf))
    val auc = Metrics.rocAuc(scored, $"is_fraud", $"p_fraud")
      .first().getDouble(0)
    assert(auc > 0.8, s"AUC $auc") // v1/v2/v3 carry strong signal
  }

  test("feature importance sums to ~1 and ranks signal features") {
    val model = FraudModel.gbtPipeline(featureCols, "is_fraud", maxIter = 10)
      .fit(trainDf)
    val imp = FraudModel.featureImportance(model, featureCols)
    assert(math.abs(imp.map(_._2).sum - 1.0) < 1e-6)
    assert(imp.head._1 != "transaction_amt" || imp.head._2 > 0.1)
  }

  test("scaler fit on train only produces ~zero-mean features on train") {
    val scaler = FraudModel.scalerPipeline(featureCols).fit(trainDf)
    val m = scaler.transform(trainDf)
      .select(avg(element_at(
        org.apache.spark.ml.functions.vector_to_array($"features"), 1)))
      .first().getDouble(0)
    assert(math.abs(m) < 1e-8)
  }

  test("stacking and weighted ensembles combine base predictions") {
    val model = FraudModel.gbtPipeline(featureCols, "is_fraud", maxIter = 5)
      .fit(trainDf)
    val scoredTrain = FraudModel.withProbability(model.transform(trainDf))
      .withColumn("heuristic", least(lit(1.0), $"transaction_amt" / 1000.0))
    val (_, weights) = FraudModel.stackingEnsemble(
      scoredTrain, Seq("p_fraud", "heuristic"), "is_fraud")
    assert(weights.size == 2)
    val blended = scoredTrain.select(
      FraudModel.weightedEnsemble(Seq(($"p_fraud", 0.7), ($"heuristic", 0.3))).as("b"))
      .agg(min($"b"), max($"b")).first()
    assert(blended.getDouble(0) >= 0.0 && blended.getDouble(1) <= 1.0)
  }

  test("class-weight modes match hand-computed reference weights") {
    // 8 negatives + 2 positives (reference helpers.py:151-181 semantics)
    val df = (Seq.fill(8)(0) ++ Seq.fill(2)(1)).toDF("y")
    def w(mode: String): (Double, Double) = {
      val r = FraudModel.withClassWeight(df, $"y", mode = mode)
        .groupBy($"y").agg(first($"class_weight")).collect()
        .map(x => x.getInt(0) -> x.getDouble(1)).toMap
      (r(1), r(0))
    }
    assert(w("pos") == ((4.0, 1.0)))                       // (1-p)/p = 8/2
    assert(w("balanced") == ((10.0 / 4.0, 10.0 / 16.0)))   // n/(2·count)
    assert(w("sqrt") == ((math.sqrt(5.0), math.sqrt(1.25)))) // sqrt(n/count)
    intercept[IllegalArgumentException] {
      FraudModel.withClassWeight(df, $"y", mode = "nope")
    }
  }

  test("early stopping halts boosting before maxIter without hurting AUC") {
    val split = TimeSplit.assign(data, $"ts", $"transaction_id")
    val fitFrame = FraudModel.withClassWeight(
      split.filter($"split" =!= "test").withColumn("is_val", $"split" === "val"),
      $"is_fraud")
    val es = FraudModel.gbtPipeline(featureCols, "is_fraud", maxIter = 30,
      validationIndicatorCol = Some("is_val")).fit(fitFrame)
    val nTrees = es.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.GBTClassificationModel]
      .getNumTrees
    assert(nTrees < 30, s"expected early stop, trained $nTrees trees")
    val auc = Metrics.rocAuc(
      FraudModel.withProbability(es.transform(testDf)), $"is_fraud", $"p_fraud")
      .first().getDouble(0)
    assert(auc > 0.8, s"early-stopped AUC $auc") // same bar as the full fit
  }

  test("thresholded predictions are 0/1 and monotone in tau") {
    val model = FraudModel.gbtPipeline(featureCols, "is_fraud", maxIter = 5)
      .fit(trainDf)
    val scored = FraudModel.withProbability(model.transform(testDf))
    val n1 = scored.filter(FraudModel.thresholded($"p_fraud", 0.3) === 1).count()
    val n2 = scored.filter(FraudModel.thresholded($"p_fraud", 0.7) === 1).count()
    assert(n1 >= n2)
  }
}
