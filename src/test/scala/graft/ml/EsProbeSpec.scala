package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TimeSplit
import graft.sources.SyntheticData

/** Probe: the early stop must come from the VALIDATION signal, not the
  * (global, size-based) TreeConfig threshold — the no-validation fit
  * must reach maxIter while the validated fit stops short. */
class EsProbeSpec extends SparkSpec {
  import spark.implicits._

  test("validation signal, not a size threshold, stops boosting") {
    val data = SyntheticData.transactions(spark, 20000L)
      .withColumn("ts", timestamp_seconds(col("transaction_dt")))
    val split = TimeSplit.assign(data, col("ts"), col("transaction_id"))
    val featureCols = Seq("transaction_amt", "v1", "v2", "v3")
    val fitFrame = FraudModel.withClassWeight(
      split.filter($"split" =!= "test").withColumn("is_val", $"split" === "val"),
      $"is_fraud")
    def nTrees(validation: Boolean): Int =
      FraudModel.gbtPipeline(featureCols, "is_fraud", maxIter = 12,
          validationIndicatorCol = if (validation) Some("is_val") else None)
        .fit(if (validation) fitFrame else fitFrame.filter(!$"is_val"))
        .stages.last
        .asInstanceOf[org.apache.spark.ml.classification.GBTClassificationModel]
        .getNumTrees
    val full = nTrees(validation = false)
    val es = nTrees(validation = true)
    info(s"no-validation trees = $full, early-stopped trees = $es")
    assert(full == 12, s"plain fit should reach maxIter, got $full")
    assert(es < 12, s"validated fit should stop early, got $es")
  }
}
