package graft.serve

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ml.FraudModel
import graft.sources.SyntheticData

class ModelRegistrySpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = FraudModel.withClassWeight(
    SyntheticData.transactions(spark, 2000L), col("is_fraud"))
  private val cols = Seq("transaction_amt", "v1", "v2", "v3")

  test("register assigns monotone versions; load resolves latest by default") {
    val root = Files.createTempDirectory("graft_registry").toString
    val m1 = FraudModel.gbtPipeline(cols, "is_fraud", maxIter = 3).fit(data)
    val m2 = FraudModel.gbtPipeline(cols, "is_fraud", maxIter = 5).fit(data)
    assert(ModelRegistry.register(spark, root, "gbt", m1,
      Map("roc_auc" -> 0.9)) == 1L)
    assert(ModelRegistry.register(spark, root, "gbt", m2,
      Map("roc_auc" -> 0.95)) == 2L)
    // latest (v2, maxIter=5) predicts identically to the in-memory m2
    val loaded = ModelRegistry.load(spark, root, "gbt")
    val a = FraudModel.withProbability(m2.transform(data))
      .agg(sum($"p_fraud")).first().getDouble(0)
    val b = FraudModel.withProbability(loaded.transform(data))
      .agg(sum($"p_fraud")).first().getDouble(0)
    assert(a == b)
    // explicit version still reachable
    val v1 = ModelRegistry.load(spark, root, "gbt", version = 1L)
    assert(v1.stages.length == 2)
    val meta = ModelRegistry.list(spark, root)
    assert(meta.count() == 2 && meta.filter($"metric" === "roc_auc").count() == 2)
  }

  test("health reports status and model counts; empty registry is 'empty'") {
    val root = Files.createTempDirectory("graft_registry_h").toString
    val empty = ModelRegistry.health(spark, root).collect()(0)
    assert(empty.getString(0) == "empty" && empty.getLong(1) == 0L)
    val m = FraudModel.gbtPipeline(cols, "is_fraud", maxIter = 3).fit(data)
    ModelRegistry.register(spark, root, "a", m)
    ModelRegistry.register(spark, root, "a", m)
    ModelRegistry.register(spark, root, "b", m)
    val h = ModelRegistry.health(spark, root).collect()(0)
    assert(h.getString(0) == "healthy")
    assert(h.getLong(1) == 2L && h.getLong(2) == 3L)
    intercept[IllegalArgumentException] {
      ModelRegistry.load(spark, root, "missing")
    }
  }
}
