package graft.serve

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden tests for the heuristic scorer — the four dashboard presets
  * from the reference (`streamlit_app.py:308-313`, USER_GUIDE): the
  * heuristic path is a pure function of inputs, so scores/buckets/
  * reasons are exactly reproducible.
  */
class RiskScoreSpec extends SparkSpec {
  import spark.implicits._

  private def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-0.003 * (x - 500.0)))

  // (amount, hour, deviceMissing, riskyProduct)
  private val presets = Seq(
    ("normal", 29.99, 14, false, false),
    ("medium", 1200.0, 14, false, false),
    ("suspicious", 8500.0, 2, true, false),
    ("high_risk", 15000.0, 3, true, true)
  )

  test("heuristic scores match hand-computed sigmoid + bumps, clipped") {
    val df = presets.toDF("name", "amount", "hour", "dev_missing", "risky")
    val out = df.select($"name", RiskScore.heuristicScore($"amount", $"hour",
      $"dev_missing", $"risky").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("normal") - sigmoid(29.99)) < 1e-12)
    assert(math.abs(out("medium") - (sigmoid(1200.0) + 0.08)) < 1e-12)
    assert(math.abs(out("suspicious") -
      math.min(1.0, sigmoid(8500.0) + 0.15 + 0.05 + 0.07)) < 1e-12)
    assert(out("high_risk") == 1.0) // capped
  }

  test("risk buckets and fraud flag at documented thresholds") {
    val df = Seq(0.1, 0.2, 0.45, 0.6, 0.95).toDF("s")
    val out = df.select(RiskScore.riskLevel($"s"), RiskScore.isFraud($"s")).collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("MINIMAL", "LOW", "MEDIUM", "HIGH", "CRITICAL"))
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 0, 0, 1, 1))
  }

  test("blend = 0.4·model + 0.6·heuristic, clipped to [0,1]") {
    val df = Seq((0.5, 0.5), (1.0, 1.0), (0.0, 0.0)).toDF("m", "h")
    val out = df.select(RiskScore.blend($"m", $"h")).collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(0.5, 1.0, 0.0))
  }

  test("confidence = |score-0.5|*2") {
    val df = Seq(0.5, 1.0, 0.0, 0.75).toDF("s")
    val out = df.select(RiskScore.confidence($"s")).collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(0.0, 1.0, 1.0, 0.5))
  }

  test("reasons string lists triggered rules in order") {
    val df = Seq((8500.0, 2, true, false)).toDF("amount", "hour", "dev", "risky")
    val out = df.select(RiskScore.reasons($"amount", $"hour", $"dev", $"risky"))
      .collect()(0).getString(0)
    assert(out == "very_high_amount,missing_device,unusual_hour")
  }
}
