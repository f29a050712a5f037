package graft.serve

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.AmountFeatures

/** Heuristic risk scorer + bucketing (SURVEY.md §2.10 H1-H4).
  *
  * Capability match for the reference's serving scorer
  * (`api/main.py:199-221, 333-355`; duplicated `streamlit_app.py:166-246`):
  * sigmoid base on amount, additive rule bumps with reason strings, risk
  * bucketing at 0.2/0.4/0.6/0.8, fraud flag at ≥0.6, confidence
  * |score−0.5|·2. Entirely Column expressions — set-oriented batch scoring
  * is one `select` over any DataFrame (vs the reference's per-request
  * Python loop, `api/main.py:360-376`), and the same expressions serve a
  * single driver-local row for request/response latency.
  */
object RiskScore {

  /** Base score: sigmoid(0.003·(amount−500)) (`api/main.py:201`). */
  def baseScore(amount: Column): Column =
    AmountFeatures.sigmoid(amount, 0.003, 500.0)

  /** Heuristic score with the reference's SEQUENTIAL capped bumps
    * (`api/main.py:203-221`): each triggered rule adds its bump then caps
    * — min(·, 0.95) for very-high amount / missing device / unusual
    * product / unusual hour, min(·, 0.85) for the 1000<amt≤5000 elif
    * branch. The sigmoid base is in (0,1) and every cap ≤ 0.95, so the
    * score never exceeds 0.95 and no outer clip is needed.
    * `unusualProduct` = product_code NOT in the known set (W,H,C,S,R) —
    * the reference bumps on NON-membership (`api/main.py:213-216`). */
  def heuristicScore(amount: Column, hour: Column, deviceMissing: Column,
                     unusualProduct: Column): Column = {
    val base = baseScore(amount)
    val s1 = when(amount > 5000, least(base + 0.15, lit(0.95)))
      .when(amount > 1000, least(base + 0.08, lit(0.85)))
      .otherwise(base)
    val s2 = when(deviceMissing, least(s1 + 0.05, lit(0.95))).otherwise(s1)
    val s3 = when(unusualProduct, least(s2 + 0.05, lit(0.95))).otherwise(s2)
    when(hour < 5 || hour > 23, least(s3 + 0.07, lit(0.95))).otherwise(s3)
  }

  /** Blend 0.4·model + 0.6·heuristic, clipped (`api/main.py:272,284`). */
  def blend(model: Column, heuristic: Column): Column =
    least(lit(1.0), greatest(lit(0.0), model * 0.4 + heuristic * 0.6))

  /** Risk bucket at 0.2/0.4/0.6/0.8 (`api/main.py:333-342`). */
  def riskLevel(score: Column): Column =
    when(score < 0.2, "MINIMAL")
      .when(score < 0.4, "LOW")
      .when(score < 0.6, "MEDIUM")
      .when(score < 0.8, "HIGH")
      .otherwise("CRITICAL")

  def isFraud(score: Column): Column = (score >= 0.6).cast("int")

  /** Confidence = |score − 0.5|·2 (`api/main.py:355`). */
  def confidence(score: Column): Column = abs(score - 0.5) * 2

  /** Human-readable reasons as a comma-joined string (deterministic order,
    * mirrors the reference's append order; slugs for its f-strings). */
  def reasons(amount: Column, hour: Column, deviceMissing: Column,
              unusualProduct: Column): Column =
    concat_ws(",",
      when(amount > 5000, "very_high_amount"),
      when(amount > 1000 && amount <= 5000, "high_amount"),
      when(deviceMissing, "missing_device"),
      when(unusualProduct, "unusual_product"),
      when(hour < 5 || hour > 23, "unusual_hour"))

  /** THE canonical events→transaction scoring column mapping
    * (amount = value·20, hour of ts, device-missing ⇔ error,
    * unusual-product ⇔ signup, model = min(1, amount/10⁴)). One
    * definition — q32 (batch), q107 (streaming), q111 (drift monitor)
    * and the specs all score through these columns, so "batch ≡ stream
    * ≡ serving ≡ monitored" holds by construction instead of by four
    * hand-copied expression chains staying in sync. */
  object EventScore {
    def amount: Column = col("value") * 20.0
    def hourOfDay: Column = hour(col("ts"))
    def deviceMissing: Column = col("event_type") === "error"
    def unusualProduct: Column = col("event_type") === "signup"
    def heuristic: Column =
      heuristicScore(amount, hourOfDay, deviceMissing, unusualProduct)
    def model: Column = least(lit(1.0), amount / 10000.0)
    def blended: Column = blend(model, heuristic)
  }
}
