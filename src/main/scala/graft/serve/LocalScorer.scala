package graft.serve

/** Driver-local request/response scorer (the reference's ~5-10 ms
  * in-process path, `api/main.py:199-221`): the SAME arithmetic as the
  * RiskScore Column expressions, evaluated as plain Scala — no Spark
  * plan, no job, microsecond latency. TransactionSpec asserts bit-
  * equality against the Spark path so the two can never drift.
  */
object LocalScorer {

  final case class Scored(riskScore: Double, riskLevel: String,
                          isFraud: Boolean, confidence: Double,
                          reasons: Seq[String])

  private val riskyProducts = Set("C", "R")

  def score(t: Transaction): Scored = {
    require(t.transaction_amount > 0, "transaction_amount must be > 0")
    val amt = t.transaction_amount
    val hour = t.transaction_timestamp.toLocalDateTime.getHour
    val devMissing = t.device_info.isEmpty
    val risky = riskyProducts.contains(t.product_code)
    // identical op order to RiskScore.heuristicScore
    val base = 1.0 / (1.0 + math.exp(-0.003 * (amt - 500.0)))
    val b1 = if (amt > 5000) 0.15 else 0.0
    val b2 = if (amt > 1000 && amt <= 5000) 0.08 else 0.0
    val b3 = if (devMissing) 0.05 else 0.0
    val b4 = if (risky) 0.05 else 0.0
    val b5 = if (hour < 5 || hour > 23) 0.07 else 0.0
    val s0 = base + b1 + b2 + b3 + b4 + b5
    val s = math.min(1.0, math.max(0.0, s0))
    val level =
      if (s < 0.2) "MINIMAL" else if (s < 0.4) "LOW"
      else if (s < 0.6) "MEDIUM" else if (s < 0.8) "HIGH" else "CRITICAL"
    val reasons = Seq(
      if (amt > 5000) Some("very_high_amount") else None,
      if (amt > 1000 && amt <= 5000) Some("high_amount") else None,
      if (devMissing) Some("missing_device") else None,
      if (risky) Some("risky_product") else None,
      if (hour < 5 || hour > 23) Some("unusual_hour") else None).flatten
    Scored(s, level, s >= 0.6, math.abs(s - 0.5) * 2, reasons)
  }
}
