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

  def score(t: Transaction): Scored = {
    require(t.transaction_amount > 0, "transaction_amount must be > 0")
    val amt = t.transaction_amount
    // explicit UTC — the Spark twin runs hour() under
    // spark.sql.session.timeZone=UTC (set in every entry point), so the
    // local path must not depend on the JVM default zone
    val hour = t.transaction_timestamp.toInstant
      .atZone(java.time.ZoneOffset.UTC).getHour
    val devMissing = t.device_info.isEmpty
    val unusual = !Transaction.knownProducts.contains(t.product_code)
    // identical op order to RiskScore.heuristicScore: sequential bumps,
    // each capped (0.85 for the elif amount branch, 0.95 elsewhere)
    val base = 1.0 / (1.0 + math.exp(-0.003 * (amt - 500.0)))
    val s1 =
      if (amt > 5000) math.min(base + 0.15, 0.95)
      else if (amt > 1000) math.min(base + 0.08, 0.85)
      else base
    val s2 = if (devMissing) math.min(s1 + 0.05, 0.95) else s1
    val s3 = if (unusual) math.min(s2 + 0.05, 0.95) else s2
    val s = if (hour < 5 || hour > 23) math.min(s3 + 0.07, 0.95) else s3
    val level =
      if (s < 0.2) "MINIMAL" else if (s < 0.4) "LOW"
      else if (s < 0.6) "MEDIUM" else if (s < 0.8) "HIGH" else "CRITICAL"
    val reasons = Seq(
      if (amt > 5000) Some("very_high_amount") else None,
      if (amt > 1000 && amt <= 5000) Some("high_amount") else None,
      if (devMissing) Some("missing_device") else None,
      if (unusual) Some("unusual_product") else None,
      if (hour < 5 || hour > 23) Some("unusual_hour") else None).flatten
    Scored(s, level, s >= 0.6, math.abs(s - 0.5) * 2, reasons)
  }
}
