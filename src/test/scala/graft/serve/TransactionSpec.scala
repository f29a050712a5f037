package graft.serve

import java.sql.Timestamp
import graft.SparkSpec

class TransactionSpec extends SparkSpec {
  import spark.implicits._

  private def txn(amount: Double, hour: Int, device: Option[String],
                  product: String) = Transaction(
    transaction_id = "t1", user_id = "u1", transaction_amount = amount,
    merchant_id = "m1", product_code = product, device_info = device,
    transaction_timestamp = Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00"))

  test("typed batch scoring: reference dashboard presets bucket correctly") {
    val batch = Seq(
      txn(29.99, 14, Some("Chrome"), "W"),    // Normal
      txn(1200.0, 14, Some("iOS"), "H"),      // Medium
      txn(8500.0, 2, None, "C"),              // Suspicious
      txn(15000.0, 3, None, "R"))             // High risk
      .toDS()
    val out = Transaction.score(Transaction.validate(batch))
      .orderBy("risk_score").collect()
    assert(out.head.getAs[String]("risk_level") == "LOW" ||
      out.head.getAs[String]("risk_level") == "MINIMAL")
    assert(out.last.getAs[String]("risk_level") == "CRITICAL")
    assert(out.last.getAs[Int]("is_fraud") == 1)
    assert(out.last.getAs[String]("reasons").contains("very_high_amount"))
  }

  test("validation rejects non-positive amounts (Pydantic gt=0 parity)") {
    val ds = Seq(txn(-5.0, 10, None, "W"), txn(10.0, 10, None, "W")).toDS()
    assert(Transaction.validate(ds).count() == 1)
  }

  test("LocalScorer is bit-equal to the Spark expression path") {
    val cases = Seq(
      txn(29.99, 14, Some("Chrome"), "W"),
      txn(1200.0, 14, Some("iOS"), "H"),
      txn(8500.0, 2, None, "C"),
      txn(15000.0, 3, None, "R"),
      txn(0.01, 0, None, "W"),
      txn(850.0, 12, Some("x"), "Z"), // unusual product code
      txn(5000.0, 23, Some("x"), "S"))
    val sparkScores = Transaction.score(cases.toDS())
      .collect().map(r => r.getAs[Double]("risk_score")).sorted
    val localScores = cases
      // mirror the query's 1e-6 quantization
      .map(t => math.round(LocalScorer.score(t).riskScore * 1e6) / 1e6)
      .sorted
    sparkScores.zip(localScores).foreach { case (a, b) => assert(a == b) }
  }

  test("LocalScorer hour is UTC-fixed, independent of the JVM default zone") {
    val prev = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("Asia/Tokyo"))
      // 03:00 UTC == 12:00 Tokyo: the unusual_hour bump must fire from the
      // UTC hour (the Spark twin runs hour() under session timeZone=UTC),
      // not from the JVM-local wall clock
      val t = Transaction(
        transaction_id = "t1", user_id = "u1", transaction_amount = 100.0,
        merchant_id = "m1", product_code = "W", device_info = Some("x"),
        transaction_timestamp = java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T03:00:00Z")))
      val local = LocalScorer.score(t)
      assert(local.reasons == Seq("unusual_hour"))
      val sparkRow = Transaction.score(Seq(t).toDS()).collect()(0)
      assert(math.round(local.riskScore * 1e6) / 1e6 ==
        sparkRow.getAs[Double]("risk_score"))
      assert(sparkRow.getAs[String]("reasons") == "unusual_hour")
    } finally java.util.TimeZone.setDefault(prev)
  }

  test("driver-local single-row scoring beats the reference's 5-10ms claim") {
    val t = txn(850.0, 23, None, "C")
    LocalScorer.score(t) // JIT warm-up
    val t0 = System.nanoTime()
    val n = 10000
    var i = 0
    var acc = 0.0
    while (i < n) { acc += LocalScorer.score(t).riskScore; i += 1 }
    val usPer = (System.nanoTime() - t0) / 1e3 / n
    info(f"single-request scoring: $usPer%.2f µs/req (acc=$acc%.1f)")
    assert(usPer < 1000.0) // well under the reference's 5-10 ms
    assert(LocalScorer.score(t).riskLevel == "CRITICAL" ||
      LocalScorer.score(t).riskLevel == "HIGH")
  }
}
