package graft.serve

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed serving-request record (SURVEY.md §1.1; FIXTURES.md §2) — the
  * engine-side shape of the reference's Pydantic `Transaction`
  * (`api/main.py:120-146`). Fixed schema → case class + product Encoder;
  * validation that the reference does in Pydantic (`gt=0`) becomes a
  * `validate` filter stage.
  */
final case class Transaction(
    transaction_id: String,
    user_id: String,
    transaction_amount: Double,
    merchant_id: String,
    product_code: String = "W",
    card_type: String = "visa",
    device_info: Option[String] = None,
    email_domain: Option[String] = None,
    transaction_timestamp: Timestamp)

object Transaction {

  /** Known product codes (`api/main.py:213`): the reference bumps risk
    * when product_code is OUTSIDE this set ("unusual product code"). */
  private[serve] val knownProducts = Seq("W", "H", "C", "S", "R")

  /** Validation stage (Pydantic-parity: amount must be positive). */
  def validate(ds: Dataset[Transaction]): Dataset[Transaction] =
    ds.filter((t: Transaction) => t.transaction_amount > 0)

  /** Set-oriented scoring of a typed request batch: the same RiskScore
    * Column expressions as the batch/stream paths (H1-H5). */
  def score(ds: Dataset[Transaction]): DataFrame = {
    val amt = col("transaction_amount")
    val h = hour(col("transaction_timestamp"))
    val devMissing = col("device_info").isNull
    val unusual = !col("product_code").isInCollection(knownProducts)
    val s = RiskScore.heuristicScore(amt, h, devMissing, unusual)
    ds.toDF().select(
      col("transaction_id"),
      round(s * 1e6) / 1e6 as "risk_score",
      RiskScore.riskLevel(s).as("risk_level"),
      RiskScore.isFraud(s).as("is_fraud"),
      (round(RiskScore.confidence(s) * 1e6) / 1e6).as("confidence"),
      RiskScore.reasons(amt, h, devMissing, unusual).as("reasons"))
  }

  /** Driver-local single-request scoring (the reference's ~5-10 ms
    * request/response path): one-row local relation, no shuffle. */
  def scoreOne(spark: SparkSession, t: Transaction): Map[String, Any] = {
    import spark.implicits._
    val row = score(validate(Seq(t).toDS())).collect().headOption
      .getOrElse(throw new IllegalArgumentException("invalid transaction"))
    row.schema.fieldNames.zip(row.toSeq).toMap
  }
}
