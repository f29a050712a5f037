package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transaction generator (SURVEY.md §2.1 S3).
  *
  * Capability match for the reference's generator
  * (`src/data/loader.py:75-184`): seeded, exponential amounts with a
  * fraud-conditional shift, weighted categorical draws, fraud-signal
  * V-columns, injected nulls, sorted uniform event times.
  *
  * Scale design: `spark.range(n)` partitions the id space; every random
  * draw is a pure function of (id, salt) via xxhash64 — reproducible
  * independent of partitioning/parallelism (unlike rand(seed), which is
  * only fixed for a fixed partition layout), and embarrassingly parallel
  * at any n.
  */
object SyntheticData {

  /** uniform(0,1) from (id, salt): 53 usable mantissa bits of xxhash64. */
  private def u(salt: Int) =
    (shiftrightunsigned(xxhash64(col("id"), lit(salt)), 11).cast("double")
      / lit(9007199254740992.0)) // 2^53

  /** -ln(1-u)/λ ~ Exponential(rate λ) via inverse CDF. */
  private def expo(salt: Int, mean: Double) = -log(lit(1.0) - u(salt)) * mean

  /** Weighted categorical draw: cumulative-probability when-ladder. */
  private def weighted(salt: Int, items: Seq[(String, Double)]): Column = {
    val uu = u(salt)
    val cum = items.scanLeft(0.0)(_ + _._2).tail
    items.zip(cum).init.foldRight(lit(items.last._1): Column) {
      case (((v, _), c), acc) => when(uu < c, lit(v)).otherwise(acc)
    }
  }

  /** n synthetic transactions. Fraud rate ~3.5%; fraud amounts shifted
    * (Exp(200)+100 vs Exp(50)), clipped to [1, 10000]; ~n/5 users, ~n/20
    * merchants; nulls injected into email/device at ~10%. */
  def transactions(spark: SparkSession, n: Long, seed: Int = 42): DataFrame = {
    val base = spark.range(n).toDF("id")
    val isFraud = (u(seed + 1) < 0.035).cast("int")
    val legitAmt = expo(seed + 2, 50.0)
    val fraudAmt = expo(seed + 3, 200.0) + 100.0
    val amt = least(greatest(when(isFraud === 1, fraudAmt).otherwise(legitAmt),
      lit(1.0)), lit(10000.0))
    base.select(
      col("id").as("transaction_id"),
      // sorted uniform timestamps over ~1 year of seconds; double step so
      // n > 31.5M doesn't truncate the stride to 0 and collapse event time
      floor(col("id") * lit(31536000.0 / math.max(n, 1L))).cast("long")
        .as("transaction_dt"),
      isFraud.as("is_fraud"),
      (round(amt * 100) / 100).as("transaction_amt"),
      pmod(xxhash64(col("id"), lit(seed + 4)), lit(math.max(n / 5, 1L))).as("card1"),
      pmod(xxhash64(col("id"), lit(seed + 5)), lit(math.max(n / 20, 1L))).as("card2"),
      weighted(seed + 6, Seq("W" -> 0.6, "H" -> 0.15, "C" -> 0.15, "S" -> 0.05, "R" -> 0.05)).as("product_cd"),
      weighted(seed + 7, Seq("visa" -> 0.5, "mastercard" -> 0.3, "american express" -> 0.12, "discover" -> 0.08)).as("card4"),
      weighted(seed + 8, Seq("debit" -> 0.6, "credit" -> 0.4)).as("card6"),
      when(u(seed + 9) < 0.10, lit(null).cast("string"))
        .otherwise(weighted(seed + 10, Seq("gmail.com" -> 0.4, "yahoo.com" -> 0.25,
          "hotmail.com" -> 0.2, "outlook.com" -> 0.15))).as("p_emaildomain"),
      when(u(seed + 11) < 0.10, lit(null).cast("string"))
        .otherwise(weighted(seed + 12, Seq("Windows" -> 0.4, "iOS Device" -> 0.3,
          "MacOS" -> 0.15, "Android" -> 0.15))).as("device_info"),
      // fraud-signal numeric columns: class-conditional means + noise
      (randnFrom(seed + 13) + when(isFraud === 1, 2.0).otherwise(0.0)).as("v1"),
      (randnFrom(seed + 14) + when(isFraud === 1, -1.5).otherwise(0.0)).as("v2"),
      (randnFrom(seed + 15) * 2.0 + when(isFraud === 1, 1.0).otherwise(0.0)).as("v3")
    )
  }

  /** standard normal from two uniforms (Box–Muller), deterministic. */
  private def randnFrom(salt: Int) = {
    val u1 = u(salt)
    val u2 = u(salt + 1000)
    sqrt(lit(-2.0) * log(when(u1 <= 0, 1e-12).otherwise(u1))) *
      cos(lit(2.0 * math.Pi) * u2)
  }
}
