package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

object Util {
  /** A registered query: (session, sfDir) => result DataFrame. */
  type Q = (SparkSession, String) => DataFrame

  /** Cross-engine deterministic quantization to `digits` decimals:
    * round(x·10ᵈ)/10ᵈ as plain double ops. Unlike decimal-string rounding
    * (Spark's round(col, d)), this agrees bit-for-bit with DuckDB's
    * round(x·10ᵈ)/10ᵈ because both sides see the identical double y=x·10ᵈ
    * and integer-round it with the same half-away-from-zero rule at
    * representable halves. Used on every float output in the oracle
    * queries.
    *
    * The trailing `+ 0.0` canonicalizes IEEE negative zero (−0.0 + 0.0 =
    * +0.0; identity for every other double): DuckDB's round preserves the
    * sign of −0.0 (e.g. round(cos(3π/2)·1e6)/1e6) while Spark's BigDecimal
    * round cannot represent it, so without normalization on BOTH engines a
    * bit-exact hash compare fails on values that are numerically equal.
    * The oracle SQL twin appends `+ 0.0` after each round(...)/f. */
  def qz(c: Column, digits: Int): Column = {
    import org.apache.spark.sql.functions.{lit, round}
    val f = math.pow(10, digits)
    round(c * f, 0) / f + lit(0.0)
  }

  /** Association-free money-sum gate: quantize each term to `digits`
    * decimals AS A LONG (round(x·10ᵈ) — exact for |x·10ᵈ| < 2⁵³), sum
    * the longs (exact, order-independent), divide back to a double.
    * A plain double sum(x) of n large terms carries ~n·ulp(total) of
    * engine-specific association error; once that exceeds half the
    * rounding step of a qz gate the cross-engine hash is a coin flip
    * (the round-9 q119 red row: sum ≈ 2×10⁹ over 60 K terms ≈ 0.03
    * error vs a 0.005 step). The long sum has ZERO association error,
    * so both engines derive the identical double at any scale where
    * the scaled total fits 2⁶³ (sf5 money totals ≈ 2.6×10¹⁵ « 2⁶³).
    * DuckDB twin: sum(CAST(round(x*10ᵈ) AS BIGINT)) / 10ᵈ.0 + 0.0. */
  def exactSum(c: Column, digits: Int): Column = {
    import org.apache.spark.sql.functions.{lit, round, sum}
    val f = math.pow(10, digits)
    sum(round(c * f, 0).cast("long")) / f + lit(0.0)
  }

  /** Append derived (name, expr) pairs in ONE select — avoids the
    * chained-withColumn analysis blowup on wide schemas (SURVEY.md §4.1). */
  def addCols(df: DataFrame, feats: Seq[(String, Column)]): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(df.columns.map(col).toSeq ++ feats.map { case (n, c) => c.as(n) }: _*)
  }
}
