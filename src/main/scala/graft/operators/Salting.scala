package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4.3).
  *
  * AQE's skew handling covers sort-merge joins at runtime; salting is the
  * plan-level tool for *aggregations* over Zipf-ish keys (the reference's
  * `card1` user key) and for broadcast-infeasible skewed joins. Salts are
  * derived deterministically from a unique row id (xxhash64), not rand()
  * — results are reproducible under any partitioning.
  */
object Salting {

  private def saltOf(idCol: Column, nSalts: Int): Column =
    pmod(xxhash64(idCol), lit(nSalts.toLong))

  /** Two-phase salted aggregation for algebraic aggregates: phase 1
    * aggregates (key, salt) — spreading one hot key over `nSalts`
    * reducers — phase 2 merges per key. Supports count/sum/min/max
    * (the decomposable aggregates; avg = sum/count downstream). */
  def saltedAgg(df: DataFrame, key: String, idCol: String, valueCol: String,
                nSalts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", saltOf(col(idCol), nSalts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"),
        min(col(valueCol)).as("__min"), max(col(valueCol)).as("__max"))
    partial.groupBy(col(key)).agg(
      sum(col("__cnt")).as("n"),
      sum(col("__sum")).as("total"),
      min(col("__min")).as("min_value"),
      max(col("__max")).as("max_value"))
      .withColumn("avg_value", col("total") / col("n"))
  }

  /** Salted join for a skewed big side against a non-broadcastable-but-
    * moderate dim: the big side gets a deterministic salt, the small side
    * is replicated `nSalts` times, and the join key becomes (key, salt) —
    * one hot key now lands on `nSalts` tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 idCol: String, nSalts: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    // right/full outer would null-extend once PER SALT REPLICA of the
    // small side — silently corrupted semantics, so reject them
    val supported = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(supported.contains(joinType.toLowerCase.replace("_", "")) ||
        supported.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/semi/anti joins, not '$joinType' " +
        "(the replicated small side would emit one null-extended row per salt)")
    val saltedBig = big.withColumn("__salt", saltOf(col(idCol), nSalts))
    val replicated = small.withColumn("__salt",
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
