package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Per-entity behavioral window features (SURVEY.md §2.5 W1-W12).
  *
  * Capability match for the reference's user-behavior / velocity stages
  * (`src/features/engineer.py:66-141`): cumulative count/sum/mean/std/max/min,
  * deviation score, inter-arrival lag diff, first-event flag, velocity ratios.
  *
  * Scale design: ONE hash exchange on the partition key feeds every window
  * here — Spark's EnsureRequirements reuses the same Exchange+Sort for all
  * specs sharing (partitionBy, orderBy), so the whole family costs a single
  * shuffle (vs the reference's three full re-sorts, `engineer.py:72,:124`).
  * Order includes a unique tiebreaker column so results are deterministic
  * under ties in event time.
  */
object BehaviorWindows {

  /** Column bindings for a generic event stream: (entity, time, value, id).
    * Harness `events` = (user_id, ts, value, event_id); the reference's
    * transactions = (card1, TransactionDT, TransactionAmt, TransactionID). */
  final case class Cols(
      user: String = "user_id",
      ts: String = "ts",
      value: String = "value",
      id: String = "event_id")

  def ordered(c: Cols): WindowSpec =
    Window.partitionBy(col(c.user)).orderBy(col(c.ts), col(c.id))

  /** Inclusive expanding frame — pandas `expanding()` includes the current
    * row (load-bearing for parity, SURVEY.md §2.5). */
  def cumulative(c: Cols): WindowSpec =
    ordered(c).rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** W1-W6, W8, W12 as (name, expr) pairs for one `select` splat. */
  def cumulativeFeatures(c: Cols): Seq[(String, Column)] = {
    val w  = ordered(c)
    val wc = cumulative(c)
    val v  = col(c.value)
    val n  = row_number().over(w)
    val cumMean = avg(v).over(wc)
    val cumStd  = stddev_samp(v).over(wc) // null at n=1, matches pandas
    Seq(
      "prior_count" -> (n - 1),                       // W1 cumcount()
      "cum_sum"     -> sum(v).over(wc),               // W2
      "cum_mean"    -> cumMean,                       // W3
      "cum_std"     -> cumStd,                        // W4
      "cum_max"     -> max(v).over(wc),               // W5
      "cum_min"     -> min(v).over(wc),               // W5
      // W6 deviation score: (v − cum_mean)/(coalesce(cum_std,1)+1)
      "amt_deviation" -> ((v - cumMean) / (coalesce(cumStd, lit(1.0)) + 1)),
      "is_first"    -> (n === 1).cast("int"),         // W8
      // W12 velocity ratio: running sum / running count
      "amt_velocity" -> (sum(v).over(wc) / n)
    )
  }

  /** W7 + W11: inter-arrival seconds, value diff, spending rate and its
    * acceleration (reference `engineer.py:108-141`). */
  def lagFeatures(c: Cols): Seq[(String, Column)] = {
    val w = ordered(c)
    val tsSec = unix_micros(col(c.ts)).cast("double") / 1e6
    val timeDiff = coalesce(tsSec - lag(tsSec, 1).over(w), lit(0.0))
    // reference: replace(0→1) then +1 in the denominator (`engineer.py:138`)
    val rate = col(c.value) / (when(timeDiff === 0, 1.0).otherwise(timeDiff) + 1.0)
    Seq(
      "time_diff"     -> timeDiff,
      "value_diff"    -> coalesce(col(c.value) - lag(col(c.value), 1).over(w), lit(0.0)),
      "spending_rate" -> rate,
      "acceleration"  -> coalesce(rate - lag(rate, 1).over(w), lit(0.0))
    )
  }

  /** W10 with pandas `rank(pct=True)` parity: average-rank / group-size
    * (∈ (0,1]), NOT Spark's percent_rank (=(rank−1)/(n−1) ∈ [0,1]).
    * avg rank of a tie-group = min_rank + (ties−1)/2 (`engineer.py:243`). */
  def pandasPctRank(c: Cols): Column = {
    val byUser  = Window.partitionBy(col(c.user))
    val ranked  = Window.partitionBy(col(c.user)).orderBy(col(c.value))
    val tieGrp  = Window.partitionBy(col(c.user), col(c.value))
    val avgRank = rank().over(ranked) + (count(lit(1)).over(tieGrp) - 1) / 2.0
    avgRank / count(lit(1)).over(byUser)
  }

  /** True time-range window (the "fixed" variant of the reference's
    * lookback triplication, SURVEY.md §2.5): aggregates over the trailing
    * `seconds` of event time, current row inclusive. Range frame runs on
    * epoch MICROS so sub-second event times keep full precision. */
  def trailingRange(c: Cols, seconds: Long): WindowSpec =
    Window.partitionBy(col(c.user))
      .orderBy(unix_micros(col(c.ts)))
      .rangeBetween(-seconds * 1000000L, 0)

  def trailingFeatures(c: Cols, seconds: Long, tag: String): Seq[(String, Column)] = {
    val wr = trailingRange(c, seconds)
    Seq(
      s"cnt_$tag" -> count(lit(1)).over(wr),
      s"sum_$tag" -> sum(col(c.value)).over(wr),
      s"avg_$tag" -> avg(col(c.value)).over(wr)
    )
  }

  /** The reference's lookback column families (`engineer.py:66-105`):
    * for each d in `days` it EMITS `{count,sum,mean}_{d}d` columns, but
    * its implementation uses the same expanding window for every d — the
    * three families are triplicates (SURVEY.md §2.5). Both modes:
    * `literalCumulative = true` reproduces that quirk exactly (parity);
    * `false` computes the honest trailing range windows. */
  def lookbackFamilies(c: Cols, days: Seq[Int],
                       literalCumulative: Boolean): Seq[(String, Column)] =
    days.flatMap { d =>
      if (literalCumulative) {
        val w  = ordered(c)
        val wc = cumulative(c)
        Seq(
          s"user_txn_count_${d}d" -> (row_number().over(w) - 1),
          s"user_amt_sum_${d}d"   -> sum(col(c.value)).over(wc),
          s"user_amt_mean_${d}d"  -> avg(col(c.value)).over(wc))
      } else {
        val wr = trailingRange(c, d.toLong * 86400L)
        Seq(
          s"user_txn_count_${d}d" -> (count(lit(1)).over(wr) - 1),
          s"user_amt_sum_${d}d"   -> sum(col(c.value)).over(wr),
          s"user_amt_mean_${d}d"  -> avg(col(c.value)).over(wr))
      }
    }

  /** Session assignment: a new session starts after an inactivity gap
    * > `gapSeconds`. Two stacked windows (lag → cumulative sum of starts),
    * one shuffle. */
  def withSessionId(df: DataFrame, c: Cols, gapSeconds: Long): DataFrame = {
    val w  = ordered(c)
    val us = unix_micros(col(c.ts))
    val isStart = when(
      us - lag(us, 1).over(w) > gapSeconds * 1000000L || lag(us, 1).over(w).isNull,
      1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isStart).over(ordered(c).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
