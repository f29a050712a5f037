package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{AmountFeatures, TimeFeatures}
import graft.operators.BehaviorWindows
import graft.sources.Tables
import Util.{Q, qz}

/** The flagship parity query: the reference's ENTIRE per-event feature
  * matrix (`FraudFeatureEngineer.fit_transform` minus train-only target
  * encoding) as one oracle-checked query — temporal (F1-F4), amount
  * (F5-F7), expanding behavior (W1-W6, W8, W12), lags/velocity (W7, W11),
  * pandas pct-rank (W10), trailing range window, and the two-key combo
  * count (W9), 28 feature columns in one pass.
  *
  * Plan shape: the (user_id) windows — row-frame cumulative, lag, ordered
  * range, value-ordered rank — all reuse ONE hash exchange with per-spec
  * sorts; the (user_id, event_type) window adds the only other exchange.
  */
object PipelineQueries {

  private val C = BehaviorWindows.Cols()

  def queries: Map[String, Q] = Map(
    "q90_full_features" -> ((s, dir) => {
      val ts = col("ts"); val v = col("value")
      val feats =
        BehaviorWindows.cumulativeFeatures(C) ++
          BehaviorWindows.lagFeatures(C) ++
          BehaviorWindows.trailingFeatures(C, 86400L, "24h") ++
          Seq("pct_rank" -> BehaviorWindows.pandasPctRank(C))
      val wCombo = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(ts, col("event_id"))
      val base = Util.addCols(Tables.events(s, dir), feats)
      base.select(
        col("event_id"),
        // temporal
        hour(ts).cast("long").as("hour"),
        TimeFeatures.pandasDayOfWeek(ts).cast("long").as("dow"),
        qz(TimeFeatures.cyclicalSin(hour(ts).cast("double"), 24.0), 6).as("hour_sin"),
        qz(TimeFeatures.cyclicalCos(hour(ts).cast("double"), 24.0), 6).as("hour_cos"),
        TimeFeatures.isWeekend(ts).cast("long").as("is_weekend"),
        TimeFeatures.isNight(ts).cast("long").as("is_night"),
        TimeFeatures.isBusinessHours(ts).cast("long").as("is_business"),
        // amount
        qz(AmountFeatures.logAmount(v), 6).as("log_amt"),
        AmountFeatures.cutRightClosed(v, Seq(50, 100, 200, 500, 1000, 5000))
          .cast("long").as("amt_bin"),
        AmountFeatures.hasDecimal(v).cast("long").as("has_decimal"),
        // expanding behavior
        col("prior_count").cast("long").as("prior_count"),
        qz(col("cum_sum"), 4).as("cum_sum"),
        qz(qz(col("cum_sum"), 4) / (col("prior_count") + 1), 6).as("cum_mean"),
        qz(col("cum_std"), 6).as("cum_std"),
        col("cum_max"), col("cum_min"),
        qz(col("amt_deviation"), 6).as("amt_deviation"),
        col("is_first").cast("long").as("is_first"),
        qz(qz(col("cum_sum"), 4) / (col("prior_count") + 1), 6).as("amt_velocity"),
        // lags / velocity
        qz(col("time_diff"), 6).as("time_diff"),
        qz(col("value_diff"), 6).as("value_diff"),
        qz(col("spending_rate"), 6).as("spending_rate"),
        qz(col("acceleration"), 6).as("acceleration"),
        // trailing range
        col("cnt_24h"),
        qz(col("sum_24h"), 4).as("sum_24h"),
        // pandas pct-rank
        qz(col("pct_rank"), 6).as("pct_rank"),
        // two-key combo (W9)
        (row_number().over(wCombo) - 1).cast("long").as("prior_combo_count"),
        (row_number().over(wCombo) === 1).cast("long").as("is_first_combo")
      ).orderBy("event_id")
    })
  )

  def oracle: Map[String, String] = Map(
    "q90_full_features" ->
      """WITH t AS (
        | SELECT event_id, user_id, event_type, ts, value,
        |  epoch_us(ts)/1e6 AS ts_sec FROM events),
        |f AS (
        | SELECT event_id, user_id, event_type, ts, value, ts_sec,
        |  CAST(row_number() OVER w - 1 AS BIGINT) AS prior_count,
        |  sum(value) OVER wc AS cum_sum,
        |  stddev_samp(value) OVER wc AS cum_std,
        |  max(value) OVER wc AS cum_max,
        |  min(value) OVER wc AS cum_min,
        |  (value - avg(value) OVER wc) / (coalesce(stddev_samp(value) OVER wc, 1.0) + 1) AS amt_deviation,
        |  CAST(CASE WHEN row_number() OVER w = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_first,
        |  coalesce(ts_sec - lag(ts_sec) OVER w, 0.0) AS time_diff,
        |  coalesce(value - lag(value) OVER w, 0.0) AS value_diff,
        |  value / (CASE WHEN coalesce(ts_sec - lag(ts_sec) OVER w, 0.0) = 0 THEN 1.0
        |           ELSE coalesce(ts_sec - lag(ts_sec) OVER w, 0.0) END + 1.0) AS spending_rate,
        |  CAST(count(*) OVER wr AS BIGINT) AS cnt_24h,
        |  sum(value) OVER wr AS sum_24h,
        |  (CAST(rank() OVER (PARTITION BY user_id ORDER BY value) AS DOUBLE)
        |    + (count(*) OVER (PARTITION BY user_id, value) - 1) / 2.0)
        |   / count(*) OVER (PARTITION BY user_id) AS pct_rank,
        |  CAST(row_number() OVER wk - 1 AS BIGINT) AS prior_combo_count,
        |  CAST(CASE WHEN row_number() OVER wk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_first_combo
        | FROM t
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  wc AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wr AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |         RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW),
        |  wk AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
        |g AS (
        | SELECT *,
        |  coalesce(spending_rate - lag(spending_rate) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS acceleration
        | FROM f)
        |SELECT event_id,
        | CAST(hour(ts) AS BIGINT) AS hour,
        | CAST(isodow(ts) - 1 AS BIGINT) AS dow,
        | round((sin(2*pi()*hour(ts)/24)) * 1000000.0) / 1000000.0 + 0.0 AS hour_sin,
        | round((cos(2*pi()*hour(ts)/24)) * 1000000.0) / 1000000.0 + 0.0 AS hour_cos,
        | CAST(CASE WHEN isodow(ts)-1 >= 5 THEN 1 ELSE 0 END AS BIGINT) AS is_weekend,
        | CAST(CASE WHEN hour(ts) >= 22 OR hour(ts) <= 6 THEN 1 ELSE 0 END AS BIGINT) AS is_night,
        | CAST(CASE WHEN hour(ts) BETWEEN 9 AND 17 THEN 1 ELSE 0 END AS BIGINT) AS is_business,
        | round((ln(1+value)) * 1000000.0) / 1000000.0 + 0.0 AS log_amt,
        | CAST(CASE WHEN value <= 50 THEN 0 WHEN value <= 100 THEN 1
        |   WHEN value <= 200 THEN 2 WHEN value <= 500 THEN 3
        |   WHEN value <= 1000 THEN 4 WHEN value <= 5000 THEN 5
        |   ELSE 6 END AS BIGINT) AS amt_bin,
        | CAST(CASE WHEN fmod(value, 1.0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS has_decimal,
        | prior_count,
        | round((cum_sum) * 10000.0) / 10000.0 + 0.0 AS cum_sum,
        | round(((round((cum_sum) * 10000.0) / 10000.0 + 0.0) / (prior_count + 1)) * 1000000.0) / 1000000.0 + 0.0 AS cum_mean,
        | round((cum_std) * 1000000.0) / 1000000.0 + 0.0 AS cum_std,
        | cum_max, cum_min,
        | round((amt_deviation) * 1000000.0) / 1000000.0 + 0.0 AS amt_deviation,
        | is_first,
        | round(((round((cum_sum) * 10000.0) / 10000.0 + 0.0) / (prior_count + 1)) * 1000000.0) / 1000000.0 + 0.0 AS amt_velocity,
        | round((time_diff) * 1000000.0) / 1000000.0 + 0.0 AS time_diff,
        | round((value_diff) * 1000000.0) / 1000000.0 + 0.0 AS value_diff,
        | round((spending_rate) * 1000000.0) / 1000000.0 + 0.0 AS spending_rate,
        | round((acceleration) * 1000000.0) / 1000000.0 + 0.0 AS acceleration,
        | cnt_24h,
        | round((sum_24h) * 10000.0) / 10000.0 + 0.0 AS sum_24h,
        | round((pct_rank) * 1000000.0) / 1000000.0 + 0.0 AS pct_rank,
        | prior_combo_count, is_first_combo
        |FROM g ORDER BY event_id""".stripMargin
  )
}
