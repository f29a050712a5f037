package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.{BehaviorWindows, TimeSplit}
import Util.{Q, addCols, qz}

/** Window-function queries (SURVEY.md §2.5 W1-W13) over `events`
  * ((user_id, ts, value) ≅ the reference's (card1, TransactionDT,
  * TransactionAmt)). All windows share one (user_id) hash exchange —
  * Spark reuses the Exchange+Sort across same-keyed window specs.
  */
object WindowQueries {

  private val C = BehaviorWindows.Cols()

  def queries: Map[String, Q] = Map(
    // W1-W6, W8, W12: inclusive expanding frames per user
    "q20_cum_features" -> ((s, dir) => {
      val feats = BehaviorWindows.cumulativeFeatures(C)
      addCols(Tables.events(s, dir), feats)
        .select(col("event_id"),
          col("prior_count").cast("long").as("prior_count"),
          qz(col("cum_sum"), 4).as("cum_sum"),
          qz(qz(col("cum_sum"), 4) / (col("prior_count") + 1), 6).as("cum_mean"),
          qz(col("cum_std"), 6).as("cum_std"),
          col("cum_max"), col("cum_min"),
          qz(col("amt_deviation"), 6).as("amt_deviation"),
          col("is_first").cast("long").as("is_first"),
          // derive from the quantized cum_sum: the raw running sums differ
          // across engines by 1 ulp (different accumulation trees) and
          // cum_sum/n lands exactly on 6-decimal halves
          qz(qz(col("cum_sum"), 4) / (col("prior_count") + 1), 6).as("amt_velocity"))
        .orderBy("event_id")
    }),

    // W7, W11: lag diffs, inter-arrival time, spending rate/acceleration
    "q21_lag_features" -> ((s, dir) => {
      val feats = BehaviorWindows.lagFeatures(C)
      addCols(Tables.events(s, dir), feats)
        .select(col("event_id"),
          qz(col("time_diff"), 6).as("time_diff"),
          qz(col("value_diff"), 6).as("value_diff"),
          qz(col("spending_rate"), 6).as("spending_rate"),
          qz(col("acceleration"), 6).as("acceleration"))
        .orderBy("event_id")
    }),

    // W10: pandas rank(pct=True) parity (average-rank / group-size)
    "q22_pct_rank_pandas" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          qz(BehaviorWindows.pandasPctRank(C), 6).as("pct_rank"))
        .orderBy("event_id")
    }),

    // range frame over trailing 24h of event time (micros precision)
    "q23_trailing_24h" -> ((s, dir) => {
      val feats = BehaviorWindows.trailingFeatures(C, 86400L, "24h")
      addCols(Tables.events(s, dir), feats)
        .select(col("event_id"), col("cnt_24h"),
          qz(col("sum_24h"), 4).as("sum_24h"),
          qz(col("avg_24h"), 6).as("avg_24h"))
        .orderBy("event_id")
    }),

    // session assignment (gap > 30 min) + per-session aggregates
    "q24_sessionize" -> ((s, dir) => {
      BehaviorWindows.withSessionId(Tables.events(s, dir), C, gapSeconds = 1800L)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          qz(sum("value"), 4).as("sum_value"),
          min("ts").as("min_ts"), max("ts").as("max_ts"))
        .orderBy("user_id", "session_id")
    }),

    // ORDERED funnel conversion within sessions — view → signup →
    // purchase, each stage only counting if it happens AT OR AFTER the
    // previous stage's first occurrence (a purchase before the signup
    // does not convert). Three conditional-min windows over the same
    // (user, session) clustering as the sessionize pass — one hash
    // exchange end to end; output is ONE summary row.
    "q123_funnel" -> ((s, dir) => {
      val sess = BehaviorWindows.withSessionId(
        Tables.events(s, dir), C, gapSeconds = 1800L)
      val w = Window.partitionBy("user_id", "session_id")
      val us = unix_micros(col("ts"))
      val st = sess
        .withColumn("t_view",
          min(when(col("event_type") === "view", us)).over(w))
        .withColumn("t_signup",
          min(when(col("event_type") === "signup" && us >= col("t_view"), us)).over(w))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" && us >= col("t_signup"), us)).over(w))
      st.groupBy("user_id", "session_id")
        .agg(max("t_view").as("tv"), max("t_signup").as("tsu"),
          max("t_purchase").as("tp"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("tv").isNotNull.cast("long")).as("n_view"),
          sum(col("tsu").isNotNull.cast("long")).as("n_signup"),
          sum(col("tp").isNotNull.cast("long")).as("n_purchase"))
        .select(col("n_sessions"), col("n_view"), col("n_signup"), col("n_purchase"),
          qz(col("n_signup").cast("double") / col("n_view"), 6).as("view_to_signup"),
          qz(col("n_purchase").cast("double") / col("n_signup"), 6).as("signup_to_purchase"))
    }),

    // COHORT RETENTION matrix — users cohorted by first-seen ISO week,
    // counted as retained in each later week they were active. Two
    // user-keyed aggregations and one user-keyed join (at scale all
    // three share the hash(user) clustering); matrix size is bounded by
    // weeks², never rows. The classic growth-analytics query shape.
    "q124_cohort_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val cohorts = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      val sizes = cohorts.groupBy("cohort_wk")
        .agg(count(lit(1)).as("cohort_size"))
      val active = ev.distinct()
      active.join(cohorts, Seq("user_id"))
        .groupBy(col("cohort_wk"),
          ((unix_micros(col("wk")) - unix_micros(col("cohort_wk")))
            / lit(604800000000L)).cast("long").as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, Seq("cohort_wk"))   // |weeks| rows — AQE broadcasts
        .select(col("cohort_wk"), col("week_offset"), col("n_active"),
          col("cohort_size"),
          qz(col("n_active").cast("double") / col("cohort_size"), 6).as("retention"))
        .orderBy("cohort_wk", "week_offset")
    }),

    // behavioral TRANSITION MATRIX (first-order Markov counts): within
    // each user's event stream, count (previous type → type) bigrams
    // and row-normalize to transition probabilities. One lag window on
    // the user clustering + a |types|²-bounded groupBy — the
    // sequence-model prior / anomaly baseline over behavior streams.
    "q125_transitions" -> ((s, dir) => {
      val w = BehaviorWindows.ordered(C)
      val paired = Tables.events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
      val counts = paired.groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val rowTot = counts.groupBy("prev_type").agg(sum("n").as("row_n"))
      counts.join(rowTot, Seq("prev_type"))  // |types| rows — AQE broadcasts
        .select(col("prev_type"), col("next_type"), col("n"),
          qz(col("n").cast("double") / col("row_n"), 6).as("p"))
        .orderBy("prev_type", "next_type")
    }),

    // W14 (aggregate view): sliding last-3 frame, full windows only,
    // users with ≥5 events (group-size predicate via window count)
    "q25_sliding_window" -> ((s, dir) => {
      val w3 = BehaviorWindows.ordered(C).rowsBetween(-2, 0)
      val byUser = Window.partitionBy(col("user_id"))
      Tables.events(s, dir)
        .select(col("event_id"),
          sum("value").over(w3).as("sum3"),
          count(lit(1)).over(w3).as("cnt3"),
          count(lit(1)).over(byUser).as("nu"))
        .filter(col("cnt3") === 3 && col("nu") >= 5)
        .select(col("event_id"), qz(col("sum3"), 4).as("sum3"), col("cnt3"))
        .orderBy("event_id")
    }),

    // as-of join (beyond-reference): each event joined to the user's
    // most recent purchase at-or-before its time
    "q15_asof_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      graft.operators.AsOfJoin.leftAsOf(
          e.select("event_id", "user_id", "ts", "value"), purchases,
          key = "user_id", ts = "ts",
          payload = Seq("purchase_id", "purchase_value"), prefix = "last_")
        .select(col("event_id"), col("last_purchase_id"),
          col("last_purchase_value"))
        .orderBy("event_id")
    }),

    // forward as-of join: each event joined to the user's NEXT purchase
    // at-or-after its time (the time-reverse of q15, via the flipped
    // window frame in AsOfJoin.leftAsOfForward)
    "q77_asof_forward" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      graft.operators.AsOfJoin.leftAsOfForward(
          e.select("event_id", "user_id", "ts", "value"), purchases,
          key = "user_id", ts = "ts",
          payload = Seq("purchase_id", "purchase_value"), prefix = "next_")
        .select(col("event_id"), col("next_purchase_id"),
          col("next_purchase_value"))
        .orderBy("event_id")
    }),

    // banded range join: per purchase, the same user's events in the
    // following hour — time-bucketed equi-join (RangeJoin), so a hot
    // user's history spreads across (user, hour-bucket) reducers instead
    // of one. Aggregated + left-joined back so zero-match purchases keep
    // a row; both engines compare at micros (Spark's ns->us floor).
    "q79_range_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          unix_micros(col("ts")).as("pts"))
      val others = e.select(col("user_id"), col("event_id").as("e_id"),
        unix_micros(col("ts")).as("ets"), col("value"))
      val joined = graft.operators.RangeJoin.bandedIntervalJoin(
        purchases, others, "user_id", "pts", "ets",
        lo = 1L, hi = 3600000000L) // (p.ts, p.ts + 1h] at micros grain
      val agg = joined.groupBy("p_id")
        .agg(count(lit(1)).as("n_next_1h"), sum("value").as("sv"))
      purchases.join(agg, Seq("p_id"), "left")
        .select(col("p_id").as("event_id"),
          coalesce(col("n_next_1h"), lit(0L)).as("n_next_1h"),
          qz(coalesce(col("sv"), lit(0.0)), 4).as("val_next_1h"))
        .orderBy("event_id")
    }),

    // W9: multi-key windows — same ops partitioned by (user, type)
    "q29_two_key_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir).select(
        col("event_id"),
        (row_number().over(w) - 1).cast("long").as("prior_combo_count"),
        qz(sum(col("value")).over(wc), 4).as("combo_cum_sum"),
        (row_number().over(w) === 1).cast("long").as("is_first_combo")
      ).orderBy("event_id")
    }),

    // ranking suite: rank/dense_rank/ntile/lead/first_value/cume_dist
    "q28_rank_suite" -> ((s, dir) => {
      val wVal = Window.partitionBy(col("user_id")).orderBy(col("value"))
      val wFull = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      Tables.events(s, dir).select(
        col("event_id"),
        rank().over(wVal).cast("long").as("rnk"),
        dense_rank().over(wVal).cast("long").as("drnk"),
        ntile(4).over(wFull).cast("long").as("quartile"),
        lead(col("value"), 1).over(wFull).as("next_value"),
        first(col("value")).over(wFull).as("min_value"),
        qz(cume_dist().over(wVal), 6).as("cume")
      ).orderBy("event_id")
    }),

    // lookback family, literal-parity mode: the reference emits
    // {count,sum,mean}_{1,7,30}d columns that are all the SAME expanding
    // window (engineer.py quirk, SURVEY §2.5) — reproduce the triplication
    "q36_lookback_literal" -> ((s, dir) => {
      val feats = BehaviorWindows.lookbackFamilies(C, Seq(1, 7, 30), literalCumulative = true)
      val out = addCols(Tables.events(s, dir), feats)
      val cols = col("event_id") +: Seq(1, 7, 30).flatMap { d =>
        Seq(
          col(s"user_txn_count_${d}d").cast("long").as(s"user_txn_count_${d}d"),
          qz(col(s"user_amt_sum_${d}d"), 4).as(s"user_amt_sum_${d}d"),
          // derive mean from the quantized sum (running sums differ by 1 ulp
          // across engines); n = txn_count + 1
          qz(qz(col(s"user_amt_sum_${d}d"), 4) / (col(s"user_txn_count_${d}d") + 1), 6)
            .as(s"user_amt_mean_${d}d"))
      }
      out.select(cols: _*).orderBy("event_id")
    }),

    // lookback family, honest mode: true trailing {1,7,30}-day range frames
    "q37_lookback_range" -> ((s, dir) => {
      val feats = BehaviorWindows.lookbackFamilies(C, Seq(1, 7, 30), literalCumulative = false)
      val out = addCols(Tables.events(s, dir), feats)
      val cols = col("event_id") +: Seq(1, 7, 30).flatMap { d =>
        Seq(
          col(s"user_txn_count_${d}d").cast("long").as(s"user_txn_count_${d}d"),
          qz(col(s"user_amt_sum_${d}d"), 4).as(s"user_amt_sum_${d}d"),
          qz(qz(col(s"user_amt_sum_${d}d"), 4) / (col(s"user_txn_count_${d}d") + 1), 6)
            .as(s"user_amt_mean_${d}d"))
      }
      out.select(cols: _*).orderBy("event_id")
    }),

    // W13: chronological 70/15/15 split without a global single-partition
    // sort. exactMaxRows pinned to MaxValue: this query's contract IS the
    // exact-positional oracle (row_number semantics), so the quantile
    // reroute must never silently swap in — callers wanting the scale
    // path use TimeSplit.assign's default or assignApprox directly
    "q26_time_split" -> ((s, dir) => {
      TimeSplit.assign(Tables.events(s, dir), col("ts"), col("event_id"),
          exactMaxRows = Long.MaxValue)
        .groupBy("split")
        .agg(count(lit(1)).as("n_rows"),
          min("event_id").as("min_id"), max("event_id").as("max_id"),
          min("ts").as("min_ts"), max("ts").as("max_ts"))
        .orderBy("split")
    })
  )

  def oracle: Map[String, String] = Map(
    "q20_cum_features" ->
      """WITH f AS (
        | SELECT event_id,
        |  CAST(row_number() OVER w - 1 AS BIGINT) AS prior_count,
        |  sum(value) OVER wc AS cum_sum,
        |  (round((sum(value) OVER wc) * 10000.0) / 10000.0 + 0.0) / (row_number() OVER w) AS cum_mean,
        |  stddev_samp(value) OVER wc AS cum_std,
        |  max(value) OVER wc AS cum_max,
        |  min(value) OVER wc AS cum_min,
        |  (value - avg(value) OVER wc) / (coalesce(stddev_samp(value) OVER wc, 1.0) + 1) AS amt_deviation,
        |  CAST(CASE WHEN row_number() OVER w = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_first,
        |  (round((sum(value) OVER wc) * 10000.0) / 10000.0 + 0.0) / (row_number() OVER w) AS amt_velocity
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  wc AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, prior_count, round((cum_sum) * 10000.0) / 10000.0 + 0.0 AS cum_sum,
        | round((cum_mean) * 1000000.0) / 1000000.0 + 0.0 AS cum_mean, round((cum_std) * 1000000.0) / 1000000.0 + 0.0 AS cum_std,
        | cum_max, cum_min, round((amt_deviation) * 1000000.0) / 1000000.0 + 0.0 AS amt_deviation,
        | is_first, round((amt_velocity) * 1000000.0) / 1000000.0 + 0.0 AS amt_velocity
        |FROM f ORDER BY event_id""".stripMargin,

    "q21_lag_features" ->
      """WITH t AS (
        | SELECT event_id, user_id, ts, value, epoch_us(ts)/1e6 AS ts_sec FROM events),
        |f AS (
        | SELECT event_id, user_id, ts,
        |  coalesce(ts_sec - lag(ts_sec) OVER w, 0.0) AS time_diff,
        |  coalesce(value - lag(value) OVER w, 0.0) AS value_diff,
        |  value / (CASE WHEN coalesce(ts_sec - lag(ts_sec) OVER w, 0.0) = 0 THEN 1.0
        |           ELSE coalesce(ts_sec - lag(ts_sec) OVER w, 0.0) END + 1.0) AS spending_rate
        | FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        | SELECT event_id, time_diff, value_diff, spending_rate,
        |  coalesce(spending_rate - lag(spending_rate) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS acceleration
        | FROM f)
        |SELECT event_id, round((time_diff) * 1000000.0) / 1000000.0 + 0.0 AS time_diff, round((value_diff) * 1000000.0) / 1000000.0 + 0.0 AS value_diff,
        | round((spending_rate) * 1000000.0) / 1000000.0 + 0.0 AS spending_rate, round((acceleration) * 1000000.0) / 1000000.0 + 0.0 AS acceleration
        |FROM g ORDER BY event_id""".stripMargin,

    "q22_pct_rank_pandas" ->
      """SELECT event_id,
        | round(((CAST(rank() OVER (PARTITION BY user_id ORDER BY value) AS DOUBLE)
        |   + (count(*) OVER (PARTITION BY user_id, value) - 1) / 2.0)
        |  / count(*) OVER (PARTITION BY user_id)) * 1000000.0) / 1000000.0 + 0.0 AS pct_rank
        |FROM events ORDER BY event_id""".stripMargin,

    "q23_trailing_24h" ->
      """SELECT event_id,
        | CAST(count(*) OVER w AS BIGINT) AS cnt_24h,
        | round((sum(value) OVER w) * 10000.0) / 10000.0 + 0.0 AS sum_24h,
        | round((avg(value) OVER w) * 1000000.0) / 1000000.0 + 0.0 AS avg_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q24_sessionize" ->
      """WITH flagged AS (
        | SELECT user_id, ts, event_id, value,
        |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS is_start
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        | SELECT user_id, ts, value,
        |  CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        | FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        | round((sum(value)) * 10000.0) / 10000.0 + 0.0 AS sum_value, min(ts) AS min_ts, max(ts) AS max_ts
        |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    // same sessionization, then the ordered-stage mins re-derived with
    // FILTERed window aggregates
    "q123_funnel" ->
      """WITH flagged AS (
        | SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us,
        |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS is_start
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        | SELECT user_id, us, event_type,
        |  sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM flagged),
        |s1 AS (
        | SELECT user_id, session_id, us, event_type,
        |  min(us) FILTER (WHERE event_type = 'view')
        |    OVER (PARTITION BY user_id, session_id) AS tv
        | FROM sess),
        |s2 AS (
        | SELECT *, min(us) FILTER (WHERE event_type = 'signup' AND us >= tv)
        |    OVER (PARTITION BY user_id, session_id) AS tsu
        | FROM s1),
        |s3 AS (
        | SELECT *, min(us) FILTER (WHERE event_type = 'purchase' AND us >= tsu)
        |    OVER (PARTITION BY user_id, session_id) AS tp
        | FROM s2),
        |per AS (
        | SELECT user_id, session_id, max(tv) AS tv, max(tsu) AS tsu, max(tp) AS tp
        | FROM s3 GROUP BY user_id, session_id),
        |agg AS (
        | SELECT count(*) AS n_sessions,
        |  count(tv) AS n_view, count(tsu) AS n_signup, count(tp) AS n_purchase
        | FROM per)
        |SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
        | CAST(n_view AS BIGINT) AS n_view, CAST(n_signup AS BIGINT) AS n_signup,
        | CAST(n_purchase AS BIGINT) AS n_purchase,
        | round(CAST(n_signup AS DOUBLE) / n_view * 1000000.0) / 1000000.0 + 0.0 AS view_to_signup,
        | round(CAST(n_purchase AS DOUBLE) / n_signup * 1000000.0) / 1000000.0 + 0.0 AS signup_to_purchase
        |FROM agg""".stripMargin,

    // cohort by first-seen week (date_trunc 'week' is ISO Monday-start
    // in BOTH engines, UTC session), activity deduped per (user, week)
    "q124_cohort_retention" ->
      """WITH ev AS (
        | SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |cohorts AS (
        | SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id),
        |sizes AS (
        | SELECT cohort_wk, count(*) AS cohort_size FROM cohorts GROUP BY 1),
        |active AS (SELECT DISTINCT user_id, wk FROM ev),
        |m AS (
        | SELECT c.cohort_wk,
        |  (epoch_us(a.wk) - epoch_us(c.cohort_wk)) // 604800000000 AS week_offset,
        |  count(*) AS n_active
        | FROM active a JOIN cohorts c ON a.user_id = c.user_id
        | GROUP BY 1, 2)
        |SELECT m.cohort_wk, CAST(week_offset AS BIGINT) AS week_offset,
        | CAST(n_active AS BIGINT) AS n_active,
        | CAST(cohort_size AS BIGINT) AS cohort_size,
        | round(CAST(n_active AS DOUBLE) / cohort_size * 1000000.0) / 1000000.0 + 0.0 AS retention
        |FROM m JOIN sizes ON m.cohort_wk = sizes.cohort_wk
        |ORDER BY m.cohort_wk, week_offset""".stripMargin,

    // same (ts, event_id) total order per user, bigram counts + row
    // normalization
    "q125_transitions" ->
      """WITH p AS (
        | SELECT lag(event_type) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id) AS prev_type, event_type AS next_type
        | FROM events),
        |c AS (
        | SELECT prev_type, next_type, count(*) AS n FROM p
        | WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, sum(n) AS row_n FROM c GROUP BY 1)
        |SELECT c.prev_type AS prev_type, next_type, c.n AS n,
        | round(CAST(c.n AS DOUBLE) / row_n * 1000000.0) / 1000000.0 + 0.0 AS p
        |FROM c JOIN t ON c.prev_type = t.prev_type
        |ORDER BY prev_type, next_type""".stripMargin,

    "q25_sliding_window" ->
      """WITH f AS (
        | SELECT event_id,
        |  sum(value) OVER w3 AS sum3,
        |  CAST(count(*) OVER w3 AS BIGINT) AS cnt3,
        |  count(*) OVER (PARTITION BY user_id) AS nu
        | FROM events
        | WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |SELECT event_id, round((sum3) * 10000.0) / 10000.0 + 0.0 AS sum3, cnt3
        |FROM f WHERE cnt3 = 3 AND nu >= 5 ORDER BY event_id""".stripMargin,

    "q15_asof_join" ->
      """SELECT l.event_id,
        | r.event_id AS last_purchase_id,
        | r.value AS last_purchase_value
        |FROM events l ASOF LEFT JOIN
        | (SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase') r
        | ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q77_asof_forward" ->
      """SELECT l.event_id,
        | r.event_id AS next_purchase_id,
        | r.value AS next_purchase_value
        |FROM events l ASOF LEFT JOIN
        | (SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase') r
        | ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // inequality join at micros grain (epoch_us floors ns like Spark);
    // count(e_id) over the LEFT join gives 0 for matchless purchases
    "q79_range_join" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS pts
        |  FROM events WHERE event_type = 'purchase'),
        | e AS (SELECT user_id, event_id AS e_id, epoch_us(ts) AS ets, value
        |  FROM events)
        |SELECT p.p_id AS event_id, CAST(count(e.e_id) AS BIGINT) AS n_next_1h,
        | round((coalesce(sum(e.value), 0)) * 10000.0) / 10000.0 + 0.0 AS val_next_1h
        |FROM p LEFT JOIN e ON e.user_id = p.user_id
        | AND e.ets >= p.pts + 1 AND e.ets <= p.pts + 3600000000
        |GROUP BY p.p_id ORDER BY event_id""".stripMargin,

    "q29_two_key_window" ->
      """SELECT event_id,
        | CAST(row_number() OVER w - 1 AS BIGINT) AS prior_combo_count,
        | round((sum(value) OVER wc) * 10000.0) / 10000.0 + 0.0 AS combo_cum_sum,
        | CAST(CASE WHEN row_number() OVER w = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_first_combo
        |FROM events
        |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id),
        | wc AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q28_rank_suite" ->
      """SELECT event_id,
        | CAST(rank() OVER wv AS BIGINT) AS rnk,
        | CAST(dense_rank() OVER wv AS BIGINT) AS drnk,
        | CAST(ntile(4) OVER wf AS BIGINT) AS quartile,
        | lead(value, 1) OVER wf AS next_value,
        | first_value(value) OVER wf AS min_value,
        | round((cume_dist() OVER wv) * 1000000.0) / 1000000.0 + 0.0 AS cume
        |FROM events
        |WINDOW wv AS (PARTITION BY user_id ORDER BY value),
        | wf AS (PARTITION BY user_id ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,

    "q36_lookback_literal" -> {
      val fams = Seq(1, 7, 30).map { d =>
        s""" CAST(row_number() OVER w - 1 AS BIGINT) AS user_txn_count_${d}d,
           | round((sum(value) OVER wc) * 10000.0) / 10000.0 + 0.0 AS user_amt_sum_${d}d,
           | round(((round((sum(value) OVER wc) * 10000.0) / 10000.0 + 0.0) / (row_number() OVER w)) * 1000000.0) / 1000000.0 + 0.0 AS user_amt_mean_${d}d""".stripMargin
      }.mkString(",\n")
      s"""SELECT event_id,
         |$fams
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
         | wc AS (PARTITION BY user_id ORDER BY ts, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin
    },

    "q37_lookback_range" -> {
      val fams = Seq(1, 7, 30).map { d =>
        s""" CAST(count(*) OVER w${d} - 1 AS BIGINT) AS user_txn_count_${d}d,
           | round((sum(value) OVER w${d}) * 10000.0) / 10000.0 + 0.0 AS user_amt_sum_${d}d,
           | round(((round((sum(value) OVER w${d}) * 10000.0) / 10000.0 + 0.0) / (count(*) OVER w${d})) * 1000000.0) / 1000000.0 + 0.0 AS user_amt_mean_${d}d""".stripMargin
      }.mkString(",\n")
      val wins = Seq(1, 7, 30).map { d =>
        s"w${d} AS (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN ${d.toLong * 86400000000L} PRECEDING AND CURRENT ROW)"
      }.mkString(",\n ")
      s"""SELECT event_id,
         |$fams
         |FROM events
         |WINDOW $wins
         |ORDER BY event_id""".stripMargin
    },

    "q26_time_split" ->
      """WITH ranked AS (
        | SELECT event_id, ts,
        |  row_number() OVER (ORDER BY ts, event_id) AS rn,
        |  count(*) OVER () AS n
        | FROM events)
        |SELECT CASE WHEN rn <= floor(0.70*n) THEN 'train'
        |            WHEN rn <= floor(0.85*n) THEN 'val'
        |            ELSE 'test' END AS split,
        | count(*) AS n_rows, min(event_id) AS min_id, max(event_id) AS max_id,
        | min(ts) AS min_ts, max(ts) AS max_ts
        |FROM ranked GROUP BY 1 ORDER BY split""".stripMargin
  )
}
