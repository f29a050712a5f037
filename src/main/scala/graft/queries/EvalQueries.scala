package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.eval.Metrics
import Util.{Q, qz}

/** Evaluation-operator queries (SURVEY.md §2.11 E1-E7) with DuckDB oracle
  * SQL. Labels/scores are derived deterministically from `events`:
  * label = (event_type = 'error'), score = value-based.
  */
object EvalQueries {

  private def labeled(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir).select(
      (col("event_type") === "error").cast("int").as("label"),
      col("value").as("score"))

  def queries: Map[String, Q] = Map(
    // A10/E3/E4: confusion + point metrics + cost model at τ, one pass
    "q40_confusion" -> ((s, dir) => {
      val df = Tables.events(s, dir)
      Metrics.confusionAt(df,
          (col("event_type") === "error").cast("int"), col("value") / 500.0, 0.2)
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          qz(col("precision"), 6).as("prec"),
          qz(col("recall"), 6).as("rec"),
          qz(col("f1"), 6).as("f1"),
          qz(col("accuracy"), 6).as("accuracy"),
          qz(col("specificity"), 6).as("specificity"),
          qz(col("cost"), 2).as("cost"))
    }),

    // E1: exact ROC-AUC (rank-sum identity, distinct-score aggregation)
    "q41_roc_auc" -> ((s, dir) => {
      Metrics.rocAuc(labeled(s, dir), col("label"), col("score"))
        .select(qz(col("roc_auc"), 6).as("roc_auc"))
    }),

    // E5: PR curve — top 20 thresholds descending
    "q42_pr_curve" -> ((s, dir) => {
      Metrics.prCurve(labeled(s, dir), col("label"), col("score"))
        .select(qz(col("threshold"), 6).as("threshold"),
          qz(col("precision"), 6).as("prec"),
          qz(col("recall"), 6).as("rec"))
        .orderBy(desc("threshold")).limit(20)
    }),

    // E6: best-F1 threshold from one sorted pass (not an O(T·N) loop)
    "q43_best_f1" -> ((s, dir) => {
      Metrics.bestF1Threshold(labeled(s, dir), col("label"), col("score"))
        .select(qz(col("threshold"), 6).as("threshold"),
          qz(col("f1"), 6).as("f1"))
    }),

    // E2: sklearn-style average precision (step-wise)
    "q45_avg_precision" -> ((s, dir) => {
      Metrics.averagePrecision(labeled(s, dir), col("label"), col("score"))
        .select(qz(col("avg_precision"), 6).as("avg_precision"))
    }),

    // E6 cost variant: min-cost threshold in one sorted pass
    "q46_min_cost" -> ((s, dir) => {
      Metrics.minCostThreshold(labeled(s, dir), col("label"), col("score"))
        .select(qz(col("threshold"), 6).as("threshold"),
          qz(col("cost"), 2).as("cost"))
    }),

    // E6 recall-floor variant: max precision subject to recall >= 0.9
    "q47_recall_floor" -> ((s, dir) => {
      Metrics.recallFloorThreshold(labeled(s, dir), col("label"), col("score"))
        .select(qz(col("threshold"), 6).as("threshold"),
          qz(col("precision"), 6).as("prec"),
          qz(col("recall"), 6).as("rec"))
    }),

    // E7: threshold grid via explode + grouped conditional aggregates
    "q44_threshold_grid" -> ((s, dir) => {
      Metrics.thresholdGrid(labeled(s, dir),
          col("label"), col("score") / 500.0,
          Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
        .select(col("tau"),
          qz(coalesce(col("precision"), lit(0.0)), 6).as("prec"),
          qz(coalesce(col("recall"), lit(0.0)), 6).as("rec"))
        .orderBy("tau")
    }),

    // beyond-ref: PSI score-drift monitor over the PRODUCTION scorer —
    // the q32/q107 heuristic/blend chain scored over events, reference
    // population = first half of event time, current = second half
    // (split at the midpoint of the time span, an exact integer in
    // both engines). One scan bins both sides (side-tagged conditional
    // sums); Laplace smoothing keeps every ln defined. The oracle
    // re-derives score, split, bins, proportions and the PSI sum from
    // scratch.
    "q111_drift_psi" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val blended = graft.serve.RiskScore.EventScore.blended
      val mid = ev.agg(expr(
        "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("mid"))
      val scored = ev.crossJoin(broadcast(mid))
        .select(blended.as("score"),
          (unix_micros(col("ts")) > col("mid")).as("cur"))
      Metrics.psi(scored, col("score"), col("cur"), bins = 10)
        .select(col("bin"), col("n_ref"), col("n_cur"),
          qz(col("psi_contrib"), 6).as("psi_contrib"),
          qz(col("psi"), 6).as("psi"))
        .orderBy("bin")
    }),

    // beyond-ref: calibration diagnostics (reliability bins + ECE +
    // Brier) for the production scorer against the deterministic
    // event label — the "does risk 0.8 mean 80%?" check that belongs
    // next to PSI in any deployed-scorer monitoring suite. The oracle
    // re-derives the score chain, the binning, and both summaries from
    // scratch in SQL.
    "q115_calibration" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val blended = graft.serve.RiskScore.EventScore.blended
      val scored = ev.select(blended.as("score"),
        (col("event_type") === "error").cast("long").as("label"))
      Metrics.calibration(scored, col("label"), col("score"), bins = 10)
        .select(col("bin"), col("n"), col("mean_score"), col("frac_pos"),
          qz(col("ece"), 6).as("ece"), qz(col("brier"), 6).as("brier"))
        .orderBy("bin")
    }),

    // O4/E8 + M5/M8: the model-comparison leaderboard as a driver-gated
    // query (previously spec-only). Three deterministic scorers over
    // events — a value-linear score, an hour-derived score, and their
    // 3:1 weighted ensemble (FraudModel.weightedEnsemble, M8) — each
    // evaluated to one metrics row (ROC-AUC, AP, point metrics at
    // τ=0.4 via the thresholded prediction, M5) and ranked best-AUC
    // first by Comparison.leaderboard (reference compare_models,
    // src/evaluation/metrics.py:203-237). Scorers are transcendental-
    // free (rational arithmetic + integer hour math only) so both
    // engines rank identical doubles. The oracle re-derives all three
    // score chains and every metric from scratch in SQL.
    "q144_model_leaderboard" -> ((s, dir) => {
      import graft.ml.FraudModel
      val ev = Tables.events(s, dir).select(
        (col("event_type") === "error").cast("int").as("label"),
        least(lit(1.0), col("value") / 500.0).as("v_lin"),
        (pmod(hour(col("ts")) * 7, lit(24)).cast("double") / 24.0).as("h_mix"))
      val models = Seq(
        "value_linear" -> ev.select(col("label"), col("v_lin").as("score")),
        "hour_mix" -> ev.select(col("label"), col("h_mix").as("score")),
        "blend_3_1" -> ev.select(col("label"),
          FraudModel.weightedEnsemble(
            Seq(col("v_lin") -> 3.0, col("h_mix") -> 1.0)).as("score")))
      graft.eval.Comparison.leaderboard(models, col("label"), col("score"), tau = 0.4)
        .select(col("model"),
          qz(col("roc_auc"), 6).as("roc_auc"),
          qz(col("pr_auc"), 6).as("pr_auc"),
          qz(col("precision"), 6).as("prec"),
          qz(col("recall"), 6).as("rec"),
          qz(col("f1"), 6).as("f1"),
          qz(col("cost"), 2).as("cost"))
    })
  )

  /** One leaderboard metrics row in SQL: CTE block computing ROC-AUC
    * (q41 shape), average precision (q45 shape) and confusion point
    * metrics (q40 shape) for `scoreSql` at threshold `tau`. Generated
    * so the three models' arithmetic cannot drift from each other or
    * from the single-metric queries. Dual-dialect (no DuckDB-only
    * syntax) — SqlSurfaceSpec runs it through spark.sql too. */
  private def lbBlock(p: String, name: String, scoreSql: String,
                      tau: Double): String =
    s"""${p}_scored AS (
       | SELECT CASE WHEN event_type='error' THEN 1 ELSE 0 END AS label,
       |  ($scoreSql) AS s FROM events),
       |${p}_by AS (
       | SELECT s, count(*) AS cnt, sum(label) AS pos FROM ${p}_scored GROUP BY s),
       |${p}_rk AS (
       | SELECT s, cnt, pos,
       |  coalesce(sum(cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
       | FROM ${p}_by),
       |${p}_auc AS (
       | SELECT CAST(sum(pos) AS DOUBLE) AS p, CAST(sum(cnt) AS DOUBLE) AS n,
       |  CAST(sum(pos*(below + (cnt+1)/2.0)) AS DOUBLE) AS rp
       | FROM ${p}_rk),
       |${p}_cum AS (
       | SELECT pos,
       |  sum(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
       |  sum(cnt) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
       |  sum(pos) OVER () AS tot_pos
       | FROM ${p}_by),
       |${p}_ap AS (
       | SELECT sum(CAST(pos AS DOUBLE)/tot_pos * cum_tp/cum_n) AS ap FROM ${p}_cum),
       |${p}_cf AS (
       | SELECT
       |  count(*) FILTER (WHERE label = 1 AND s >= $tau) AS tp,
       |  count(*) FILTER (WHERE label = 0 AND s >= $tau) AS fp,
       |  count(*) FILTER (WHERE label = 1 AND s < $tau) AS fn,
       |  count(*) FILTER (WHERE label = 0 AND s < $tau) AS tn
       | FROM ${p}_scored),
       |${p}_row AS (
       | SELECT '$name' AS model,
       |  round(((rp - p*(p+1)/2.0) / (p*(n-p))) * 1000000.0) / 1000000.0 + 0.0 AS roc_auc,
       |  round((ap) * 1000000.0) / 1000000.0 + 0.0 AS pr_auc,
       |  round((CASE WHEN tp+fp > 0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0.0 END) * 1000000.0) / 1000000.0 + 0.0 AS prec,
       |  round((CASE WHEN tp+fn > 0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0.0 END) * 1000000.0) / 1000000.0 + 0.0 AS rec,
       |  round((CASE WHEN (CASE WHEN tp+fp > 0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0.0 END)
       |           + (CASE WHEN tp+fn > 0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0.0 END) > 0
       |    THEN 2.0 * (CASE WHEN tp+fp > 0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0.0 END)
       |             * (CASE WHEN tp+fn > 0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0.0 END)
       |           / ((CASE WHEN tp+fp > 0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0.0 END)
       |            + (CASE WHEN tp+fn > 0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0.0 END))
       |    ELSE 0.0 END) * 1000000.0) / 1000000.0 + 0.0 AS f1,
       |  round((CAST(fn AS DOUBLE)*1000.0 + CAST(fp AS DOUBLE)*10.0) * 100.0) / 100.0 + 0.0 AS cost
       | FROM ${p}_auc, ${p}_ap, ${p}_cf)""".stripMargin

  def oracle: Map[String, String] = Map(
    "q40_confusion" ->
      """WITH c AS (
        | SELECT
        |  count(*) FILTER (WHERE event_type = 'error' AND value/500.0 >= 0.2) AS tp,
        |  count(*) FILTER (WHERE event_type <> 'error' AND value/500.0 >= 0.2) AS fp,
        |  count(*) FILTER (WHERE event_type = 'error' AND value/500.0 < 0.2) AS fn,
        |  count(*) FILTER (WHERE event_type <> 'error' AND value/500.0 < 0.2) AS tn
        | FROM events)
        |SELECT tp, fp, fn, tn,
        | round((CASE WHEN tp+fp > 0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0.0 END) * 1000000.0) / 1000000.0 + 0.0 AS prec,
        | round((CASE WHEN tp+fn > 0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0.0 END) * 1000000.0) / 1000000.0 + 0.0 AS rec,
        | round((CASE WHEN (CASE WHEN tp+fp > 0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0.0 END)
        |          + (CASE WHEN tp+fn > 0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0.0 END) > 0
        |   THEN 2.0 * (CASE WHEN tp+fp > 0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0.0 END)
        |            * (CASE WHEN tp+fn > 0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0.0 END)
        |          / ((CASE WHEN tp+fp > 0 THEN CAST(tp AS DOUBLE)/(tp+fp) ELSE 0.0 END)
        |           + (CASE WHEN tp+fn > 0 THEN CAST(tp AS DOUBLE)/(tp+fn) ELSE 0.0 END))
        |   ELSE 0.0 END) * 1000000.0) / 1000000.0 + 0.0 AS f1,
        | round((CAST(tp+tn AS DOUBLE)/(tp+fp+fn+tn)) * 1000000.0) / 1000000.0 + 0.0 AS accuracy,
        | round((CASE WHEN tn+fp > 0 THEN CAST(tn AS DOUBLE)/(tn+fp) ELSE 0.0 END) * 1000000.0) / 1000000.0 + 0.0 AS specificity,
        | round((fn*1000.0 + fp*10.0) * 100.0) / 100.0 + 0.0 AS cost
        |FROM c""".stripMargin,

    "q41_roc_auc" ->
      """WITH by_score AS (
        | SELECT value AS s, count(*) AS cnt,
        |  sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS pos
        | FROM events GROUP BY value),
        |ranked AS (
        | SELECT s, cnt, pos,
        |  coalesce(sum(cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        | FROM by_score),
        |agg AS (
        | SELECT CAST(sum(pos) AS DOUBLE) AS p, CAST(sum(cnt) AS DOUBLE) AS n,
        |  CAST(sum(pos*(below + (cnt+1)/2.0)) AS DOUBLE) AS rp
        | FROM ranked)
        |SELECT round(((rp - p*(p+1)/2.0) / (p*(n-p))) * 1000000.0) / 1000000.0 + 0.0 AS roc_auc FROM agg""".stripMargin,

    "q42_pr_curve" ->
      """WITH by_score AS (
        | SELECT value AS s, count(*) AS cnt,
        |  sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS pos
        | FROM events GROUP BY value),
        |c AS (
        | SELECT s,
        |  sum(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
        |  sum(cnt) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |  sum(pos) OVER () AS tot_pos
        | FROM by_score)
        |SELECT round((s) * 1000000.0) / 1000000.0 + 0.0 AS threshold,
        | round((CAST(cum_tp AS DOUBLE)/cum_n) * 1000000.0) / 1000000.0 + 0.0 AS prec,
        | round((CAST(cum_tp AS DOUBLE)/tot_pos) * 1000000.0) / 1000000.0 + 0.0 AS rec
        |FROM c ORDER BY threshold DESC LIMIT 20""".stripMargin,

    "q43_best_f1" ->
      """WITH by_score AS (
        | SELECT value AS s, count(*) AS cnt,
        |  sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS pos
        | FROM events GROUP BY value),
        |c AS (
        | SELECT s,
        |  sum(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
        |  sum(cnt) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |  sum(pos) OVER () AS tot_pos
        | FROM by_score),
        |f AS (
        | SELECT s AS threshold,
        |  coalesce(2.0 * (CAST(cum_tp AS DOUBLE)/cum_n) * (CAST(cum_tp AS DOUBLE)/tot_pos)
        |   / ((CAST(cum_tp AS DOUBLE)/cum_n) + (CAST(cum_tp AS DOUBLE)/tot_pos)), 0.0) AS f1
        | FROM c)
        |SELECT round((threshold) * 1000000.0) / 1000000.0 + 0.0 AS threshold, round((f1) * 1000000.0) / 1000000.0 + 0.0 AS f1
        |FROM f ORDER BY f1 DESC, threshold LIMIT 1""".stripMargin,

    "q45_avg_precision" ->
      """WITH by_score AS (
        | SELECT value AS s, count(*) AS cnt,
        |  sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS pos
        | FROM events GROUP BY value),
        |c AS (
        | SELECT pos,
        |  sum(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
        |  sum(cnt) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |  sum(pos) OVER () AS tot_pos
        | FROM by_score)
        |SELECT round((sum(CAST(pos AS DOUBLE)/tot_pos * cum_tp/cum_n)) * 1000000.0) / 1000000.0 + 0.0 AS avg_precision
        |FROM c""".stripMargin,

    "q46_min_cost" ->
      """WITH by_score AS (
        | SELECT value AS s, count(*) AS cnt,
        |  sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS pos
        | FROM events GROUP BY value),
        |c AS (
        | SELECT s,
        |  sum(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
        |  sum(cnt) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |  sum(pos) OVER () AS tot_pos
        | FROM by_score)
        |SELECT round((s) * 1000000.0) / 1000000.0 + 0.0 AS threshold,
        | round(((tot_pos - cum_tp)*1000.0 + (cum_n - cum_tp)*10.0) * 100.0) / 100.0 + 0.0 AS cost
        |FROM c ORDER BY (tot_pos - cum_tp)*1000.0 + (cum_n - cum_tp)*10.0, s LIMIT 1""".stripMargin,

    "q47_recall_floor" ->
      """WITH by_score AS (
        | SELECT value AS s, count(*) AS cnt,
        |  sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS pos
        | FROM events GROUP BY value),
        |c AS (
        | SELECT s,
        |  sum(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
        |  sum(cnt) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |  sum(pos) OVER () AS tot_pos
        | FROM by_score)
        |SELECT round((s) * 1000000.0) / 1000000.0 + 0.0 AS threshold,
        | round((CAST(cum_tp AS DOUBLE)/cum_n) * 1000000.0) / 1000000.0 + 0.0 AS prec,
        | round((CAST(cum_tp AS DOUBLE)/tot_pos) * 1000000.0) / 1000000.0 + 0.0 AS rec
        |FROM c WHERE CAST(cum_tp AS DOUBLE)/tot_pos >= 0.9
        |ORDER BY CAST(cum_tp AS DOUBLE)/cum_n DESC, s LIMIT 1""".stripMargin,

    "q44_threshold_grid" ->
      """WITH g AS (SELECT unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS tau),
        |m AS (
        | SELECT tau,
        |  count(*) FILTER (WHERE event_type='error' AND value/500.0 >= tau) AS tp,
        |  count(*) FILTER (WHERE event_type<>'error' AND value/500.0 >= tau) AS fp,
        |  count(*) FILTER (WHERE event_type='error' AND value/500.0 < tau) AS fn
        | FROM events CROSS JOIN g GROUP BY tau)
        |SELECT tau,
        | round((coalesce(CAST(tp AS DOUBLE)/nullif(tp+fp,0), 0.0)) * 1000000.0) / 1000000.0 + 0.0 AS prec,
        | round((coalesce(CAST(tp AS DOUBLE)/nullif(tp+fn,0), 0.0)) * 1000000.0) / 1000000.0 + 0.0 AS rec
        |FROM m ORDER BY tau""".stripMargin,

    // the q107 scorer chain + time split + bins + smoothed PSI sum,
    // all re-derived
    "q111_drift_psi" ->
      """WITH base AS (
        | SELECT value*20.0 AS amt, hour(ts) AS h,
        |  (event_type = 'error') AS dev_missing,
        |  (event_type = 'signup') AS unusual,
        |  epoch_us(ts) AS us
        | FROM events),
        |m AS (SELECT (min(us) + max(us)) // 2 AS mid FROM base),
        |s0 AS (SELECT *, 1.0/(1.0 + exp(-0.003*(amt - 500.0))) AS b0 FROM base),
        |s1 AS (SELECT *, CASE WHEN amt > 5000 THEN least(b0 + 0.15, 0.95)
        |                      WHEN amt > 1000 THEN least(b0 + 0.08, 0.85)
        |                      ELSE b0 END AS b1 FROM s0),
        |s2 AS (SELECT *, CASE WHEN dev_missing THEN least(b1 + 0.05, 0.95) ELSE b1 END AS b2 FROM s1),
        |s3 AS (SELECT *, CASE WHEN unusual THEN least(b2 + 0.05, 0.95) ELSE b2 END AS b3 FROM s2),
        |sc AS (
        | SELECT *, CASE WHEN h < 5 OR h > 23 THEN least(b3 + 0.07, 0.95) ELSE b3 END AS heuristic,
        |  least(1.0, amt/10000.0) AS model
        | FROM s3),
        |bl AS (
        | SELECT least(1.0, greatest(0.0, model*0.4 + heuristic*0.6)) AS b, us
        | FROM sc),
        |bn AS (
        | SELECT CAST(greatest(least(floor(b*10), 9), 0) AS BIGINT) AS bin, (us > mid) AS cur
        | FROM bl CROSS JOIN m),
        |c AS (
        | SELECT bin, count(*) FILTER (WHERE NOT cur) AS n_ref,
        |  count(*) FILTER (WHERE cur) AS n_cur
        | FROM bn GROUP BY bin),
        |spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
        |f AS (
        | SELECT spine.bin, coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        | FROM spine LEFT JOIN c ON spine.bin = c.bin),
        |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM f),
        |k AS (
        | SELECT bin, n_ref, n_cur,
        |  ((CAST(n_cur+1 AS DOUBLE)/(tc+10)) - (CAST(n_ref+1 AS DOUBLE)/(tr+10)))
        |   * ln((CAST(n_cur+1 AS DOUBLE)/(tc+10)) / (CAST(n_ref+1 AS DOUBLE)/(tr+10))) AS c
        | FROM f CROSS JOIN t),
        |tot AS (SELECT sum(c) AS psi FROM k)
        |SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
        | round(c * 1000000.0) / 1000000.0 + 0.0 AS psi_contrib,
        | round(psi * 1000000.0) / 1000000.0 + 0.0 AS psi
        |FROM k CROSS JOIN tot ORDER BY bin""".stripMargin,

    // same scorer chain as q111/q107; then reliability bins, ECE from
    // the PRE-QUANTIZED per-bin means (quantize-before-derive), Brier
    // from the raw squared errors
    "q115_calibration" ->
      """WITH base AS (
        | SELECT value*20.0 AS amt, hour(ts) AS h,
        |  (event_type = 'error') AS dev_missing,
        |  (event_type = 'signup') AS unusual
        | FROM events),
        |s0 AS (SELECT *, 1.0/(1.0 + exp(-0.003*(amt - 500.0))) AS b0 FROM base),
        |s1 AS (SELECT *, CASE WHEN amt > 5000 THEN least(b0 + 0.15, 0.95)
        |                      WHEN amt > 1000 THEN least(b0 + 0.08, 0.85)
        |                      ELSE b0 END AS b1 FROM s0),
        |s2 AS (SELECT *, CASE WHEN dev_missing THEN least(b1 + 0.05, 0.95) ELSE b1 END AS b2 FROM s1),
        |s3 AS (SELECT *, CASE WHEN unusual THEN least(b2 + 0.05, 0.95) ELSE b2 END AS b3 FROM s2),
        |sc AS (
        | SELECT *, CASE WHEN h < 5 OR h > 23 THEN least(b3 + 0.07, 0.95) ELSE b3 END AS heuristic,
        |  least(1.0, amt/10000.0) AS model
        | FROM s3),
        |bl AS (
        | SELECT least(1.0, greatest(0.0, model*0.4 + heuristic*0.6)) AS s,
        |  CAST(dev_missing AS BIGINT) AS y
        | FROM sc),
        |bn AS (
        | SELECT CAST(greatest(least(floor(s*10), 9), 0) AS BIGINT) AS bin, s, y
        | FROM bl),
        |c AS (
        | SELECT bin, count(*) AS n, sum(s) AS sum_s, sum(y) AS sum_y,
        |  sum((s - y)*(s - y)) AS sum_sq
        | FROM bn GROUP BY bin),
        |spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
        |f AS (
        | SELECT spine.bin, coalesce(n, 0) AS n,
        |  CASE WHEN coalesce(n, 0) > 0
        |    THEN round(sum_s / n * 1000000.0) / 1000000.0 + 0.0 END AS mean_score,
        |  CASE WHEN coalesce(n, 0) > 0
        |    THEN round(CAST(sum_y AS DOUBLE) / n * 1000000.0) / 1000000.0 + 0.0 END AS frac_pos,
        |  coalesce(sum_sq, 0.0) AS sum_sq
        | FROM spine LEFT JOIN c ON spine.bin = c.bin),
        |t AS (
        | SELECT sum(n) AS tot_n, sum(sum_sq) AS tot_sq,
        |  sum(CASE WHEN n > 0 THEN abs(mean_score - frac_pos) * n END) AS tot_e
        | FROM f)
        |SELECT bin, CAST(n AS BIGINT) AS n, mean_score, frac_pos,
        | round(tot_e / tot_n * 1000000.0) / 1000000.0 + 0.0 AS ece,
        | round(tot_sq / tot_n * 1000000.0) / 1000000.0 + 0.0 AS brier
        |FROM f CROSS JOIN t ORDER BY bin""".stripMargin,

    "q144_model_leaderboard" -> {
      val vLin = "least(1.0, value/500.0)"
      val hMix = "((hour(ts)*7) % 24)/24.0"
      // mirrors FraudModel.weightedEnsemble: sum(c*w)/totalW
      val blend = s"(($vLin)*3.0 + ($hMix)*1.0)/4.0"
      s"""WITH
         |${lbBlock("vl", "value_linear", vLin, 0.4)},
         |${lbBlock("hm", "hour_mix", hMix, 0.4)},
         |${lbBlock("bl", "blend_3_1", blend, 0.4)}
         |SELECT * FROM vl_row
         |UNION ALL SELECT * FROM hm_row
         |UNION ALL SELECT * FROM bl_row
         |ORDER BY roc_auc DESC""".stripMargin
    }
  )
}
