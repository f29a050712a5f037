package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling (training-data curation:
  * held-out carve-outs, per-source rate control, debug subsets).
  *
  * `df.sample()` is seed-stable only for a FIXED partition layout — a
  * repartition, AQE re-plan, or engine change silently reshuffles the
  * sample. Here membership is a pure function of the ROW KEY: keep a row
  * iff md5(salt || key) sorts below the fraction-scaled 8-hex-digit
  * threshold. The same predicate written in any engine with md5 (DuckDB,
  * Trino, Postgres) selects the identical rows, so samples are
  * reproducible across engines, partitionings and reruns — and
  * embarrassingly parallel (a codegen'd per-row filter, no shuffle).
  * Distinct `salt` values give independent samples (nested carve-outs
  * compose: salt="a" 10% then salt="b" 10% of that is ~1%).
  */
object Sampling {

  /** floor(fraction·2^32) as 8 lowercase hex digits — the string-order
    * threshold over the first 8 md5 chars. */
  private[operators] def hexThreshold(fraction: Double): String =
    f"${(fraction * 4294967296.0).toLong}%08x"

  /** Membership predicate: P(keep) = floor(fraction·2^32)/2^32, exactly
    * reproducible from the key alone. A non-empty salt is joined to the
    * key with a ':' delimiter — bare concatenation would make boundary-
    * sharing pairs collide (salt "a1" + key "2" == salt "a" + key "12"),
    * so numeric-suffixed fold salts over numeric keys would not be
    * independent. Mirror the delimiter in any cross-engine twin:
    * `md5(salt || ':' || CAST(key AS VARCHAR))`. The empty salt hashes
    * the bare key (`md5(CAST(key AS VARCHAR))`). */
  /** The membership hash keepRow thresholds on. */
  private[operators] def memberHash(key: Column, salt: String): Column =
    if (salt.isEmpty) md5(key.cast("string"))
    else md5(concat(lit(salt), lit(":"), key.cast("string")))

  def keepRow(key: Column, fraction: Double, salt: String = ""): Column =
    if (fraction >= 1.0) lit(true)
    else if (fraction <= 0.0) lit(false)
    else memberHash(key, salt) < lit(hexThreshold(fraction))

  /** Bernoulli sample by key. */
  def sample(df: DataFrame, key: Column, fraction: Double,
             salt: String = ""): DataFrame =
    df.filter(keepRow(key, fraction, salt))

  /** WEIGHTED Bernoulli: P(keep) = clamp(weight, 0, 1) evaluated per
    * row — quality-proportional downsampling (keep good documents at a
    * higher rate) with the same engine/layout independence as keepRow.
    * The per-row threshold compares numerically (first 8 md5 hex digits
    * parsed as an integer vs floor(weight·2^32)) because a string
    * threshold cannot vary per row. DuckDB twin:
    * CAST('0x' || substr(md5(key),1,8) AS UBIGINT)
    *   < floor(least(greatest(w,0),1) * 4294967296.0). */
  def weightedKeep(key: Column, weight: Column, salt: String = ""): Column =
    conv(substring(memberHash(key, salt), 1, 8), 16, 10).cast("long") <
      floor(least(greatest(weight, lit(0.0)), lit(1.0)) * 4294967296.0)

  /** Weighted sample: rate given by `weight` (clamped to [0,1]). */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     salt: String = ""): DataFrame =
    df.filter(weightedKeep(key, weight, salt))

  /** Temperature-based mixture rates (the `share^α` data-mixing rule:
    * α=1 preserves natural proportions, α→0 approaches uniform over
    * sources, α=0.5 is the classic sqrt-temperature). Input: one row
    * per source with its row count; output: (source, rate) where
    * rate_i = min(1, p_i · budget·N / n_i) and p_i ∝ tempWeight(n_i/N)
    * — filter the corpus with [[weightedKeep]] on the joined rate.
    *
    * Cross-engine determinism is designed in, not hoped for:
    * `tempWeight` outputs are converted to integer NANO-UNITS
    * (round(w·1e9) as long) BEFORE normalization, so the weight sum is
    * an exact integer sum (float sums are accumulation-order-dependent
    * — the one thing two engines never agree on), and every remaining
    * division has bit-identical operands in both engines. Callers
    * wanting oracle parity must pass a correctly-rounded tempWeight
    * (`sqrt` is IEEE-exact; `pow(x, α)` for general α is NOT guaranteed
    * bit-equal across libms — engine-only use).
    *
    * Scale: `counts` is one row per SOURCE (dozens), so every frame
    * here is driver-trivial; the corpus-side cost is the same pure
    * key-function filter as every sampler in this file — no shuffle. */
  def temperatureRates(counts: DataFrame, srcCol: String, nCol: String,
                       budgetFraction: Double,
                       tempWeight: Column => Column): DataFrame = {
    val totals = counts.agg(sum(col(nCol)).as("__N"))
    val w = counts.crossJoin(broadcast(totals))
      .select(col(srcCol), col(nCol), col("__N"),
        round(tempWeight(col(nCol).cast("double") / col("__N").cast("double"))
          * 1e9).cast("long").as("__w"))
    val wsum = w.agg(sum(col("__w")).as("__ws"))
    w.crossJoin(broadcast(wsum))
      .select(col(srcCol),
        least(lit(1.0),
          (col("__w").cast("double") / col("__ws").cast("double"))
            * lit(budgetFraction) * col("__N").cast("double")
            / col(nCol).cast("double")).as("rate"))
  }

  /** Stratified sample: an independent rate per stratum value (pandas
    * groupby-sample / sampleBy capability, without their partition- or
    * seed-layout dependence). Strata absent from `fractions` drop. */
  def stratified(df: DataFrame, strata: Column, key: Column,
                 fractions: Map[String, Double], salt: String = ""): DataFrame =
    df.filter(fractions.foldLeft(lit(false): Column) {
      case (acc, (s, f)) => when(strata === s, keepRow(key, f, salt)).otherwise(acc)
    })

  /** Deterministic k-fold assignment: fold(key) = (first 8 md5 hex
    * digits of salt:key) mod k — the cross-validation splitter with the
    * same guarantees as every sampler here (pure key function: stable
    * under repartition/AQE/engine change, zero shuffle, and any engine
    * can recompute which fold a row landed in). Within any stratum the
    * md5 prefix is uniform, so folds are balanced per class without a
    * per-stratum pass — "stratified enough" by hashing, measured rather
    * than enforced (emit fold×stratum counts and check, q116).
    * DuckDB twin: CAST('0x' || substr(md5(salt || ':' || CAST(key AS
    * VARCHAR)), 1, 8) AS UBIGINT) % k. */
  def foldOf(key: Column, k: Int, salt: String = "fold"): Column = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    conv(substring(memberHash(key, salt), 1, 8), 16, 10).cast("long") % k
  }

  /** k deterministic pseudo-uniform draws from a dense id space [0, n)
    * per anchor — the negative-sampling primitive for contrastive
    * training pairs (anchor, positive, k random negatives). Draw j for
    * anchor a is md5-prefix(salt : a : j) mod n: engine/layout/rerun
    * independent like every hash here, and each (anchor, j) is an
    * independent draw. Collisions with an anchor's own positives are
    * the CALLER's contract to reject (a join against ownership — the
    * standard rejection step; both engines reject identically).
    * Output: (anchor, sample_idx, cand_id); the caller joins cand_id
    * back to the corpus (shuffle bounded by anchors×k, never corpus²). */
  def idDraws(anchors: DataFrame, anchor: Column, k: Int, n: Long,
              salt: String = "neg"): DataFrame = {
    require(k >= 1 && n >= 1, s"idDraws needs k >= 1 and n >= 1, got k=$k n=$n")
    anchors.select(anchor.as("anchor"))
      .withColumn("sample_idx", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("cand_id",
        conv(substring(memberHash(
          concat(col("anchor").cast("string"), lit(":"),
            col("sample_idx").cast("string")), salt), 1, 8), 16, 10)
          .cast("long") % n)
  }
}
