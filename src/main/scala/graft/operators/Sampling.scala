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

  /** Stratified sample: an independent rate per stratum value (pandas
    * groupby-sample / sampleBy capability, without their partition- or
    * seed-layout dependence). Strata absent from `fractions` drop. */
  def stratified(df: DataFrame, strata: Column, key: Column,
                 fractions: Map[String, Double], salt: String = ""): DataFrame =
    df.filter(fractions.foldLeft(lit(false): Column) {
      case (acc, (s, f)) => when(strata === s, keepRow(key, f, salt)).otherwise(acc)
    })
}
