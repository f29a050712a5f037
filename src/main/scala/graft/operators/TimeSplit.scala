package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chronological train/val/test split (SURVEY.md §2.5 W13).
  *
  * Capability match for the reference's positional 70/15/15 split
  * (`src/data/preprocessor.py:86-98`) WITHOUT a single-partition global
  * sort: we find the two boundary keys with TakeOrderedAndProject
  * (orderBy + limit/offset — a distributed top-k, no full shuffle of the
  * data), then assign splits with a plain comparison filter that pushes
  * down to the scan. At cluster scale the exact-positional boundary can be
  * swapped for `approxQuantile` cutoffs; semantics documented either way.
  */
object TimeSplit {

  /** Returns df with a `split` column ∈ {train, val, test}.
    * Ordering key must be unique: (ts, id) with id a unique tiebreaker.
    * Positional semantics: rows with 1-based rank ≤ floor(f1·n) → train,
    * ≤ floor(f2·n) → val, else test — matching a row_number() formulation.
    */
  def assign(df: DataFrame, ts: Column, id: Column,
             f1: Double = 0.70, f2: Double = 0.85): DataFrame = {
    val n = df.count()
    val k1 = math.floor(f1 * n).toLong
    val k2 = math.floor(f2 * n).toLong
    // the exact-positional variant materializes a top-k boundary; past
    // Int range use assignApprox (quantile cutoffs) instead
    require(k2 <= Int.MaxValue,
      s"exact split boundary $k2 exceeds Int range - use assignApprox at this scale")
    val keyed = df.select(ts.as("__ts"), id.as("__id"))
    def boundary(k: Long): Option[(java.sql.Timestamp, Long)] =
      if (k <= 0) None
      else keyed.orderBy(col("__ts"), col("__id")).offset((k - 1).toInt).limit(1)
        .collect().headOption.map(r => (r.getTimestamp(0), r.getLong(1)))
    val b1 = boundary(k1)
    val b2 = boundary(k2)
    def le(b: Option[(java.sql.Timestamp, Long)]): Column = b match {
      case Some((t, i)) => ts < lit(t) || (ts === lit(t) && id <= lit(i))
      case None         => lit(false)
    }
    df.withColumn("split",
      when(le(b1), "train").when(le(b2), "val").otherwise("test"))
  }

  /** Scale path: boundary timestamps via approxQuantile (one
    * Greenwald-Khanna pass, no top-k heap over 0.7·n rows). Split sizes
    * are within `relativeError` of the exact fractions — the right trade
    * at 100 TB where the exact row-positional boundary is meaningless
    * anyway. Same output contract as `assign`. */
  def assignApprox(df: DataFrame, tsCol: String,
                   f1: Double = 0.70, f2: Double = 0.85,
                   relativeError: Double = 0.001): DataFrame = {
    val us = s"__${tsCol}_us"
    val withUs = df.withColumn(us, unix_micros(col(tsCol)))
    val Array(c1, c2) = withUs.stat.approxQuantile(us, Array(f1, f2), relativeError)
    withUs.withColumn("split",
      when(col(us) <= c1, "train").when(col(us) <= c2, "val").otherwise("test"))
      .drop(us)
  }
}
