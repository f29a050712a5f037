package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval (range) join — beyond-reference; the classic
  * time-window join a training-data pipeline needs ("events within 1 h
  * after each purchase") that Spark would otherwise plan as an equi-join
  * on the key followed by a filter, concentrating a hot key's entire
  * history into one task.
  *
  * Scale design: band the time axis into buckets of the window span.
  * Each RIGHT row lands in exactly one (key, bucket); each LEFT row's
  * window [lts+lo, lts+hi] covers at most ceil(span/w)+1 = 2 buckets, so
  * the left side fans out ≤ 2×. The join key becomes (key, bucket) —
  * a hot key's rows spread across its time range instead of one reducer
  * — and the exact range predicate filters within the matched bucket.
  * Same shape as the Databricks/DuckDB range-join optimizations (public
  * technique), expressed with explode + equi-join so Catalyst plans a
  * plain shuffled hash/sort-merge join.
  */
object RangeJoin {

  /** floor(x / w) that is exact on longs and correct for negative x
    * (SQL long division truncates toward zero; pmod is non-negative).
    * x - pmod(x, w) is an exact multiple of w, and epoch-micros scale
    * values stay under 2^53, so the double division is exact before the
    * cast back to long. */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / lit(w)).cast("long")

  /** Inner interval join: rows (l, r) with `l.key = r.key` and
    * `r.ts ∈ [l.ts + lo, l.ts + hi]` (bounds inclusive; use ±1 at the
    * caller for open ends on integer time). Both `ts` columns must be
    * LONG (e.g. `unix_micros(ts)`); column names of the two inputs must
    * be disjoint apart from `key`. `hi - lo` must be positive; the band
    * width is the window span, so left fan-out is exactly ≤ 2. */
  def bandedIntervalJoin(left: DataFrame, right: DataFrame, key: String,
                         leftTs: String, rightTs: String,
                         lo: Long, hi: Long): DataFrame = {
    require(hi > lo, s"empty interval: lo=$lo hi=$hi")
    val w = hi - lo
    val lb = left.withColumn("__bucket",
      explode(sequence(floorDiv(col(leftTs) + lo, w),
        floorDiv(col(leftTs) + hi, w))))
    val rb = right.withColumn("__bucket", floorDiv(col(rightTs), w))
    lb.join(rb, Seq(key, "__bucket"))
      .filter(col(rightTs) >= col(leftTs) + lo &&
        col(rightTs) <= col(leftTs) + hi)
      .drop("__bucket")
  }
}
