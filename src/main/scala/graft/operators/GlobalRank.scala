package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global 0-based rank for a BOUNDED frame without an unpartitioned
  * window (the `Window.orderBy` with no partition is the
  * single-reducer shape Spark warns about). Round 13: the rank is a
  * driver-side fold over a sorted `collect()` — the input is ≤K rows
  * by contract (label dictionaries are |categories| rows, Zipf heads
  * are top-K; both broadcast downstream), so collecting is the same
  * boundedness bet the percentile gates make (`Util.rankGate`'s ≤B-row
  * driver fold). The previous shape (coalesce(1) + rdd.zipWithIndex)
  * gave identical values but severed the Catalyst plan at the RDD
  * boundary: no whole-stage codegen across the rank, an extra
  * scheduled job, and no exchange reuse with upstream aggregates. The
  * local relation this produces folds/broadcasts for free. For
  * UNBOUNDED inputs use the bucketed rank construction
  * (`queries/Util.rankGate`) instead.
  */
object GlobalRank {

  /** Append `out` (LongType, starting at `startAt`) holding each row's
    * rank under `sortCols`. Sort happens in Spark (so arbitrary Column
    * orderings — desc, multi-key — keep exact engine semantics);
    * `collect()` on a sorted frame preserves the order, and ranks are
    * assigned in that order on the driver.
    *
    * `maxRows` guards the boundedness contract (round-13 advice): the
    * collect is a TakeOrdered of maxRows+1, so a caller that violates
    * the ≤K bet fails FAST with a named error instead of a driver OOM.
    * Callers that know a tighter bound (Zipf's topK) pass it. */
  def zipIndexed(df: DataFrame, sortCols: Seq[Column], out: String,
                 startAt: Long = 0L, maxRows: Int = 1 << 20): DataFrame = {
    val rows = df.sort(sortCols: _*).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"GlobalRank.zipIndexed input exceeds its bounded-frame contract " +
        s"(> $maxRows rows) - use queries/Util.rankGate for unbounded inputs")
    val schema = StructType(df.schema.fields :+
      StructField(out, LongType, nullable = false))
    val ranked = rows.iterator.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (startAt + i))
    }.toArray
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(ranked: _*), schema)
  }
}
