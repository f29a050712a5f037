package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global 0-based rank for a BOUNDED frame without an unpartitioned
  * window (round-12 plan-hygiene sweep: `Window.orderBy` with no
  * partition is the single-reducer shape Spark warns about, and three
  * call sites had hand-rolled the same replacement). The frame is
  * coalesced to ONE partition and sorted within it, then zipWithIndex
  * assigns ranks in order — explicit about the boundedness contract
  * (label dictionaries are |categories| rows, Zipf heads are top-K;
  * both broadcast downstream), and with a single partition zipWithIndex
  * needs no extra count job. For UNBOUNDED inputs use the bucketed
  * rank construction (`queries/Util.rankGate`) instead.
  */
object GlobalRank {

  /** Append `out` (LongType, starting at `startAt`) holding each row's
    * rank under `sortCols`. */
  def zipIndexed(df: DataFrame, sortCols: Seq[Column], out: String,
                 startAt: Long = 0L): DataFrame = {
    val sorted = df.coalesce(1).sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(out, LongType, nullable = false))
    df.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (startAt + i))
      }, schema)
  }
}
