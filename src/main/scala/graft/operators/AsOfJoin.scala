package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (beyond-reference; SURVEY.md §2.3 lists it absent): for
  * each left row, attach the latest right row of the same key with
  * right.ts ≤ left.ts.
  *
  * Spark-first design: instead of a range join (quadratic blowup on hot
  * keys) the two sides UNION into one stream tagged by side; a single
  * (key)-partitioned window carries the last non-null right payload
  * forward (`last(..., ignoreNulls)` over an unbounded-preceding frame).
  * Right rows sort before left rows at equal timestamps, so the match is
  * inclusive (ts_r = ts_l counts) — DuckDB `ASOF JOIN ... ON l.ts >= r.ts`
  * semantics. One shuffle, linear work, skew-safe.
  */
object AsOfJoin {

  /** Left as-of join. `payload` columns from `right` are attached with
    * `prefix`; left rows with no earlier right row get nulls. Both
    * inputs need (key, ts). Duplicate right rows at the same (key, ts)
    * tie-break on the payload struct itself (field-wise ordering), so
    * the carried match is deterministic across partitionings and core
    * counts — payload columns must therefore be orderable types. */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val rv = struct(payload.map(col): _*)
    val taggedR = right.select(
      Seq(col(key), col(ts), lit(0).as("__side"), rv.as("__rv")) ++
        left.columns.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedL = left.select(
      Seq(col(key), col(ts), lit(1).as("__side"),
        lit(null).cast(taggedR.schema("__rv").dataType).as("__rv")) ++
        left.columns.filterNot(c => c == key || c == ts).map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedL.unionByName(taggedR)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
    val outCols =
      left.columns.map(col).toSeq ++
        payload.map(p => col(s"__last.$p").as(s"$prefix$p"))
    carried.filter(col("__side") === 1).select(outCols: _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row of
    * the same key with right.ts >= left.ts (DuckDB `ASOF JOIN ... ON
    * l.ts <= r.ts` semantics; inclusive at equal timestamps). Mirror of
    * `leftAsOf`: same one-shuffle union-stream design, with the window
    * frame flipped to current-row → unbounded-following and the first
    * non-null right payload carried BACKWARD. Right rows sort after
    * left rows at equal ts (side 1 vs 0 reversed here) so ts_r = ts_l
    * still matches; ties among right rows at one (key, ts) break on the
    * payload struct, deterministic at any partitioning. */
  def leftAsOfForward(left: DataFrame, right: DataFrame, key: String,
                      ts: String, payload: Seq[String],
                      prefix: String = "asof_"): DataFrame = {
    val rv = struct(payload.map(col): _*)
    val taggedR = right.select(
      Seq(col(key), col(ts), lit(1).as("__side"), rv.as("__rv")) ++
        left.columns.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedL = left.select(
      Seq(col(key), col(ts), lit(0).as("__side"),
        lit(null).cast(taggedR.schema("__rv").dataType).as("__rv")) ++
        left.columns.filterNot(c => c == key || c == ts).map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__rv"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = taggedL.unionByName(taggedR)
      .withColumn("__first", first(col("__rv"), ignoreNulls = true).over(w))
    val outCols =
      left.columns.map(col).toSeq ++
        payload.map(p => col(s"__first.$p").as(s"$prefix$p"))
    carried.filter(col("__side") === 0).select(outCols: _*)
  }
}
