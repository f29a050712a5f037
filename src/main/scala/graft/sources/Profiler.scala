package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset summary probe (SURVEY.md §2.1 S6, §2.2 P3).
  *
  * Capability match for the reference's `get_data_summary`
  * (`src/data/loader.py:197-207`): shape, dtype classes, per-column null
  * counts — computed in ONE pass over the data (a single wide aggregate),
  * not a loop of per-column jobs.
  */
object Profiler {

  /** dtype-driven column classification (pandas select_dtypes parity,
    * `src/data/preprocessor.py:38-39`). */
  def numericColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq

  def stringColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }.toSeq

  /** One-row summary: n_rows, n_cols, per-column null counts, and the
    * overall null fraction. */
  def summary(df: DataFrame): DataFrame = {
    val nullCounts = df.columns.map(c =>
      count(when(col(c).isNull, lit(1))).as(s"null_$c"))
    val totalNulls = df.columns.map(c =>
      count(when(col(c).isNull, lit(1)))).reduce(_ + _)
    df.agg(
      count(lit(1)).as("n_rows"),
      (Seq(lit(df.columns.length).cast("long").as("n_cols"),
        // empty input → 0.0, not an ANSI divide-by-zero
        when(count(lit(1)) > 0,
          totalNulls.cast("double") / (count(lit(1)) * df.columns.length))
          .otherwise(0.0).as("null_fraction")) ++
        nullCounts.toSeq): _*)
  }
}
