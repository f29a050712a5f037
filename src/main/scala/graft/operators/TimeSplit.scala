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
  * down to the scan. Above `exactMaxRows` the exact-positional boundary
  * is meaningless anyway (it still pushes ~0.85·n rows through a top-k
  * heap), so `assign` automatically reroutes to the approxQuantile path.
  */
object TimeSplit {

  /** Above this row count `assign` switches to `assignApprox`
    * automatically: the exact path's top-k boundary materializes
    * O(f2·n) rows through a single heap — fine at test scale, a
    * scale-killer on a 100 TB table. */
  val DefaultExactMaxRows: Long = 10L * 1000 * 1000

  /** Returns df with a `split` column ∈ {train, val, test}.
    * Ordering key must be unique: (ts, id) with id a unique tiebreaker.
    * Positional semantics: rows with 1-based rank ≤ floor(f1·n) → train,
    * ≤ floor(f2·n) → val, else test — matching a row_number() formulation.
    * Boundary values are read generically, so ts/id may be any orderable,
    * literal-able types (timestamp, date, numeric, string).
    */
  def assign(df: DataFrame, ts: Column, id: Column,
             f1: Double = 0.70, f2: Double = 0.85,
             exactMaxRows: Long = DefaultExactMaxRows): DataFrame = {
    val n = df.count()
    // reroute only when the key quantiles sensibly (numeric/timestamp/
    // date — see quantileKey); string keys keep the exact path at any
    // size rather than crashing on an all-null cast
    if (n > exactMaxRows && isQuantileable(keyType(df, ts)))
      return assignApprox(df, ts, f1, f2)
    val k1 = math.floor(f1 * n).toLong
    val k2 = math.floor(f2 * n).toLong
    require(k2 <= Int.MaxValue,
      s"exact split boundary $k2 exceeds Int range - use assignApprox at this scale")
    val keyed = df.select(ts.as("__ts"), id.as("__id"))
    // both boundary top-ks in ONE action: union the two (offset, limit 1)
    // plans, tagged by k — halves the job count (each boundary is a full
    // TakeOrdered pass over the keys)
    def boundaryPlan(k: Long) =
      keyed.orderBy(col("__ts"), col("__id")).offset((k - 1).toInt).limit(1)
        .withColumn("__k", lit(k))
    val ks = Seq(k1, k2).filter(_ > 0).distinct
    val found: Map[Long, (Any, Any)] = ks.map(boundaryPlan)
      .reduceOption(_ unionAll _)
      .map(_.collect().map(r => r.getAs[Long]("__k") -> ((r.get(0), r.get(1)))).toMap)
      .getOrElse(Map.empty)
    val b1 = found.get(k1)
    val b2 = found.get(k2)
    def le(b: Option[(Any, Any)]): Column = b match {
      case Some((t, i)) => ts < lit(t) || (ts === lit(t) && id <= lit(i))
      case None         => lit(false)
    }
    df.withColumn("split",
      when(le(b1), "train").when(le(b2), "val").otherwise("test"))
  }

  /** Scale path: boundary cutoffs via approxQuantile (one
    * Greenwald-Khanna pass, no top-k heap over 0.85·n rows). Split sizes
    * are within `relativeError` of the exact fractions — the right trade
    * at 100 TB where the exact row-positional boundary is meaningless
    * anyway. Same output contract as `assign`. Timestamps quantile over
    * epoch seconds (cast to double — monotone), numerics as-is. */
  def assignApprox(df: DataFrame, ts: Column,
                   f1: Double = 0.70, f2: Double = 0.85,
                   relativeError: Double = 0.001): DataFrame = {
    // guard the key type up front: a string key would either throw an
    // opaque ANSI cast error or (all-null cast) return an empty
    // quantile array and a MatchError — name the supported types instead
    val kt = keyType(df, ts)
    require(isQuantileable(kt),
      s"assignApprox needs a numeric, timestamp, or date ordering key, got $kt " +
        "- string keys must use the exact path in TimeSplit.assign")
    val key = "__split_key"
    val withKey = df.withColumn(key, quantileKey(ts, kt))
    val cuts = withKey.stat.approxQuantile(key, Array(f1, f2), relativeError)
    require(cuts.length == 2,
      "assignApprox found no quantiles - the ordering key is empty or all null")
    val Array(c1, c2) = cuts
    withKey.withColumn("split",
      when(col(key) <= c1, "train").when(col(key) <= c2, "val").otherwise("test"))
      .drop(key)
  }

  /** Column-name convenience overload (kept for existing callers). */
  def assignApprox(df: DataFrame, tsCol: String): DataFrame =
    assignApprox(df, col(tsCol), 0.70, 0.85, 0.001)

  private def keyType(df: DataFrame, ts: Column) =
    df.select(ts.as("__t")).schema.head.dataType

  /** One definition of "quantiles sensibly" shared by assign's
    * auto-reroute and assignApprox's acceptance check. Date keys are
    * quantileable via a monotone epoch-day cast (see quantileKey) —
    * a plain double cast on DateType is not legal SQL. */
  private def isQuantileable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.TimestampType  => true
      case org.apache.spark.sql.types.DateType       => true
      case _                                          => false
    }

  /** Monotone double image of the ordering key for approxQuantile:
    * timestamps cast to epoch seconds, dates go through unix_date
    * (days since epoch), numerics cast directly. */
  private def quantileKey(ts: Column,
                          dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.DateType => unix_date(ts).cast("double")
      case _                                    => ts.cast("double")
    }
}
