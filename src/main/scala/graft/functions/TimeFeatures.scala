package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Temporal feature expressions (SURVEY.md §2.8 F1-F4).
  *
  * Capability match for the reference's temporal stage
  * (`src/features/engineer.py:18-57`): date parts, cyclical encodings and
  * time-of-day flags — as pure Column expressions so they stay inside
  * whole-stage codegen (constant folding collapses the 2π/period factors).
  */
object TimeFeatures {

  /** Day-of-week with pandas convention Mon=0..Sun=6.
    * Spark's `dayofweek` is Sun=1..Sat=7; shift for parity
    * (reference `src/features/engineer.py:35` uses pandas `.dt.dayofweek`).
    */
  def pandasDayOfWeek(ts: Column): Column = (dayofweek(ts) + 5) % 7

  /** Epoch-seconds offset + fixed origin → timestamp
    * (reference `src/features/engineer.py:27-31`). */
  def fromOffsetSeconds(seconds: Column, originEpochSec: Long): Column =
    timestamp_seconds(seconds + lit(originEpochSec))

  /** sin/cos cyclical encoding (reference `engineer.py:41-48`). */
  def cyclicalSin(c: Column, period: Double): Column =
    sin(c * lit(2.0 * math.Pi / period))
  def cyclicalCos(c: Column, period: Double): Column =
    cos(c * lit(2.0 * math.Pi / period))

  /** Time-of-day flags (reference `engineer.py:51-57`), 0/1 ints. */
  def isWeekend(ts: Column): Column  = (pandasDayOfWeek(ts) >= 5).cast("int")
  def isNight(ts: Column): Column    = (hour(ts) >= 22 || hour(ts) <= 6).cast("int")
  def isBusinessHours(ts: Column): Column =
    (hour(ts) >= 9 && hour(ts) <= 17).cast("int")
  def isMonthStart(ts: Column): Column = (dayofmonth(ts) <= 5).cast("int")
  def isMonthEnd(ts: Column): Column   = (dayofmonth(ts) >= 25).cast("int")

  /** All temporal derivations for an event-time column, as (name, expr)
    * pairs — callers splat into one `select` (not chained `withColumn`s,
    * which bloat analysis on wide schemas; SURVEY.md §4.1). */
  def all(ts: Column, prefix: String = ""): Seq[(String, Column)] = {
    val h = hour(ts).cast("int")
    val dow = pandasDayOfWeek(ts)
    Seq(
      s"${prefix}hour"        -> h,
      s"${prefix}dow"         -> dow,
      s"${prefix}day"         -> dayofmonth(ts),
      s"${prefix}month"       -> month(ts),
      s"${prefix}hour_sin"    -> cyclicalSin(h.cast("double"), 24.0),
      s"${prefix}hour_cos"    -> cyclicalCos(h.cast("double"), 24.0),
      s"${prefix}dow_sin"     -> cyclicalSin(dow.cast("double"), 7.0),
      s"${prefix}dow_cos"     -> cyclicalCos(dow.cast("double"), 7.0),
      s"${prefix}month_sin"   -> cyclicalSin(month(ts).cast("double"), 12.0),
      s"${prefix}month_cos"   -> cyclicalCos(month(ts).cast("double"), 12.0),
      s"${prefix}is_weekend"  -> isWeekend(ts),
      s"${prefix}is_night"    -> isNight(ts),
      s"${prefix}is_business" -> isBusinessHours(ts),
      s"${prefix}is_month_start" -> isMonthStart(ts),
      s"${prefix}is_month_end"   -> isMonthEnd(ts)
    )
  }
}
