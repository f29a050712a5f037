package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F13 string formatting (SURVEY.md §2.8) — the reference's
  * human-display helpers as pure Column expressions:
  * `format_number` K/M suffixing (`src/utils/helpers.py:132-148`),
  * `"${:,.2f}"` currency and `"{:.4f}"` fixed-decimal maps
  * (`streamlit_app.py:471-473`).
  *
  * Cross-engine parity note: format inputs should be quantized first
  * (`Util.qz`) — a 2-decimal-quantized double has no representable
  * half-way case at 2 decimals, so HALF_UP (Java/Spark) and round-half-
  * even (C printf/DuckDB) produce identical strings. */
object Formatting {

  /** `"${:,.2f}"`: dollar sign + comma-grouped 2-decimal amount. */
  def currency(c: Column): Column = concat(lit("$"), format_number(c, 2))

  /** `"{:.df}"`: fixed decimals, no grouping. */
  def fixed(c: Column, decimals: Int): Column =
    format_string(s"%.${decimals}f", c)

  /** helpers.format_number parity: ≥1M → `x.xxM`, ≥1K → `x.xxK`, else
    * plain — always comma-grouped with `decimals` places. */
  def human(c: Column, decimals: Int = 2): Column =
    when(abs(c) >= 1000000.0,
        concat(format_number(c / 1000000.0, decimals), lit("M")))
      .when(abs(c) >= 1000.0,
        concat(format_number(c / 1000.0, decimals), lit("K")))
      .otherwise(format_number(c, decimals))
}
