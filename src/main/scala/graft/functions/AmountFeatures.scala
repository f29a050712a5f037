package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Amount/value feature expressions (SURVEY.md §2.8 F5-F7).
  *
  * Capability match for the reference's amount stage
  * (`src/features/engineer.py:227-255`, `api/main.py:199-263`): log scale,
  * right-closed static binning (pandas `pd.cut` parity), round-number
  * flags, sigmoid base score. Pure Column expressions — codegen friendly.
  */
object AmountFeatures {

  def logAmount(c: Column): Column = log1p(c)

  /** Sigmoid used by the heuristic scorer (`api/main.py:201`):
    * 1/(1+e^{-k(x-mid)}). */
  def sigmoid(c: Column, k: Double, mid: Double): Column =
    lit(1.0) / (lit(1.0) + exp(lit(-k) * (c - lit(mid))))

  /** pandas `pd.cut` parity: right-closed bins over the given inner edges,
    * i.e. (-inf, e0], (e0, e1], ... (en, +inf) → codes 0..n+1.
    * Reference bins (-inf,50,100,200,500,1000,5000,inf]
    * (`src/features/engineer.py:251-255`). NULL input → NULL (pandas NaN). */
  def cutRightClosed(c: Column, edges: Seq[Double]): Column = {
    val ladder = edges.zipWithIndex.foldRight(lit(edges.size): Column) {
      case ((edge, i), acc) => when(c <= edge, lit(i)).otherwise(acc)
    }
    when(c.isNull, lit(null)).otherwise(ladder)
  }

  /** Round-number flags (`engineer.py:234-240`). pmod keeps float-modulo
    * semantics identical to numpy's `%` for positive operands. */
  def hasDecimal(c: Column): Column  = (pmod(c, lit(1.0)) > 0).cast("int")
  def isRound(c: Column, base: Double): Column =
    (pmod(c, lit(base)) === 0).cast("int")

  /** z-score against externally supplied moments (fit on train only —
    * leakage discipline, SURVEY.md §7). */
  def zscore(c: Column, mean: Column, std: Column): Column =
    (c - mean) / (std + lit(1e-9))

  /** Winsorization: clip to externally supplied [lo, hi] bounds
    * (typically exact or sketch percentiles computed ONCE on a 1-row
    * frame and cross-joined broadcast — never a per-row subquery). The
    * outlier-capping preprocessor between raw amounts and any scaler:
    * a fat-finger 1e9 transaction otherwise owns the z-score moments.
    * NULL input stays NULL — by EXPLICIT guard, because least/greatest
    * IGNORE null operands (greatest(null, lo) = lo — the q111 lesson),
    * which would silently fabricate lo for missing amounts. */
  def winsorize(c: Column, lo: Column, hi: Column): Column =
    when(c.isNull, lit(null)).otherwise(least(greatest(c, lo), hi))

  def all(amount: Column, prefix: String = ""): Seq[(String, Column)] = Seq(
    s"${prefix}log_amt"     -> logAmount(amount),
    s"${prefix}amt_bin"     -> cutRightClosed(amount, Seq(50, 100, 200, 500, 1000, 5000)),
    s"${prefix}has_decimal" -> hasDecimal(amount),
    s"${prefix}is_round_1"  -> isRound(amount, 1.0),
    s"${prefix}is_round_10" -> isRound(amount, 10.0),
    s"${prefix}is_round_100" -> isRound(amount, 100.0)
  )
}
