package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-sequence materialization for sequence models (SURVEY.md §2.5
  * W14-W15; reference `src/features/sequence_builder.py`).
  *
  * The reference's Python per-group generator loop becomes one window
  * expression: `collect_list` of the per-row feature vector over a
  * rows-frame — a single (user) shuffle, no driver iteration, emitting
  * `array<array<double>>` ready for a DL hook. Parity points: only full
  * windows are emitted, users under `minEvents` are skipped, the label is
  * the last row's label, ±inf/NaN are sentinel-replaced (±999).
  */
object Sequences {

  /** Sentinel cleanup matching np.nan_to_num(nan=-999, posinf=999,
    * neginf=-999) (`sequence_builder.py:85`). */
  def sanitize(c: Column): Column =
    when(isnan(c) || c === Double.NegativeInfinity, -999.0)
      .when(c === Double.PositiveInfinity, 999.0)
      .otherwise(c)

  /** W14: per-entity sliding windows of the last `len` rows (stride 1).
    * Output: (id cols…, seq: array<array<double>>, label of last row). */
  def sliding(df: DataFrame, c: BehaviorWindows.Cols, featureCols: Seq[String],
              len: Int, minEvents: Int, labelCol: Option[String] = None): DataFrame = {
    val w = BehaviorWindows.ordered(c)
    val frame = w.rowsBetween(-(len - 1), 0)
    val features = array(featureCols.map(f => sanitize(col(f).cast("double"))): _*)
    val byUser = Window.partitionBy(col(c.user))
    val base = df.select(
      Seq(col(c.user), col(c.id), col(c.ts),
        collect_list(features).over(frame).as("seq"),
        count(lit(1)).over(byUser).as("__n_user")) ++
        labelCol.map(l => col(l).as("label")).toSeq: _*)
    base.filter(size(col("seq")) === len && col("__n_user") >= minEvents)
      .drop("__n_user")
  }

  /** W15: pre-pad a variable-length sequence with zero rows to `len`
    * (keras pad_sequences(padding='pre') parity); truncates from the
    * front when longer. */
  def padPre(seq: Column, len: Int, dim: Int): Column = {
    val zeroRow = array_repeat(lit(0.0), dim)
    when(size(seq) >= len, slice(seq, -len, len))
      .otherwise(concat(array_repeat(zeroRow, lit(len) - size(seq)), seq))
  }
}
