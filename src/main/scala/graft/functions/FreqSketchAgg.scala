package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a typed mergeable `Aggregator`
  * — the bounded-state scale path for frequency censuses (q84's exact
  * census shuffles the whole vocabulary; at 100 TB that is 10^8–10^9
  * distinct tokens. This sketch caps state at k counters PER PARTITION
  * and k counters on the wire, map-side combined like any algebraic
  * agg).
  *
  * Guarantees (deterministic, partition-layout independent — Misra &
  * Gries 1982; merge bound per Agarwal et al., "Mergeable Summaries",
  * PODS 2012):
  *   - est(x) ∈ [true(x) − N/(k+1), true(x)] for EVERY item x, where
  *     est(x) = 0 when x is not in the summary and N = stream length;
  *   - hence every item with true frequency > N/(k+1) IS in the summary.
  * The summary CONTENTS for sub-threshold items depend on merge order,
  * so queries must assert the guarantees (flags), never hash the raw
  * estimates (q62/q17 tolerance-flag convention).
  */
class FreqSketchAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"k must be positive, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None =>
        // full + unseen item: decrement all (the new item's implicit 1
        // cancels against the shared decrement), drop zeros — the
        // textbook O(k) eviction step
        buf.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
    }

  /** Sum counters, then restore the k-bound by subtracting the
    * (k+1)-largest combined count from everything (Mergeable Summaries
    * §3.1 — keeps the N/(k+1) error bound additive across merges). */
  def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val combined = y.foldLeft(x) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.valuesIterator.toArray.sortBy(-_).apply(k)
      combined.flatMap { case (key, c) =>
        if (c > cut) Some(key -> (c - cut)) else None
      }
    }
  }

  def finish(buf: Map[String, Long]): Map[String, Long] = buf

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
