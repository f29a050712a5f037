package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-group top-k as an AGGREGATE — the alternative shortlist
  * shape to a `row_number` window (round-17 verdict #5 pricing): a
  * window rank over scored candidates SHUFFLES every scored row
  * (n_corpus × n_queries at the flat tier) to rank them, while a
  * typed aggregate with partial (map-side) combine bounds both the
  * state and the shuffle at k·partitions per group — each task keeps
  * one k-bounded sorted buffer per group and only those buffers cross
  * the wire.
  *
  * Selection order matches the window exactly: (key desc, id asc) —
  * ties by id, deterministic at any partitioning (the top-k SET under
  * a total order is merge-order independent). Null keys are the
  * caller's to exclude (the flat-tier scorer filters null decodes
  * before scoring; a null-keyed row would need the window's
  * nulls-last tail semantics, which a bounded buffer drops once k
  * non-null rows exist — same outcome whenever ≥ k non-null
  * candidates exist, i.e. every realistic corpus).
  *
  * Measured at the 15 M-vector probe (BASELINE.md round 18) against
  * `Sq.searchReranked`'s window form before any adoption — the
  * honest-measurement convention.
  */
object BoundedTopK {

  /** Sorted-by-(key desc, id asc) bounded buffer; parallel arrays keep
    * the encoder primitive (array<double> + array<bigint>). */
  final case class State(keys: Array[Double], ids: Array[Long])

  /** True when (a, ai) ranks strictly AFTER (b, bi) under
    * (key desc, id asc) with NaN keys ranking LAST (ties by id asc).
    *
    * NaN-totality matters (round-18 advice): with the naive
    * `a < b || (a == b && ...)` comparator a NaN key compares "not
    * after" everything, so one NaN row would insert at position 0 and
    * permanently win — and merge-order independence (the determinism
    * claim) breaks. NaN-LAST matches [[graft.serve.LocalAnn]]'s
    * canonical merge key ((sim desc, id asc), NaN last); note a raw
    * Spark `desc` sort ranks NaN FIRST, so callers replacing a window
    * rank over possibly-NaN scores get the serving tier's semantics
    * here, not the window's. */
  private def after(a: Double, ai: Long, b: Double, bi: Long): Boolean = {
    val an = java.lang.Double.isNaN(a); val bn = java.lang.Double.isNaN(b)
    if (an || bn) an && (!bn || ai > bi)
    else a < b || (a == b && ai > bi)
  }

  /** Shared insert/merge of the two aggregators (round-20 refactor:
    * [[TopKHits]] carries keys through `finish`, everything else is
    * identical). */
  private def insert(s: State, key: Double, id: Long, k: Int): State = {
      val n = s.keys.length
      // fast path: buffer full and the row ranks at-or-after the worst
      if (n >= k && !after(s.keys(n - 1), s.ids(n - 1), key, id)) s
      else {
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (after(key, id, s.keys(mid), s.ids(mid))) lo = mid + 1
          else hi = mid
        }
        val m = math.min(n + 1, k)
        val ks = new Array[Double](m); val is = new Array[Long](m)
        System.arraycopy(s.keys, 0, ks, 0, lo)
        System.arraycopy(s.ids, 0, is, 0, lo)
        ks(lo) = key; is(lo) = id
        val tail = m - lo - 1
        if (tail > 0) {
          System.arraycopy(s.keys, lo, ks, lo + 1, tail)
          System.arraycopy(s.ids, lo, is, lo + 1, tail)
        }
        State(ks, is)
      }
    }

  private def mergeStates(a: State, b: State, k: Int): State = {
    // merge two sorted buffers, truncate at k
    val m = math.min(a.keys.length + b.keys.length, k)
    val ks = new Array[Double](m); val is = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeB = i >= a.keys.length ||
        (j < b.keys.length && after(a.keys(i), a.ids(i), b.keys(j), b.ids(j)))
      if (takeB) { ks(o) = b.keys(j); is(o) = b.ids(j); j += 1 }
      else { ks(o) = a.keys(i); is(o) = a.ids(i); i += 1 }
      o += 1
    }
    State(ks, is)
  }

  final class TopK(k: Int)
      extends Aggregator[(Double, Long), State, Seq[Long]] {
    require(k >= 1, s"k must be >= 1, got $k")
    override def zero: State = State(Array.empty, Array.empty)
    override def reduce(s: State, x: (Double, Long)): State =
      insert(s, x._1, x._2, k)
    override def merge(a: State, b: State): State = mergeStates(a, b, k)
    override def finish(s: State): Seq[Long] = s.ids.toSeq
    override def bufferEncoder: Encoder[State] = Encoders.product[State]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Top-k WITH the ranking key (round-20): the window-rank replacement
    * for final ranks whose output carries the key column (sim). Same
    * buffer, same (key desc, id asc, NaN last) order; `finish` keeps
    * the keys alongside the ids. */
  final class TopKHits(k: Int)
      extends Aggregator[(Double, Long), State, Seq[(Double, Long)]] {
    require(k >= 1, s"k must be >= 1, got $k")
    override def zero: State = State(Array.empty, Array.empty)
    override def reduce(s: State, x: (Double, Long)): State =
      insert(s, x._1, x._2, k)
    override def merge(a: State, b: State): State = mergeStates(a, b, k)
    override def finish(s: State): Seq[(Double, Long)] =
      s.keys.zip(s.ids).toSeq
    override def bufferEncoder: Encoder[State] = Encoders.product[State]
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** The aggregate as a Column: top-`k` ids of the group by
    * (key desc, id asc). */
  def topKIds(key: Column, id: Column, k: Int): Column =
    udaf(new TopK(k)).apply(key, id)

  /** Shortlist `scored` — (groupCol, keyCol, idCol) rows — to the
    * per-group top-k (id, rank implicit by position), exploded back to
    * (groupCol, idCol) rows. Drop-in for the window-rank shortlist
    * when every key is non-null. */
  def shortlist(scored: DataFrame, groupCol: String, keyCol: String,
                idCol: String, k: Int): DataFrame =
    scored
      .groupBy(col(groupCol))
      .agg(topKIds(col(keyCol), col(idCol), k).as("__top"))
      .select(col(groupCol), explode(col("__top")).as(idCol))

  /** The final-rank replacement (round-20): per-group top-k of
    * (groupCol, keyCol, idCol) rows emitted WITH the key — a drop-in
    * for `row_number().over(partitionBy(group).orderBy(key desc, id
    * asc)) <= k` when ids are unique per group and keys are null or
    * finite. The window shuffles and SORTS every scored row to rank
    * them; this carries only k-bounded buffers across the exchange
    * (the r17 shortlist pricing, applied to the rank that produces
    * the output rows). Null keys map to NaN for the buffer's NaN-LAST
    * total order — exactly the window's desc-nulls-last — and emerge
    * as null again; selection is bit-identical because the order is
    * total (ties by id) and the buffer's top-k set is merge-order
    * independent. */
  def rankHits(scored: DataFrame, groupCol: String, keyCol: String,
               idCol: String, k: Int): DataFrame =
    scored
      .groupBy(col(groupCol))
      .agg(udaf(new TopKHits(k)).apply(
        coalesce(col(keyCol).cast("double"), lit(Double.NaN)),
        col(idCol)).as("__top"))
      .select(col(groupCol), explode(col("__top")).as("__h"))
      .select(col(groupCol), col("__h._2").as(idCol),
        when(!isnan(col("__h._1")), col("__h._1")).as(keyCol))
}
