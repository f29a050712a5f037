package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Corpus-level MinHash sketch as a typed `Aggregator` (the §2.12
  * custom-code candidate SURVEY §7 named): folds a stream of shingle
  * hashes (already reduced mod 2^31−1, e.g. `Dedup.tokenHashesMod` /
  * `shingleCombine` output) into k per-permutation minima.
  *
  * This is the DATASET-vs-DATASET similarity primitive: the sketch of a
  * corpus is tiny (k longs), `merge` is elementwise min — associative,
  * commutative, partition-order free — so Spark computes it with
  * partial aggregation (map-side combine, no shuffle of shingles), and
  * sketches of two corpora estimate their shingle-set Jaccard as the
  * fraction of agreeing components (E[match_i] = J). Exactly the shape
  * that compares a 100 TB crawl snapshot against last month's without
  * ever joining them.
  *
  * The affine permutation family is IDENTICAL to
  * `Dedup.minHashFromShingles` (same seed derivation, same Mersenne
  * prime), proven by equivalence spec — one MinHash contract across the
  * column and Aggregator forms.
  */
class MinHashSketchAgg(k: Int = 128, seed: Long = 42L)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  private val P = graft.operators.Dedup.MersenneP
  // THE hash family — shared with the column form (Dedup.hashFamily),
  // so the two can never fork; only pa/pb ship in the closure
  private val (pa: Array[Long], pb: Array[Long]) = {
    val params = graft.operators.Dedup.hashFamily(k, seed)
    (params.map(_._1).toArray, params.map(_._2).toArray)
  }

  /** Sentinel = P (no hash mod P reaches it), matching the column form's
    * array_repeat(MersenneP) zero. */
  def zero: Array[Long] = Array.fill(k)(P)

  def reduce(buf: Array[Long], h: Long): Array[Long] = {
    // defensive mod: callers contract to feed hashes already reduced
    // mod P (Dedup.tokenHashesMod output), but a raw 64-bit hash would
    // silently wrap pa(i)*h past 2^63 into a wrong-but-plausible sketch
    // — one floorMod makes the precondition total instead of documented
    val hm = java.lang.Math.floorMod(h, P)
    var i = 0
    while (i < k) {
      val v = java.lang.Math.floorMod(pa(i) * hm + pb(i), P)
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object MinHashSketchAgg {
  /** Jaccard estimate from two sketches of the same (k, seed) family. */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length, s"sketch sizes differ: ${a.length}/${b.length}")
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.length
  }

  /** Side-filtered variant over (in_a, in_b, h) tagged shingle rows:
    * folds only the rows whose `side` flag (0 = in_a, 1 = in_b) is set.
    * Exists so a two-corpus comparison (q97) computes BOTH sketches and
    * the membership counts in ONE typed select — one job, one pass over
    * the tagged stream — instead of three separate actions over a
    * persisted frame. Same family/zero/merge as the unfiltered form by
    * delegation, so the sketches can never fork. */
  class Tagged(k: Int, seed: Long, side: Int)
      extends Aggregator[(Int, Int, Long), Array[Long], Array[Long]] {
    require(side == 0 || side == 1, s"side must be 0 or 1, got $side")
    private val inner = new MinHashSketchAgg(k, seed)
    def zero: Array[Long] = inner.zero
    def reduce(buf: Array[Long], t: (Int, Int, Long)): Array[Long] =
      if ((if (side == 0) t._1 else t._2) == 1) inner.reduce(buf, t._3) else buf
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = inner.merge(x, y)
    def finish(buf: Array[Long]): Array[Long] = inner.finish(buf)
    def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
    def outputEncoder: Encoder[Array[Long]] = inner.outputEncoder
  }

  /** Typed sum over the same tagged rows (companion to `Tagged` for the
    * one-pass q97 select: three of these + two sketches = 5 typed
    * columns, the Dataset.select arity ceiling). */
  class TaggedSum(pick: ((Int, Int, Long)) => Long)
      extends Aggregator[(Int, Int, Long), Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, t: (Int, Int, Long)): Long = b + pick(t)
    def merge(x: Long, y: Long): Long = x + y
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
    def outputEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
  }
}
