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
    var i = 0
    while (i < k) {
      val v = java.lang.Math.floorMod(pa(i) * h + pb(i), P)
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
}
