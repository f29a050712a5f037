package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Distributed Lloyd refinement for the ANN coarse quantizers — the
  * scale branch above the bounded-sample threshold (round-12 verdict
  * #5: the repo's dual-branch discipline — LeafBoost, BiLstm, Bpe all
  * carry bit-equal distributed twins — stopped at the PQ/IVF
  * codebooks, which train on a driver-collected sample only).
  *
  * Shape: seeding stays the bounded-sample local k-means (the
  * standard IVF/PQ practice — a few hundred points per cell converge
  * the seeds, independent of corpus size); refinement then runs Lloyd
  * rounds over the FULL corpus, one pass per round:
  *
  *  - assignment is a per-partition tight loop (argmin squared L2
  *    against the broadcast-in-closure centers — the LeafBoost
  *    histogramPass pattern; for unit points and unit centroids argmin
  *    L2 == argmax cosine, ties toward the lower index in both),
  *  - the update reduction is EXACT FIXED-POINT: per (group, cluster,
  *    dim) sums of round(x · 2²⁴) accumulated as longs. Long addition
  *    is associative and commutative, so the refined centers are
  *    BIT-IDENTICAL at any partitioning, core count, or input layout —
  *    the same determinism contract LeafBoost's integer histograms buy
  *    (a double sum would drift by ulps with task completion order).
  *    Resolution 2⁻²⁴ ≈ 6e-8 on unit-sphere components is far inside
  *    k-means' own noise floor; headroom: 2⁶³/2²⁴ ≈ 5·10¹¹ rows per
  *    cluster before overflow.
  *
  * Per-round driver traffic is one (groups·k·subDim) long array per
  * partition — KiB-scale, the treeAggregate shape. The slim vector
  * projection is persisted once for the round loop and unpersisted
  * after (no stacked persist chain: centers are driver state, the
  * frame's lineage never grows).
  *
  * `init` is indexed `init(g)(c)(d)`: group g (PQ subspace; IVF has one
  * group), center c, component d — every group must have the same
  * center count and subDim, and groups tile the vector contiguously
  * (group g covers components [g·subDim, (g+1)·subDim)).
  */
object Kmeans {

  private val Scale = (1L << 24).toDouble

  /** Refine `init` with `iters` Lloyd rounds over the full corpus.
    * `spherical`: renormalize means to unit (IVF); plain means (PQ).
    * Rows with a non-finite component are skipped (parked rows never
    * train — the build/encode parking contract); all vectors are
    * unit-normalized before slicing (zero vectors ride raw), matching
    * the local branches' sample prep. Early-exits when a round leaves
    * every center bit-unchanged. */
  def refine(df: DataFrame, vecCol: String,
             init: Array[Array[Array[Float]]],
             iters: Int, spherical: Boolean): Array[Array[Array[Float]]] = {
    val groups = init.length
    require(groups > 0 && init.forall(_.nonEmpty), "empty init codebooks")
    val kk = init(0).length
    val subDim = init(0)(0).length
    require(init.forall(g => g.length == kk && g.forall(_.length == subDim)),
      "ragged init codebooks")
    val dim = groups * subDim
    val spark = df.sparkSession
    import spark.implicits._
    val slim = df.select(col(vecCol)).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var centers = init.map(_.map(_.clone()))
      var it = 0
      var converged = false
      while (it < iters && !converged) {
        val cur = centers // stable reference for the closure
        val partials: Array[(Array[Long], Array[Long], Long, Long)] = slim.mapPartitions { rows =>
          val sums = new Array[Long](groups * kk * subDim)
          val cnts = new Array[Long](groups * kk)
          var seen = 0L
          var used = 0L
          val v = new Array[Double](dim)
          rows.foreach { r =>
            seen += 1L
            val a = r.getAs[scala.collection.Seq[Float]](0)
            if (a != null && a.length == dim) {
              var finite = true
              var i = 0
              var norm2 = 0.0
              while (i < dim) {
                val x = a(i).toDouble
                if (x.isNaN || x.isInfinite) finite = false
                v(i) = x; norm2 += x * x; i += 1
              }
              if (finite) {
                used += 1L
                val n = math.sqrt(norm2)
                if (n > 0) { i = 0; while (i < dim) { v(i) /= n; i += 1 } }
                var g = 0
                while (g < groups) {
                  val off = g * subDim
                  var best = 0; var bd = Double.MaxValue
                  var c = 0
                  while (c < kk) {
                    val cen = cur(g)(c)
                    var s = 0.0; var d = 0
                    while (d < subDim) {
                      val diff = v(off + d) - cen(d); s += diff * diff; d += 1
                    }
                    if (s < bd) { bd = s; best = c }
                    c += 1
                  }
                  cnts(g * kk + best) += 1L
                  val so = (g * kk + best) * subDim
                  var d = 0
                  while (d < subDim) {
                    sums(so + d) += math.rint(v(off + d) * Scale).toLong
                    d += 1
                  }
                  g += 1
                }
              }
            }
          }
          Iterator.single((sums, cnts, seen, used))
        }.collect()
        // exact long reduce — any combine order yields the same bits
        val sums = new Array[Long](groups * kk * subDim)
        val cnts = new Array[Long](groups * kk)
        var seen = 0L
        var used = 0L
        partials.foreach { case (s, c, sn, us) =>
          var i = 0
          while (i < sums.length) { sums(i) += s(i); i += 1 }
          i = 0
          while (i < cnts.length) { cnts(i) += c(i); i += 1 }
          seen += sn; used += us
        }
        // skipped rows must be VISIBLE (round-13 advice): a corpus with
        // a systematically wrong-width or non-finite vector column
        // would otherwise "refine" on zero rows and hand the seeds back
        // with no signal — the silent failure the parking contract
        // exists to prevent
        require(seen == 0 || used > 0,
          s"Kmeans.refine: all $seen rows skipped (wrong vector width " +
            s"- expected $dim - or non-finite components); refusing to " +
            "return unrefined seeds silently")
        if (used < seen && it == 0)
          System.err.println(s"[kmeans] refine skipped ${seen - used} of " +
            s"$seen rows (wrong width or non-finite) - refining on $used")
        val next = Array.tabulate(groups, kk) { (g, c) =>
          val n = cnts(g * kk + c)
          if (n == 0) centers(g)(c).clone() // empty cell keeps its seed
          else {
            val so = (g * kk + c) * subDim
            val mean = Array.tabulate(subDim)(d => sums(so + d).toDouble / Scale / n)
            if (spherical) {
              var norm = 0.0; var d = 0
              while (d < subDim) { norm += mean(d) * mean(d); d += 1 }
              norm = math.sqrt(norm)
              if (norm > 0) { d = 0; while (d < subDim) { mean(d) /= norm; d += 1 } }
            }
            mean.map(_.toFloat)
          }
        }
        converged = (0 until groups).forall(g => (0 until kk).forall(c =>
          java.util.Arrays.equals(next(g)(c), centers(g)(c))))
        centers = next
        it += 1
      }
      centers
    } finally slim.unpersist()
  }
}
