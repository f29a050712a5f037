package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed PCA / whitening over an embedding column — the FAISS
  * `PCAMatrix` preprocessing shape (public: Jégou et al. 2011 use
  * PCA-rotated vectors ahead of PQ; whitening is the standard
  * SemDeDup/ANN conditioning step). The reference has no embedding
  * tier at all (SURVEY §7 training-data extensions).
  *
  * Two-stage shape, matching this repo's trainer doctrine:
  *  - the GRAM/mean pass is distributed with EXACT fixed-point
  *    reductions (the Kmeans.refine pattern): each component quantizes
  *    to round(x·2²⁰) — half-away-from-zero, the round() both Spark SQL
  *    and DuckDB implement, so an oracle can replay the arithmetic —
  *    and the per-partition partials are long arrays (dim sums +
  *    upper-triangle gram + count) that reduce bit-identically in ANY
  *    combine order. Overflow audit: |x| < 2 ⇒ q ≤ 2²¹, q_iq_j ≤ 2⁴²,
  *    guarded up to 2²⁰ rows ⇒ Σ ≤ 2⁶² < 2⁶³.
  *  - the eigensolve runs on the driver over the KiB-scale covariance
  *    (dim ≤ a few hundred: dim² doubles — the same driver-bounded
  *    reduction class as Kmeans.refine's center update), via cyclic
  *    Jacobi rotations — a deterministic pure function of the
  *    deterministic covariance, so the fitted model is bit-stable at
  *    any partitioning/core count.
  *
  * Projection is a pure per-row map (model in closure, the
  * BiLstm.score discipline) — embarrassingly parallel at 100 TB.
  */
object Pca {

  /** Fixed-point quantum for the gram pass (2²⁰). */
  val Scale: Double = (1L << 20).toDouble

  /** Half-away-from-zero long rounding — the semantics of Spark SQL's
    * round() AND DuckDB's round(), so SQL twins can replay the
    * quantization exactly (math.rint would be half-even; math.round
    * half-up — both diverge from SQL at negative halves). */
  def qlong(y: Double): Long =
    if (y >= 0) math.floor(y + 0.5).toLong else math.ceil(y - 0.5).toLong

  /** Fitted model: population covariance eigendecomposition.
    * `components(j)` is the j-th eigenvector (descending eigenvalue),
    * sign-normalized so its largest-|entry| coordinate is positive. */
  case class Model(dim: Int, n: Long, mean: Array[Double],
                   eigenvalues: Array[Double],
                   components: Array[Array[Double]]) {
    require(components.forall(_.length == dim), "ragged components")
  }

  /** Exact-gram row ceiling (2²⁰): the overflow audit in the header
    * bounds Σq_iq_j ≤ rows·2⁴² < 2⁶³ only up to this many rows. */
  val MaxExactRows: Int = 1 << 20

  /** One distributed pass: exact quantized mean + upper-triangle gram,
    * then the driver eigensolve. Rows with wrong width or non-finite
    * components are parked VISIBLY (the Kmeans.refine contract).
    *
    * Corpora past [[MaxExactRows]] fit on a BOUNDED DETERMINISTIC
    * sample (round-14 verdict #3 — the Ivf.trainCentroids doctrine,
    * hash-top-N keyed on the vector bytes themselves so no id column
    * is needed) instead of refusing: PCA fitted on 2²⁰ hash-uniform
    * rows is a statistical estimator of the corpus rotation — exactly
    * what FAISS's PCAMatrix trains on a bounded sample — and the
    * sampled fit stays bit-reproducible at any layout because the kept
    * SET is a pure function of the data.
    *
    * The ceiling decision is FOLDED INTO the gram pass (round-15
    * verdict #6 / advice — the old shape paid a full count() scan
    * before every fit): the pass accumulates the exact partials with a
    * per-partition abort at `maxFitRows` rows (a single partition past
    * the GLOBAL cap already decides the outcome, and the abort is what
    * keeps every partial inside the 2⁶² overflow audit no matter how
    * large the corpus is). If the whole corpus fit under the cap, those
    * partials ARE the exact full-corpus covariance — one job total,
    * byte-identical to the old two-job result. Only above the ceiling
    * does a second (sampled) pass run. Callers needing the exact
    * covariance CONTRACT call [[covariance]] directly, which keeps its
    * loud guard. */
  def fit(df: DataFrame, vecCol: String, dim: Int,
          maxFitRows: Int = MaxExactRows): Model = {
    require(maxFitRows > 1 && maxFitRows <= MaxExactRows,
      s"maxFitRows out of the exact-gram range: $maxFitRows")
    val slim = df.select(col(vecCol))
    val parts = gramPass(slim, dim, capRows = maxFitRows.toLong)
    val totalSeen = parts.map(_._3).sum
    val anyAborted = parts.exists(_._5)
    val (cov, n, mean) =
      if (!anyAborted && totalSeen <= maxFitRows)
        finalizeCov(parts, dim) // the partials ARE the exact fit — done in one pass
      else {
        val sample = Samples.hashTopN(slim, vecCol, Seq(col(vecCol)), maxFitRows)
        covariance(sample, vecCol, dim)
      }
    val (eigVals, eigVecs) = jacobi(cov)
    Model(dim, n, mean, eigVals, eigVecs)
  }

  /** The distributed exact pass on its own: (population covariance,
    * usable-row count, mean). Every double here is a pure function of
    * the exact long sums — bit-identical at any layout, and replayable
    * by a SQL twin that writes the same left-assoc shapes
    * (q / 2²⁰-scale division, then E[xy] − E[x]E[y]). */
  def covariance(df: DataFrame, vecCol: String, dim: Int): (Array[Array[Double]], Long, Array[Double]) = {
    require(dim > 0 && dim <= 512, s"dim out of the driver-eigensolve range: $dim")
    finalizeCov(gramPass(df.select(col(vecCol)), dim, capRows = Long.MaxValue), dim)
  }

  /** Per-partition exact partials: (sums, upper-tri gram, seen, used,
    * aborted). `capRows` bounds the per-partition accumulation: once a
    * partition has SEEN more than capRows rows it stops accumulating
    * and flags aborted — any such partition already proves the corpus
    * exceeds the global cap, and the bound is what keeps each partial
    * inside the 2⁶² long-overflow audit regardless of corpus size
    * (after the abort only the flag is carried; rows are not even
    * counted further). With capRows = Long.MaxValue this is exactly the
    * historical covariance pass. */
  private def gramPass(slim: DataFrame, dim: Int, capRows: Long)
      : Array[(Array[Long], Array[Long], Long, Long, Boolean)] = {
    val tri = dim * (dim + 1) / 2
    slim.rdd.mapPartitions { rows =>
      val sums = new Array[Long](dim)
      val gram = new Array[Long](tri)
      var seen = 0L
      var used = 0L
      var aborted = false
      val q = new Array[Long](dim)
      while (!aborted && rows.hasNext) {
        val r = rows.next()
        seen += 1L
        if (seen > capRows) aborted = true
        else {
          val a = r.getAs[scala.collection.Seq[Float]](0)
          if (a != null && a.length == dim) {
            var finite = true
            var i = 0
            while (i < dim) {
              val x = a(i).toDouble
              if (x.isNaN || x.isInfinite || math.abs(x) >= 2.0) finite = false
              else q(i) = qlong(x * Scale)
              i += 1
            }
            if (finite) {
              used += 1L
              i = 0
              var t = 0
              while (i < dim) {
                sums(i) += q(i)
                var j = i
                while (j < dim) { gram(t) += q(i) * q(j); t += 1; j += 1 }
                i += 1
              }
            }
          }
        }
      }
      Iterator.single((sums, gram, seen, used, aborted))
    }.collect()
  }

  /** Merge partials and finish the covariance arithmetic — the exact
    * same left-assoc shapes as always, so both fit paths and the SQL
    * twins replay it bit-for-bit. */
  private def finalizeCov(
      partials: Array[(Array[Long], Array[Long], Long, Long, Boolean)],
      dim: Int): (Array[Array[Double]], Long, Array[Double]) = {
    val tri = dim * (dim + 1) / 2
    val sums = new Array[Long](dim)
    val gram = new Array[Long](tri)
    var seen = 0L
    var used = 0L
    partials.foreach { case (s, g, sn, us, _) =>
      var i = 0
      while (i < dim) { sums(i) += s(i); i += 1 }
      i = 0
      while (i < tri) { gram(i) += g(i); i += 1 }
      seen += sn; used += us
    }
    require(seen == 0 || used > 0,
      s"Pca.fit: all $seen rows skipped (wrong vector width - expected " +
        s"$dim - non-finite, or |x| >= 2 outside the fixed-point range)")
    require(used > 1, s"Pca.fit needs at least 2 usable rows, got $used")
    require(used <= MaxExactRows,
      s"Pca.covariance: $used rows exceeds the 2^20 exact-gram overflow " +
        "guard - use fit(), which auto-samples past the ceiling")
    if (used < seen)
      System.err.println(s"[pca] fit skipped ${seen - used} of $seen rows")
    val n = used.toDouble
    val mean = Array.tabulate(dim)(i => sums(i) / Scale / n)
    // population covariance from the exact sums: E[xy] − E[x]E[y]
    val cov = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val e = gram(t) / Scale / Scale / n - mean(i) * mean(j)
        cov(i)(j) = e; cov(j)(i) = e
        t += 1; j += 1
      }
      i += 1
    }
    (cov, used, mean)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: deterministic
    * sweep order (upper triangle row-major), fixed convergence
    * threshold — a pure function of its input, so the decomposition is
    * as layout-independent as the covariance feeding it. Returns
    * (eigenvalues descending, eigenvectors row-per-component,
    * sign-normalized). Public algorithm: Golub & Van Loan §8.5. */
  def jacobi(mIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = mIn.length
    val a = Array.tabulate(n, n)((i, j) => mIn(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-14 && sweep < 100) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tSign = if (theta >= 0) 1.0 else -1.0
            val tt = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // order descending; tie-break on index (deterministic); sign: the
    // largest-|entry| coordinate of each eigenvector is made positive
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val w = Array.tabulate(n)(k => v(k)(i))
      var bi = 0
      var k = 1
      while (k < n) { if (math.abs(w(k)) > math.abs(w(bi))) bi = k; k += 1 }
      if (w(bi) < 0) { k = 0; while (k < n) { w(k) = -w(k); k += 1 } }
      w
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project (and optionally whiten) onto the leading k components —
    * pure per-row map, model in closure. Output: (idCol, array<double>
    * of length k). Rows the fit would have parked project to null. */
  def transform(df: DataFrame, idCol: String, vecCol: String,
                model: Model, k: Int, whiten: Boolean = false): DataFrame = {
    require(k > 0 && k <= model.dim, s"k out of range: $k vs dim ${model.dim}")
    val spark = df.sparkSession
    val dim = model.dim
    val mean = model.mean
    val comps = model.components
    val scales: Array[Double] =
      if (whiten) model.eigenvalues.take(k).map(e => 1.0 / math.sqrt(math.max(e, 1e-12)))
      else Array.fill(k)(1.0)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("proj", ArrayType(DoubleType), nullable = true)))
    val rows = df.select(col(idCol).cast("long"), col(vecCol)).rdd.map { r =>
      // ids are asserted up front like the dim/width guards: the output
      // field is non-nullable, and a null id silently unboxing to 0L
      // would alias distinct rows onto one key (round-14 advice)
      require(!r.isNullAt(0), s"Pca.transform: null/uncastable id in '$idCol'")
      val id = r.getLong(0)
      val a = r.getAs[scala.collection.Seq[Float]](1)
      if (a == null || a.length != dim) Row(id, null)
      else {
        val y = new Array[Double](k)
        var j = 0
        while (j < k) {
          val vj = comps(j)
          var s = 0.0
          var d = 0
          while (d < dim) { s += (a(d).toDouble - mean(d)) * vj(d); d += 1 }
          y(j) = s * scales(j)
          j += 1
        }
        Row(id, y.toSeq)
      }
    }
    spark.createDataFrame(rows, schema)
      .withColumnRenamed("id", idCol)
  }
}
