package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OPQ-lite: the parametric Optimized Product Quantization transform
  * (public algorithm: Ge, He, Ke & Sun, "Optimized Product
  * Quantization", CVPR 2013, §4 "OPQ-P"; the same preprocessing FAISS
  * ships as `OPQMatrix`). The reference has no embedding tier at all
  * (SURVEY §7 training-data extensions).
  *
  * Plain PQ splits the vector into m CONTIGUOUS subspaces — when the
  * corpus is anisotropic (real embedding spaces are), the variance mass
  * can land in one subspace whose 2⁸ codes then carry almost all the
  * quantization error while the other m−1 quantize noise. OPQ-P fixes
  * the split with linear algebra instead of iteration:
  *
  *  1. diagonalize the covariance (the [[Pca]] tier — exact fixed-point
  *     gram + deterministic Jacobi, auto-sampled past 2²⁰ rows);
  *  2. ALLOCATE eigen-directions to the m subspaces so each gets a
  *     balanced variance product (greedy on the log-eigenvalue sum —
  *     the paper's balanced-partition criterion, optimal for the
  *     independent-Gaussian rate-distortion bound);
  *  3. rotate each vector into the permuted eigenbasis and run the
  *     UNCHANGED [[Pq]] train/encode/search machinery on the rotated
  *     corpus.
  *
  * The rotation is a PURE orthogonal map — deliberately NOT the
  * centered PCA projection: R·x preserves every dot product and norm,
  * so cosine in rotated space IS cosine in input space, the ADC
  * shortlist targets the very metric the exact rerank scores, and
  * ground truth computed on raw vectors stays valid verbatim. (The
  * eigenbasis itself still comes from the CENTERED covariance — where
  * the variance structure lives.)
  *
  * Scale shape: training adds one PCA fit (one exact scan + KiB driver
  * eigensolve); rotation is a map-side per-row matmul (d² flops —
  * ~4 µs at d=64) fused into the same pass that already unitizes and
  * encodes. Nothing here shuffles.
  */
object Opq {

  /** Orthogonal rotation: `rows(out)(in)` — eigenvectors of the input
    * covariance, reordered by the subspace allocation. `perm(out)` is
    * the eigen-rank each output dim carries (diagnostic/spec surface). */
  final case class Rotation(dim: Int, perm: Array[Int],
                            rows: Array[Array[Double]],
                            eigenvalues: Array[Double]) {
    require(rows.length == dim && rows.forall(_.length == dim),
      "rotation matrix must be dim x dim")
  }

  /** Balanced eigenvalue allocation (OPQ-P §4: equalize each
    * subspace's eigenvalue PRODUCT, i.e. its log-eigenvalue sum —
    * the independent-Gaussian rate-distortion balance). Implemented as
    * the classic multiway-partition greedy: items are log-eigenvalues,
    * processed by |log λ| DESCENDING, each assigned to the free-slot
    * subspace whose |running log sum| is smallest (ties break on
    * subspace index — deterministic). The processing order matters:
    * unit-scale embedding spectra have λ < 1, so log sums are
    * NEGATIVE — a naive descending-λ walk feeds every dominant
    * direction into the same "smallest-sum" bucket (measured: the
    * planted top-8 subspace landed whole in subspace 0, the exact
    * anti-pattern OPQ exists to break). Largest-magnitude-first is the
    * standard greedy guarantee; on a planted {m large, rest small}
    * spectrum it provably lands one dominant direction per subspace.
    * Returns the output-dim → eigen-rank permutation, subspace-major
    * (output dims [0, d/m) are subspace 0's allocation, descending
    * eigenvalue within each subspace). */
  def eigenAllocation(eig: Array[Double], m: Int): Array[Int] = {
    val d = eig.length
    require(m >= 1 && d % m == 0, s"dim $d not divisible into $m subspaces")
    val cap = d / m
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer[Int]())
    val logs = new Array[Double](m)
    // floor at a tiny positive so a zero eigenvalue can't Inf the sums
    def lg(rank: Int) = math.log(math.max(eig(rank), 1e-30))
    val order = (0 until d).sortBy(r => (-math.abs(lg(r)), r))
    for (rank <- order) {
      var best = -1
      var j = 0
      while (j < m) {
        if (buckets(j).size < cap &&
            (best < 0 || math.abs(logs(j)) < math.abs(logs(best)))) best = j
        j += 1
      }
      buckets(best) += rank
      logs(best) += lg(rank)
    }
    buckets.flatMap(_.sorted).toArray
  }

  /** Fit the rotation: PCA eigenbasis (auto-sampled fit) + balanced
    * allocation for an m-subspace product quantizer. */
  def trainRotation(df: DataFrame, vecCol: String, dim: Int, m: Int,
                    maxFitRows: Int = Pca.MaxExactRows): Rotation = {
    val model = Pca.fit(df, vecCol, dim, maxFitRows)
    val perm = eigenAllocation(model.eigenvalues, m)
    Rotation(dim, perm, perm.map(model.components(_)),
      perm.map(model.eigenvalues(_)))
  }

  /** OPQ-NP: NON-PARAMETRIC iterative refinement (Ge et al. 2013 §5 —
    * what FAISS's OPQMatrix trains by default). OPQ-P's single
    * eigen-allocation is optimal only for independent-Gaussian data
    * whose structure is axis-aligned after one rotation; OPQ-NP
    * alternates, from the OPQ-P seed:
    *
    *   1. rotate the (bounded, unit-normalized) sample by R;
    *   2. re-fit the per-subspace codebooks — k-means++ on the first
    *      iteration, WARM-STARTED Lloyd from the previous centers after
    *      (the warm start is what makes the objective provably
    *      non-increasing across iterations, asserted by OpqSpec);
    *   3. quantize, then solve the orthogonal Procrustes problem
    *      min_R ‖R·X − Ŷ‖_F: with M = Σ x·ŷᵀ and SVD M = U·S·Vᵀ, the
    *      optimum is R = V·Uᵀ (public result — Schönemann 1966).
    *
    * Everything runs DRIVER-SIDE on the same deterministic hash-top-N
    * sample contract as Pq.train (16 K × d doubles — the d×d SVD rides
    * the existing Jacobi eigensolver via MᵀM), so the refined rotation
    * is bit-reproducible at any layout and costs milliseconds at any
    * corpus scale; the corpus itself is only ever touched by the
    * unchanged map-side [[rotate]] + Pq encode afterwards. The
    * deployment contract is IDENTICAL to [[trainRotation]]'s output —
    * rotate, then train/encode/search plain PQ on the rotated frame;
    * `perm`/`eigenvalues` carry the OPQ-P seed's diagnostics.
    *
    * Returns (rotation, per-iteration quantization error on the
    * sample) — the error trace is the convergence surface a caller
    * (and OpqSpec) can assert on. */
  def trainRotationNP(df: DataFrame, idCol: String, vecCol: String,
                      dim: Int, m: Int, k: Int, iters: Int = 8,
                      seed: Long = 42L, maxTrainRows: Int = 16384,
                      maxFitRows: Int = Pca.MaxExactRows): (Rotation, Array[Double]) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val seedRot = trainRotation(df, vecCol, dim, m, maxFitRows)
    // bounded deterministic sample, unit-normalized — the Pq.train
    // preprocessing verbatim, so the objective refined here is the one
    // the deployed encoder quantizes
    val sample: Array[Array[Double]] = Samples.hashTopN(
        df.filter(!exists(col(vecCol), x => isnan(x.cast("double")) ||
          abs(x.cast("double")) === lit(Double.PositiveInfinity))),
        idCol, Seq(col(vecCol)), maxTrainRows)
      .collect()
      .flatMap { r =>
        val a = r.getAs[scala.collection.Seq[Float]](0)
        if (a == null || a.length != dim) None
        else {
          val v = new Array[Double](dim)
          var s = 0.0; var i = 0
          while (i < dim) { v(i) = a(i).toDouble; s += v(i) * v(i); i += 1 }
          val n = math.sqrt(s)
          if (n > 0) { i = 0; while (i < dim) { v(i) /= n; i += 1 } }
          Some(v)
        }
      }
    require(sample.nonEmpty, "empty OPQ-NP training sample")
    refineNP(sample, seedRot, m, k, iters, seed)
  }

  /** Fixed chunking for the driver-side parallel loops: 32 contiguous
    * row ranges REGARDLESS of host core count, partials combined in
    * chunk order — so every sum has one fixed association and the
    * refined rotation is bit-reproducible on any machine (the
    * determinism contract OpqSpec pins). 32 ≈ the local[32] benchmark
    * budget; more chunks would only fragment the ~16 K-row sample. */
  private val NpChunks = 32

  /** Run f over [0,n) split into [[NpChunks]] contiguous ranges on the
    * common pool; per-chunk results return IN CHUNK ORDER. */
  private def parChunks[T](n: Int)(f: (Int, Int) => T)(
      implicit ct: scala.reflect.ClassTag[T]): Array[T] = {
    val bounds = (0 to NpChunks).map(c => ((c.toLong * n) / NpChunks).toInt)
    val out = new Array[T](NpChunks)
    val tasks = (0 until NpChunks).map { c =>
      java.util.concurrent.CompletableFuture.runAsync(() => {
        out(c) = f(bounds(c), bounds(c + 1))
      })
    }
    tasks.foreach(_.join())
    out
  }

  /** The driver-side alternation (exposed for OpqSpec). Inner loops
    * (rotate / codebook refit / quantize / Procrustes gram) parallelize
    * over [[NpChunks]] fixed row ranges or the m subspaces — round-17
    * perf: the sequential alternation was ~4 s of single-core work per
    * call at the 16 K × 64 sample (8 iters ≈ 4 G flops) while 31 cores
    * idled; same fixed-order reductions, so results stay deterministic
    * per host-independent chunking (floating association is FIXED by
    * the chunk grid, not by core count). */
  private[operators] def refineNP(xs: Array[Array[Double]], seedRot: Rotation,
                                  m: Int, k: Int, iters: Int,
                                  seed: Long): (Rotation, Array[Double]) = {
    val d = seedRot.dim
    val sub = d / m
    val n = xs.length
    var r: Array[Array[Double]] = seedRot.rows.map(_.clone())
    var centers: Array[Array[Array[Double]]] = null
    val errs = new Array[Double](iters)
    val ys = Array.ofDim[Double](n, d)
    val yhat = Array.ofDim[Double](n, d)
    for (it <- 0 until iters) {
      // 1. rotate the sample: y = R x (independent row writes)
      val rNow = r
      parChunks(n) { (lo, hi) =>
        var i = lo
        while (i < hi) {
          var o = 0
          while (o < d) {
            val w = rNow(o); var s = 0.0; var j = 0
            while (j < d) { s += w(j) * xs(i)(j); j += 1 }
            ys(i)(o) = s; o += 1
          }
          i += 1
        }
      }
      // 2. codebooks: k-means++ cold on iter 0, warm Lloyd after —
      // the m subspace fits are independent tasks
      val prev = centers
      val next = new Array[Array[Array[Double]]](m)
      val fitTasks = (0 until m).map { j =>
        java.util.concurrent.CompletableFuture.runAsync(() => {
          val pts = ys.map(y =>
            java.util.Arrays.copyOfRange(y, j * sub, (j + 1) * sub))
          next(j) =
            if (it == 0)
              Pq.localKMeans(pts.map(_.map(_.toFloat)), k, maxIter = 12, seed + j)
                .map(_.map(_.toDouble))
            else lloyd(pts, prev(j), iters = 4)
        })
      }
      fitTasks.foreach(_.join())
      centers = next
      // 3. quantize + measure the objective: yhat rows are independent
      // writes; err sums per chunk, chunk partials combined in order
      val cNow = centers
      val errParts = parChunks(n) { (lo, hi) =>
        var part = 0.0
        var i = lo
        while (i < hi) {
          var j = 0
          while (j < m) {
            val cs = cNow(j)
            var best = 0; var bd = Double.MaxValue
            var c = 0
            while (c < cs.length) {
              var sdist = 0.0; var t = 0
              while (t < sub) {
                val dv = ys(i)(j * sub + t) - cs(c)(t); sdist += dv * dv; t += 1
              }
              if (sdist < bd) { bd = sdist; best = c }
              c += 1
            }
            part += bd
            var t = 0
            while (t < sub) { yhat(i)(j * sub + t) = cNow(j)(best)(t); t += 1 }
            j += 1
          }
          i += 1
        }
        part
      }
      var err = 0.0
      var ci = 0
      while (ci < errParts.length) { err += errParts(ci); ci += 1 }
      errs(it) = err
      // 4. Procrustes update (skipped after the last measurement — the
      // deployed codebooks are retrained on the full rotated corpus, so
      // the returned R must be the one the reported error was measured
      // under-or-before; keeping the final (R, C)-consistent point also
      // preserves the monotone trace contract)
      if (it < iters - 1) r = procrustes(xs, yhat, d)
    }
    (Rotation(d, seedRot.perm, r, seedRot.eigenvalues), errs)
  }

  /** Warm-started Lloyd on driver points (k-means without re-seeding —
    * the step that keeps the OPQ-NP objective monotone). Empty cells
    * keep their previous center. */
  private def lloyd(pts: Array[Array[Double]], init: Array[Array[Double]],
                    iters: Int): Array[Array[Double]] = {
    val k = init.length
    val dimS = init(0).length
    var cs = init.map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.ofDim[Double](k, dimS)
      val cnt = new Array[Int](k)
      var i = 0
      while (i < pts.length) {
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var s = 0.0; var t = 0
          while (t < dimS) { val dv = pts(i)(t) - cs(c)(t); s += dv * dv; t += 1 }
          if (s < bd) { bd = s; best = c }
          c += 1
        }
        cnt(best) += 1
        var t = 0
        while (t < dimS) { sums(best)(t) += pts(i)(t); t += 1 }
        i += 1
      }
      cs = Array.tabulate(k)(c =>
        if (cnt(c) > 0) Array.tabulate(dimS)(t => sums(c)(t) / cnt(c))
        else cs(c))
    }
    cs
  }

  /** Orthogonal Procrustes: R = V·Uᵀ for M = Σ x·ŷᵀ = U·S·Vᵀ. The SVD
    * rides [[Pca.jacobi]] on the symmetric MᵀM (V, S²); U follows from
    * u_i = M·v_i / s_i, with near-null singular directions completed to
    * an orthonormal basis by Gram–Schmidt (degenerate only when the
    * sample itself is rank-deficient). */
  private[operators] def procrustes(xs: Array[Array[Double]],
                                    yhat: Array[Array[Double]],
                                    d: Int): Array[Array[Double]] = {
    // M[j][o] = Σ_i x_i[j] · ŷ_i[o] — per-chunk d×d partials combined
    // in chunk order (the refineNP fixed-association discipline)
    val mmParts = parChunks(xs.length) { (lo, hi) =>
      val part = Array.ofDim[Double](d, d)
      var i = lo
      while (i < hi) {
        var j = 0
        while (j < d) {
          val xj = xs(i)(j)
          if (xj != 0.0) {
            var o = 0
            while (o < d) { part(j)(o) += xj * yhat(i)(o); o += 1 }
          }
          j += 1
        }
        i += 1
      }
      part
    }
    val mm = Array.ofDim[Double](d, d)
    var ci = 0
    while (ci < mmParts.length) {
      var j = 0
      while (j < d) {
        var o = 0
        while (o < d) { mm(j)(o) += mmParts(ci)(j)(o); o += 1 }
        j += 1
      }
      ci += 1
    }
    // MᵀM (symmetric PSD) → eigenvectors v_i, eigenvalues s_i²
    val mtm = Array.ofDim[Double](d, d)
    var a = 0
    while (a < d) {
      var b = a
      while (b < d) {
        var s = 0.0; var t = 0
        while (t < d) { s += mm(t)(a) * mm(t)(b); t += 1 }
        mtm(a)(b) = s; mtm(b)(a) = s
        b += 1
      }
      a += 1
    }
    val (vals, vecs) = Pca.jacobi(mtm)
    val sMax = math.sqrt(math.max(vals(0), 0.0))
    val u = Array.ofDim[Double](d, d) // u(i) = left singular vector i
    val live = new Array[Boolean](d)
    var idx = 0
    while (idx < d) {
      val s = math.sqrt(math.max(vals(idx), 0.0))
      if (s > 1e-12 * math.max(sMax, 1.0)) {
        var row = 0
        while (row < d) {
          var acc = 0.0; var t = 0
          while (t < d) { acc += mm(row)(t) * vecs(idx)(t); t += 1 }
          u(idx)(row) = acc / s
          row += 1
        }
        live(idx) = true
      }
      idx += 1
    }
    // Gram–Schmidt completion for null directions
    idx = 0
    var basis = 0
    while (idx < d) {
      if (!live(idx)) {
        var done = false
        while (!done && basis < d) {
          val cand = new Array[Double](d)
          cand(basis) = 1.0
          var p = 0
          while (p < d) {
            if (live(p) || p < idx) {
              var dot = 0.0; var t = 0
              while (t < d) { dot += cand(t) * u(p)(t); t += 1 }
              t = 0
              while (t < d) { cand(t) -= dot * u(p)(t); t += 1 }
            }
            p += 1
          }
          var nn = 0.0; var t = 0
          while (t < d) { nn += cand(t) * cand(t); t += 1 }
          if (nn > 1e-8) {
            val inv = 1.0 / math.sqrt(nn)
            t = 0
            while (t < d) { u(idx)(t) = cand(t) * inv; t += 1 }
            live(idx) = true
            done = true
          }
          basis += 1
        }
        require(live(idx), "procrustes: could not complete U to a basis")
      }
      idx += 1
    }
    // R = V Uᵀ: R[o][in] = Σ_i vecs(i)(o) · u(i)(in)
    Array.tabulate(d, d) { (o, in) =>
      var s = 0.0; var t = 0
      while (t < d) { s += vecs(t)(o) * u(t)(in); t += 1 }
      s
    }
  }

  /** Rotate (idCol, vecCol) into the permuted eigenbasis — map-side
    * per-row matmul, rotation in closure, output float so the rotated
    * frame drops straight into Pq.train/encode. Rows with wrong width
    * or null vectors park to null (the Pq.encode parking contract
    * carries them from there); null ids are rejected loudly. */
  def rotate(df: DataFrame, idCol: String, vecCol: String,
             rot: Rotation): DataFrame = {
    val spark = df.sparkSession
    val dim = rot.dim
    val rows = df.select(col(idCol).cast("long"), col(vecCol)).rdd.map { r =>
      require(!r.isNullAt(0), s"Opq.rotate: null/uncastable id in '$idCol'")
      val id = r.getLong(0)
      val a = r.getAs[scala.collection.Seq[Float]](1)
      if (a == null || a.length != dim) Row(id, null)
      else {
        val y = new Array[Float](dim)
        var o = 0
        while (o < dim) {
          val w = rot.rows(o)
          var s = 0.0
          var i = 0
          while (i < dim) { s += a(i).toDouble * w(i); i += 1 }
          y(o) = s.toFloat
          o += 1
        }
        Row(id, y.toSeq)
      }
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField(vecCol, ArrayType(FloatType), nullable = true)))
    spark.createDataFrame(rows, schema).withColumnRenamed("id", idCol)
  }

  // On-disk layout (the Ivf/Pq artifact discipline — plain parquet,
  // queryable, bit-exact double round trip):
  //   $path/opq_rotation : (out_dim, eigen_rank, eigenvalue, row) —
  //                        one row per output dimension, row-major
  /** Persist the rotation under `path` (overwrites). A saved rotation
    * plus saved PQ codebooks/codes is the complete OPQ deployment
    * artifact: load both, rotate queries map-side, search. */
  def save(spark: org.apache.spark.sql.SparkSession, rot: Rotation,
           path: String): Unit = {
    import spark.implicits._
    rot.perm.indices.map { o =>
      (o, rot.perm(o), rot.eigenvalues(o), rot.rows(o).toSeq)
    }.toDF("out_dim", "eigen_rank", "eigenvalue", "row")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$path/opq_rotation")
  }

  /** Load a rotation previously written by [[save]] — rotations with a
    * reloaded model are bit-identical to the fresh fit's (OpqSpec). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Rotation = {
    // driver-local read (round-20): no Spark job for a KiB rotation table
    val rows = graft.sources.DriverParquet.readRows(spark,
        s"$path/opq_rotation", Seq("out_dim", "eigen_rank", "eigenvalue", "row"))
      .sortBy(_.getInt(0))
    require(rows.nonEmpty, s"no opq_rotation table under $path")
    Rotation(rows.length,
      rows.map(_.getInt(1)),
      rows.map(_.getAs[scala.collection.Seq[Double]]("row").toArray),
      rows.map(_.getDouble(2)))
  }
}
