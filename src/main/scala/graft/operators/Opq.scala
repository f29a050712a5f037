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
    val rows = spark.read.parquet(s"$path/opq_rotation")
      .select("out_dim", "eigen_rank", "eigenvalue", "row")
      .collect()
      .sortBy(_.getInt(0))
    require(rows.nonEmpty, s"no opq_rotation table under $path")
    Rotation(rows.length,
      rows.map(_.getInt(1)),
      rows.map(_.getAs[scala.collection.Seq[Double]]("row").toArray),
      rows.map(_.getDouble(2)))
  }
}
