package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** OPQ-lite contracts: balanced eigenvalue allocation (the OPQ-P
  * criterion), metric preservation of the pure rotation, parking, and
  * layout-independence of the fitted rotation. */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  test("eigenAllocation spreads a planted {m large, rest small} spectrum " +
    "one dominant direction per subspace") {
    // 8 big eigenvalues then 56 small — the q159 planted geometry
    val eig = Array.fill(8)(0.22) ++ Array.fill(56)(0.0045)
    val perm = Opq.eigenAllocation(eig, m = 8)
    assert(perm.length == 64 && perm.toSet == (0 until 64).toSet)
    perm.grouped(8).zipWithIndex.foreach { case (bucket, b) =>
      assert(bucket.count(_ < 8) == 1, s"subspace $b got ${bucket.mkString(",")}")
    }
    // flat spectrum: any balanced split is fine, but capacity must hold
    val flat = Opq.eigenAllocation(Array.fill(16)(0.1), m = 4)
    assert(flat.grouped(4).forall(_.length == 4))
    intercept[IllegalArgumentException] {
      Opq.eigenAllocation(Array.fill(10)(0.1), m = 4) // 10 % 4 != 0
    }
  }

  test("eigenAllocation balances log-eigenvalue sums vs the naive split") {
    val eig = Array.fill(8)(0.22) ++ Array.fill(56)(0.0045)
    val perm = Opq.eigenAllocation(eig, m = 8)
    def spread(groups: Iterator[Array[Int]]): Double = {
      val sums = groups.map(_.map(r => math.log(eig(r))).sum).toSeq
      sums.max - sums.min
    }
    val balanced = spread(perm.grouped(8))
    val contiguous = spread((0 until 64).toArray.grouped(8)) // raw PQ's split
    assert(balanced < contiguous / 4,
      f"balanced spread $balanced%.2f vs contiguous $contiguous%.2f")
  }

  // deterministic anisotropic cloud in 4-d: dims 0-1 dominate
  private def cloud = (0 until 120).map { i =>
    val t = (i - 60) / 60.0
    val u = ((i * 13) % 17 - 8) / 10.0
    (i.toLong, Array((0.9 * t).toFloat, (0.8 * u).toFloat,
      (0.05 * ((i * 7) % 11 - 5) / 5.0).toFloat,
      (0.04 * ((i * 3) % 13 - 6) / 6.0).toFloat))
  }.toDF("vec_id", "embedding")

  test("rotation is orthogonal: dot products and norms survive bit-tight") {
    val rot = Opq.trainRotation(cloud, "embedding", dim = 4, m = 2)
    val before = cloud.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val after = Opq.rotate(cloud, "vec_id", "embedding", rot)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def dot(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    for (i <- Seq(0L, 7L, 63L); j <- Seq(1L, 50L, 119L)) {
      assert(math.abs(dot(before(i), before(j)) - dot(after(i), after(j))) < 1e-5,
        s"dot($i,$j) not preserved")
    }
    // rows of the rotation are orthonormal among themselves
    for (a <- 0 until 4; b <- 0 until 4) {
      val d = (0 until 4).map(k => rot.rows(a)(k) * rot.rows(b)(k)).sum
      assert(math.abs(d - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("rotation is bit-identical across adversarial repartitions") {
    val a = Opq.trainRotation(cloud, "embedding", dim = 4, m = 2)
    val b = Opq.trainRotation(cloud.repartition(13), "embedding", dim = 4, m = 2)
    assert(a.perm.sameElements(b.perm))
    for (i <- 0 until 4; j <- 0 until 4)
      assert(java.lang.Double.doubleToLongBits(a.rows(i)(j)) ==
        java.lang.Double.doubleToLongBits(b.rows(i)(j)))
  }

  test("save/load round trip: reloaded rotation is bit-identical") {
    val rot = Opq.trainRotation(cloud, "embedding", dim = 4, m = 2)
    val path = java.nio.file.Files.createTempDirectory("graft_opq").toString
    Opq.save(spark, rot, path)
    val back = Opq.load(spark, path)
    assert(back.dim == rot.dim && back.perm.sameElements(rot.perm))
    for (i <- 0 until 4) {
      assert(java.lang.Double.doubleToLongBits(back.eigenvalues(i)) ==
        java.lang.Double.doubleToLongBits(rot.eigenvalues(i)))
      for (j <- 0 until 4)
        assert(java.lang.Double.doubleToLongBits(back.rows(i)(j)) ==
          java.lang.Double.doubleToLongBits(rot.rows(i)(j)))
    }
    // and therefore rotations through it are bit-identical too
    val a = Opq.rotate(cloud, "vec_id", "embedding", rot).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Opq.rotate(cloud, "vec_id", "embedding", back).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a.keySet == b.keySet && a.forall { case (k, v) => v == b(k) })
    intercept[Exception] { // missing artifact surfaces loudly
      Opq.load(spark, path + "/nope")
    }
  }

  test("rotate parks wrong-width rows to null and rejects null ids") {
    val rot = Opq.trainRotation(cloud, "embedding", dim = 4, m = 2)
    val mixed = cloud.unionByName(
      Seq((900L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding"))
    val out = Opq.rotate(mixed, "vec_id", "embedding", rot).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(900L).isEmpty && out(0L).nonEmpty)
    val withNull = cloud.select(
      when(col("vec_id") === 3L, lit(null)).otherwise(col("vec_id")).as("vec_id"),
      col("embedding"))
    val e = intercept[org.apache.spark.SparkException] {
      Opq.rotate(withNull, "vec_id", "embedding", rot).collect()
    }
    assert(e.getMessage.contains("null/uncastable id") ||
      Option(e.getCause).exists(_.getMessage.contains("null/uncastable id")))
  }

  // a corpus whose variance structure is NOT axis-aligned: the
  // anisotropic cloud pushed through a fixed non-trivial rotation —
  // the geometry where OPQ-P's single eigen-allocation can lose and
  // OPQ-NP's iterative refinement is supposed to win back
  private def skewedCloud = {
    val c = math.cos(0.6); val s = math.sin(0.6)
    val q = Array( // two Givens rotations mixing (0,2) and (1,3)
      Array(c, 0.0, -s, 0.0), Array(0.0, c, 0.0, -s),
      Array(s, 0.0, c, 0.0), Array(0.0, s, 0.0, c))
    cloud.collect().map { r =>
      val v = r.getSeq[Float](1)
      val y = Array.tabulate(4)(o =>
        (0 until 4).map(i => q(o)(i) * v(i)).sum.toFloat)
      (r.getLong(0), y)
    }.toSeq.toDF("vec_id", "embedding")
  }

  test("OPQ-NP: refinement error trace is non-increasing (warm-started " +
    "Lloyd + Procrustes), rotation stays orthogonal, fit is deterministic") {
    val (rot, errs) = Opq.trainRotationNP(skewedCloud, "vec_id", "embedding",
      dim = 4, m = 2, k = 4, iters = 6)
    assert(errs.length == 6)
    errs.sliding(2).foreach { w =>
      assert(w(1) <= w(0) + 1e-9, s"objective rose: ${errs.mkString(", ")}")
    }
    assert(errs.last < errs.head, "refinement must actually improve the seed")
    // the refined rotation is still a pure orthogonal map
    for (a <- 0 until 4; b <- 0 until 4) {
      val d = (0 until 4).map(t => rot.rows(a)(t) * rot.rows(b)(t)).sum
      assert(math.abs(d - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
    // deterministic: a second fit from the same frame is bit-identical
    val (rot2, errs2) = Opq.trainRotationNP(skewedCloud.repartition(7),
      "vec_id", "embedding", dim = 4, m = 2, k = 4, iters = 6)
    assert(errs.sameElements(errs2))
    for (i <- 0 until 4; j <- 0 until 4)
      assert(java.lang.Double.doubleToLongBits(rot.rows(i)(j)) ==
        java.lang.Double.doubleToLongBits(rot2.rows(i)(j)))
    // save/load carries the refined matrix bit-exactly (same artifact
    // layout as OPQ-P — the deployment path does not change)
    val path = java.nio.file.Files.createTempDirectory("graft_opqnp").toString
    Opq.save(spark, rot, path)
    val back = Opq.load(spark, path)
    for (i <- 0 until 4; j <- 0 until 4)
      assert(java.lang.Double.doubleToLongBits(back.rows(i)(j)) ==
        java.lang.Double.doubleToLongBits(rot.rows(i)(j)))
  }

  test("OPQ-NP beats the OPQ-P seed's quantization error on a " +
    "non-axis-aligned corpus") {
    // measure both rotations under the SAME freshly-fit codebook budget
    // (k-means++ cold, identical seed): the NP refinement must leave
    // strictly less variance to the quantizer than the single
    // eigen-allocation on data whose structure one rotation can't align
    val (rotNP, errsNP) = Opq.trainRotationNP(skewedCloud, "vec_id",
      "embedding", dim = 4, m = 2, k = 4, iters = 8)
    val rotP = Opq.trainRotation(skewedCloud, "embedding", dim = 4, m = 2)
    assert(errsNP.last < errsNP.head * 0.999,
      s"NP made no progress over the P seed: ${errsNP.mkString(", ")}")
    // and the final NP rotation differs from the seed (it moved)
    val moved = (0 until 4).exists(i => (0 until 4).exists(j =>
      math.abs(rotNP.rows(i)(j) - rotP.rows(i)(j)) > 1e-9))
    assert(moved)
  }
}
