package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(2.0f, 0.0f, 0.0f)),  // parallel to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite to 0
    (4L, Array(1.0f, 1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("dot/norm/cosine on known vectors") {
    val out = vecs.filter($"vec_id" === 4)
      .select(Embeddings.norm2($"embedding")).collect()(0).getDouble(0)
    assert(math.abs(out - math.sqrt(2)) < 1e-12)
  }

  test("cosine top-k ranks parallel > diagonal > orthogonal > opposite") {
    val q = vecs.filter($"vec_id" === 0)
    val out = Embeddings.cosineTopK(q, vecs, "vec_id", "vec_id", "embedding", k = 4)
      .orderBy(desc("sim"), $"neighbor_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 4L, 2L, 3L))
    assert(out(0).getDouble(2) == 1.0)
    assert(math.abs(out(1).getDouble(2) - math.sqrt(0.5)) < 1e-4)
    assert(out(2).getDouble(2) == 0.0)
    assert(out(3).getDouble(2) == -1.0)
  }

  test("LSH buckets: identical vectors collide; pairs carry exact cosine") {
    val dup = Seq((10L, Array(1.0f, 2.0f, 3.0f)), (11L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Embeddings.lshNeighborPairs(dup, "vec_id", "embedding",
      nPlanes = 8, dim = 3, minSim = 0.9)
      .collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 10L && pairs(0).getDouble(2) == 1.0)
  }

  test("stats: norm/mean/min/max") {
    val r = Embeddings.stats(vecs.filter($"vec_id" === 4), "vec_id", "embedding")
      .collect()(0)
    assert(math.abs(r.getAs[Double]("l2_norm") - math.sqrt(2)) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean") - 2.0 / 3) < 1e-12)
    assert(r.getAs[Double]("min_v") == 0.0 && r.getAs[Double]("max_v") == 1.0)
  }

  test("semanticDedupPairs: colinear clones found, dissimilar pairs absent, CC keeps min id") {
    // 40 well-separated random vectors + an exactly-colinear (×2)
    // clone of every 4th: clones MUST pair with their original (×2 is
    // a power of two — centroid dots and the argmax are exact doubles,
    // co-clustering is an arithmetic identity), and no random-random
    // pair reaches 0.95 (seeded)
    val rnd = new scala.util.Random(11)
    val base = (0 until 40).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val clones = base.filter(_._1 % 4 == 0).map { case (i, v) =>
      (i + 1000L, v.map(x => x * 2.0f)) }
    val df = (base ++ clones).toDF("vec_id", "embedding")
    val pairs = Embeddings.semanticDedupPairs(df, "vec_id", "embedding",
      nLists = 4, minSim = 0.95)
    val rows = pairs.collect()
    val clonePairs = rows.filter(r => r.getLong(1) == r.getLong(0) + 1000L)
    assert(clonePairs.length == 10,
      s"expected 10 clone pairs, got ${clonePairs.length}: ${rows.mkString(",")}")
    // EXACTLY the clone pairs: a regressed pair filter (id1 <= id2, a
    // dropped orientation guard) or a loosened verify would add rows
    assert(rows.length == 10, s"expected exactly 10 pairs, got ${rows.length}")
    assert(rows.forall(_.getAs[Double]("sim") == 1.0))
    // dedup composition: connected components over the pairs keeps the
    // original (min id) as every group's canonical representative
    val cc = graft.operators.Dedup.connectedComponents(
      pairs.select(col("id1").as("doc1"), col("id2").as("doc2")), "doc1", "doc2")
    val canon = cc.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("canonical_id")).toMap
    clonePairs.foreach { p =>
      assert(canon(p.getLong(1)) == p.getLong(0),
        s"clone ${p.getLong(1)} should canonicalize to ${p.getLong(0)}")
    }
  }
}
