package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** HNSW contracts (round 17, Malkov & Yashunin 2016): recall against
  * exact brute force, input-order independence, save/load + registry
  * bit-identity, self-exclusion, and the LocalAnn serving mirror. */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = {
    val rnd = new scala.util.Random(31)
    (0 until 400).map(i => (i.toLong, Array.fill(32)(rnd.nextFloat() - 0.5f)))
  }
  private lazy val vecs = rows.toDF("vid", "v")

  test("search recall vs exact brute force clears 0.9 on a random corpus") {
    val g = Hnsw.build(rows, m = 8, efConstruction = 64)
    val queries = rows.take(10)
    val exact = Embeddings.cosineTopK(vecs.filter($"vid" < 10), vecs,
        "vid", "vid", "v", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = queries.flatMap { case (qid, qv) =>
      Hnsw.search(g, qv, efSearch = 64, topK = 5, dropId = Some(qid))
        .map(h => (qid, h._1))
    }
    val recall = hits.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.9, s"hnsw recall $recall below 0.9")
    // self is never returned
    assert(hits.forall { case (q, n) => q != n })
  }

  test("build is input-order independent (nodes sort by id; levels are " +
    "a pure function of the id)") {
    val g1 = Hnsw.build(rows, m = 8, efConstruction = 64)
    val g2 = Hnsw.build(scala.util.Random.shuffle(rows), m = 8,
      efConstruction = 64)
    val q = rows(3)._2
    assert(Hnsw.search(g1, q, 64, 5) == Hnsw.search(g2, q, 64, 5))
    assert(g1.levels.toSeq == g2.levels.toSeq)
    assert(g1.maxLevel == g2.maxLevel)
  }

  test("save/load + registry: reloaded graph searches bit-identically; " +
    "kindOf reports hnsw; LocalAnn serves the family") {
    val g = Hnsw.fromDataFrame(vecs, "vid", "v", m = 8, efConstruction = 64)
    val root = java.nio.file.Files.createTempDirectory("graft_hnsw").toString
    graft.serve.ModelRegistry.registerHnsw(spark, root, "hnsw", g)
    assert(graft.serve.ModelRegistry.kindOf(spark, root, "hnsw") == "hnsw")
    val g2 = graft.serve.ModelRegistry.loadHnsw(spark, root, "hnsw")
    val qs = rows.take(8)
    for ((qid, qv) <- qs) {
      val fresh = Hnsw.search(g, qv, 64, 5, dropId = Some(qid))
      assert(Hnsw.search(g2, qv, 64, 5, dropId = Some(qid)) == fresh)
    }
    // LocalAnn: the fifth served family — search() mirrors Hnsw.search,
    // shortlist doubles as efSearch
    val idx = graft.serve.LocalAnn.load(spark, root, "hnsw")
    assert(idx.family == "hnsw" && idx.hnsw.nonEmpty && idx.size == 400)
    for ((qid, qv) <- qs) {
      val served = graft.serve.LocalAnn.search(idx, qid, qv, 64, 5)
        .map(h => (h.neighborId, h.sim))
      assert(served == Hnsw.search(g, qv, 64, 5, dropId = Some(qid)))
    }
    // filters are a loud error for this family
    intercept[IllegalArgumentException] {
      graft.serve.LocalAnn.search(idx, 0L, rows.head._2, 64, 5,
        allow = Map("label" -> Set(1L)))
    }
    intercept[IllegalArgumentException] {
      graft.serve.LocalAnn.load(spark, root, "hnsw", attrCols = Seq("label"))
    }
  }
}
