package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SQ8 scalar quantization contracts (round 17): exact per-dim ranges,
  * affine-encode determinism, bounded reconstruction error, parking,
  * save/load bit-identity, and the searchReranked exactness contract
  * (exhaustive shortlist ≡ brute force). */
class SqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(19)
    (0 until 300).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat() * 4f - 2f)))
      .toDF("vid", "v")
  }

  test("train: per-dim min/max are the exact order statistics, at any layout") {
    val q = Sq.train(vecs, "v", dim = 8)
    val rows = vecs.collect().map(_.getAs[scala.collection.Seq[Float]](1))
    for (d <- 0 until 8) {
      assert(q.mins(d) == rows.map(_(d)).min)
      assert(q.maxs(d) == rows.map(_(d)).max)
    }
    val q2 = Sq.train(vecs.repartition(17, $"vid" % 5), "v", dim = 8)
    assert(q2.mins.toSeq == q.mins.toSeq && q2.maxs.toSeq == q.maxs.toSeq)
  }

  test("encode: codes in [0,255], width dim; wrong-width rows park as null; " +
    "a constant dim codes to 0 and decodes to the constant") {
    val withConst = vecs.withColumn("v",
      concat(col("v"), array(lit(3.5f)))) // dim 9, last constant
      .unionByName(Seq((9000L, Array(1f, 2f))).toDF("vid", "v"))
    val q = Sq.train(withConst, "v", dim = 9)
    assert(q.maxs(8) == 3.5f && q.mins(8) == 3.5f)
    val enc = Sq.encode(withConst, "v", q)
    assert(enc.filter($"vid" === 9000L).head().isNullAt(2)) // parked
    val good = enc.filter($"vid" < 9000L)
    assert(good.filter(exists($"sq_codes", c => c < 0 || c > 255)).isEmpty)
    assert(good.filter(size($"sq_codes") =!= 9).isEmpty)
    assert(good.filter(element_at($"sq_codes", 9) =!= 0).isEmpty)
    val dec = good.select(Sq.decodeCol($"sq_codes", q).as("d"))
    assert(dec.filter(abs(element_at($"d", 9) - 3.5d) > 1e-12).isEmpty)
  }

  test("decode: reconstruction error is at most half a quantization step " +
    "per dim") {
    val q = Sq.train(vecs, "v", dim = 8)
    val halfStep = q.spans.max / 2 + 1e-9
    val err = Sq.encode(vecs, "v", q)
      .select(zip_with(col("v"), Sq.decodeCol($"sq_codes", q),
        (x, d) => abs(x.cast("double") - d)).as("e"))
      .select(max(array_max($"e"))).head().getDouble(0)
    assert(err <= halfStep, s"max reconstruction error $err > $halfStep")
  }

  test("save/load round-trips the quantizer bit-identically; reloaded " +
    "search equals fresh search") {
    val q = Sq.train(vecs, "v", dim = 8)
    val path = java.nio.file.Files.createTempDirectory("graft_sq").toString
    Sq.save(spark, q, path)
    val q2 = Sq.load(spark, path)
    assert(q2.mins.toSeq == q.mins.toSeq && q2.maxs.toSeq == q.maxs.toSeq)
    val enc = Sq.encode(vecs, "v", q).persist()
    val queries = vecs.filter($"vid" < 6)
    def res(qz: Sq.Quantizer) =
      Sq.searchReranked(enc, "vid", "v", qz, queries, "vid", "v",
        shortlist = 12, topK = 5, dropSelf = true)
        .orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq
    assert(res(q2) == res(q))
    enc.unpersist()
  }

  test("searchReranked: exhaustive shortlist reproduces brute force " +
    "bit-for-bit; tight shortlist keeps high recall") {
    val q = Sq.train(vecs, "v", dim = 8)
    val enc = Sq.encode(vecs, "v", q).persist()
    val queries = vecs.filter($"vid" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq
    val brute = rows(Embeddings.cosineTopK(queries, vecs, "vid", "vid", "v", k = 5))
    val exhaustive = rows(Sq.searchReranked(enc, "vid", "v", q, queries,
      "vid", "v", shortlist = 400, topK = 5, dropSelf = true))
    assert(exhaustive == brute)
    val tight = Sq.searchReranked(enc, "vid", "v", q, queries,
      "vid", "v", shortlist = 15, topK = 5, dropSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSet = brute.map(t => (t._1, t._2)).toSet
    val recall = (tight & bruteSet).size.toDouble / bruteSet.size
    assert(recall >= 0.9, s"tight-shortlist recall $recall below 0.9")
    enc.unpersist()
  }

  test("ivfSearchReranked: exhaustive shortlist is bit-identical to " +
    "Ivf.search at the same nProbe") {
    val index = Ivf.build(vecs, "vid", "v", nLists = 6)
    val q = Sq.train(index.assigned, index.vecCol, dim = 8)
    val enc = Sq.encode(index.assigned, index.vecCol, q).persist()
    val queries = vecs.filter($"vid" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq
    val composed = rows(Sq.ivfSearchReranked(index, q, enc, queries,
      "vid", "v", nProbe = 2, shortlist = 400, topK = 5, dropSelf = true))
    val ref = rows(Ivf.search(index, queries, "vid", "v", nProbe = 2, topK = 5))
    assert(composed == ref)
    enc.unpersist()
  }

  test("round-20 searchExhaustive/ivfSearchExhaustive equal the " +
    "shortlist-at-corpus-size forms bit-for-bit (incl. zero-norm parking)") {
    // a zero vector exercises the null-approx exclusion both paths share
    val withZero = vecs.unionByName(
      Seq((9100L, Array.fill(8)(0f))).toDF("vid", "v"))
    val q = Sq.train(withZero, "v", dim = 8)
    val enc = Sq.encode(withZero, "v", q).persist()
    val queries = withZero.filter($"vid" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(
            if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toSeq
    val viaShortlist = rows(Sq.searchReranked(enc, "vid", "v", q, queries,
      "vid", "v", shortlist = 400, topK = 5, dropSelf = true))
    val viaExhaustive = rows(Sq.searchExhaustive(enc, "vid", "v", q, queries,
      "vid", "v", topK = 5, dropSelf = true))
    assert(viaExhaustive == viaShortlist,
      "searchExhaustive must be the searchReranked(shortlist >= corpus) identity")
    val index = Ivf.build(withZero, "vid", "v", nLists = 6)
    val q2 = Sq.train(index.assigned, index.vecCol, dim = 8)
    val enc2 = Sq.encode(index.assigned, index.vecCol, q2).persist()
    val ivfShort = rows(Sq.ivfSearchReranked(index, q2, enc2, queries,
      "vid", "v", nProbe = 2, shortlist = 400, topK = 5, dropSelf = true))
    val ivfExh = rows(Sq.ivfSearchExhaustive(index, q2, enc2, queries,
      "vid", "v", nProbe = 2, topK = 5, dropSelf = true))
    assert(ivfExh == ivfShort,
      "ivfSearchExhaustive must be the ivfSearchReranked(shortlist >= corpus) identity")
    enc.unpersist(); enc2.unpersist()
  }

  test("hnswFromCodes: the graph stores the byte-code reconstructions " +
    "bit-for-bit, parked rows never enter, and exhaustive-beam + exact " +
    "rerank reproduces brute force") {
    val withBad = vecs
      .unionByName(Seq((9000L, Array(1f, 2f))).toDF("vid", "v")) // parks
    val q = Sq.train(vecs, "v", dim = 8)
    val enc = Sq.encode(withBad, "v", q)
    val g = Sq.hnswFromCodes(enc, "vid", q, m = 8, efConstruction = 64)
    assert(g.size == 300 && !g.ids.contains(9000L))
    // stored vectors ≡ decodeCol reconstructions, float-narrowed
    val dec = enc.filter($"vid" < 9000L)
      .select($"vid", Sq.decodeCol($"sq_codes", q).as("d"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]](1).map(_.toFloat).toSeq).toMap
    g.ids.zip(g.vecs).foreach { case (id, v) =>
      assert(v.toSeq == dec(id), s"node $id stores non-reconstruction values")
    }
    // exhaustive beam = whole corpus candidates; exact rerank = brute force
    val queries = vecs.filter($"vid" < 8)
    val exact = Embeddings.cosineTopK(queries, vecs, "vid", "vid", "v", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    val got = Sq.hnswSearchReranked(g, enc, "vid", "v", queries, "vid", "v",
        efSearch = g.size, shortlist = g.size, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    assert(got == exact)
  }
}
