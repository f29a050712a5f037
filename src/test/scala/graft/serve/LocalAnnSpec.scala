package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Embeddings, Ivf, Opq, Pq}

/** The ANN serving contracts (round-15 verdict #4): LocalAnn's scalar
  * search is BIT-IDENTICAL to the Spark search for every family
  * (ivf / pq / opq), the /ann/search endpoint carries that equality
  * over real HTTP (float-exact JSON round trip), and the 422/503/405
  * error surface behaves like the other scoring endpoints. */
class LocalAnnSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  // a clustered 4-d corpus with enough structure that searches are
  // non-trivial: four planted directions + deterministic jitter
  private def corpus = (0 until 160).map { i =>
    val c = i % 4
    val base = Array.tabulate(4)(d => if (d == c) 1.0f else 0.05f)
    val jit = ((i * 7) % 13 - 6) / 120.0f
    (i.toLong, base.map(x => x + jit * ((i % 3) + 1)))
  }.toDF("vec_id", "embedding")

  private def queries = corpus.filter($"vec_id" < 12)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.orderBy("query_id", "neighbor_id").collect().map(r =>
      (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq

  private def hitsOf(idx: LocalAnn.Index, shortlist: Int, topK: Int): Seq[(Long, Long, Long)] =
    queries.collect().flatMap { r =>
      val qid = r.getLong(0)
      val v = r.getAs[scala.collection.Seq[Float]](1).toArray
      LocalAnn.search(idx, qid, v, shortlist, topK).map(h =>
        (qid, h.neighborId, java.lang.Double.doubleToLongBits(h.sim)))
    }.sortBy(t => (t._1, t._2)).toSeq

  test("pq family: LocalAnn.search is bit-identical to Pq.searchReranked " +
    "over the registered artifact") {
    val cb = Pq.train(corpus, "vec_id", "embedding", m = 2, k = 8)
    val enc = Pq.encode(corpus.select("vec_id", "embedding"), "embedding", cb)
    val root = java.nio.file.Files.createTempDirectory("graft_lann_pq").toString
    ModelRegistry.registerPq(spark, root, "pq", cb, Some(enc))
    val sparkSide = rows(Pq.searchReranked(
      ModelRegistry.loadPqCodes(spark, root, "pq"), "vec_id", "embedding",
      ModelRegistry.loadPq(spark, root, "pq"), queries, "vec_id", "embedding",
      shortlist = 20, topK = 5, dropSelf = true))
    val idx = LocalAnn.load(spark, root, "pq")
    assert(idx.family == "pq" && idx.size == 160)
    assert(hitsOf(idx, 20, 5) == sparkSide)
  }

  test("opq family: rotation is applied server-side; results bit-equal " +
    "the rotate-then-search Spark path") {
    val rot = Opq.trainRotation(corpus, "embedding", dim = 4, m = 2)
    val er = Opq.rotate(corpus, "vec_id", "embedding", rot)
    val cb = Pq.train(er, "vec_id", "embedding", m = 2, k = 8)
    val enc = Pq.encode(er, "embedding", cb)
    val root = java.nio.file.Files.createTempDirectory("graft_lann_opq").toString
    ModelRegistry.registerOpq(spark, root, "opq", rot, Some(cb), Some(enc))
    val qr = Opq.rotate(queries, "vec_id", "embedding",
      ModelRegistry.loadOpq(spark, root, "opq"))
    val sparkSide = rows(Pq.searchReranked(
      ModelRegistry.loadPqCodes(spark, root, "opq"), "vec_id", "embedding",
      ModelRegistry.loadPq(spark, root, "opq"), qr, "vec_id", "embedding",
      shortlist = 20, topK = 5, dropSelf = true))
    val idx = LocalAnn.load(spark, root, "opq")
    assert(idx.family == "opq" && idx.rot.nonEmpty)
    // LocalAnn takes the RAW (unrotated) query — the rotation is the
    // server's job, exactly what a deployment client expects
    assert(hitsOf(idx, 20, 5) == sparkSide)
  }

  test("ivf family: LocalAnn.search is bit-identical to Ivf.search") {
    val index = Ivf.build(corpus, "vec_id", "embedding", nLists = 4)
    val root = java.nio.file.Files.createTempDirectory("graft_lann_ivf").toString
    ModelRegistry.registerIvf(spark, root, "ivf", index)
    val sparkSide = rows(Ivf.search(ModelRegistry.loadIvf(spark, root, "ivf"),
      queries, "vec_id", "embedding", nProbe = 2, topK = 5))
    val idx = LocalAnn.load(spark, root, "ivf")
    assert(idx.family == "ivf" && idx.centroids.length == 4)
    assert(hitsOf(idx, 2, 5) == sparkSide) // shortlist == nProbe for ivf
  }

  test("/ann/search endpoint: transport parity, 422 validation, 503 " +
    "without an index, 405 on GET") {
    val cb = Pq.train(corpus, "vec_id", "embedding", m = 2, k = 8)
    val enc = Pq.encode(corpus.select("vec_id", "embedding"), "embedding", cb)
    val root = java.nio.file.Files.createTempDirectory("graft_lann_http").toString
    ModelRegistry.registerPq(spark, root, "pq", cb, Some(enc))
    val idx = LocalAnn.load(spark, root, "pq")
    // transport parity: the helper's parsed rows == the direct search
    val qs = queries.collect().map(r =>
      r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray).toSeq
    val viaHttp = HttpApi.annSearchOverHttp(qs, ("pq", idx), shortlist = 20, topK = 5)
      .flatMap { o =>
        val rs = o.path("results")
        (0 until rs.size()).map(i => (o.path("query_id").asLong,
          rs.get(i).path("neighbor_id").asLong,
          java.lang.Double.doubleToLongBits(rs.get(i).path("sim").asDouble)))
      }.sortBy(t => (t._1, t._2))
    assert(viaHttp == hitsOf(idx, 20, 5))
    // error surface on a live server
    val server = HttpApi.start(annModel = Some(("pq", idx)))
    def post(body: String) = {
      val r = client.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${server.port}/ann/search"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), mapper.readTree(r.body()))
    }
    try {
      assert(post("""{"query_id":1}""")._1 == 422)             // missing embedding
      assert(post("""{"embedding":[]}""")._1 == 422)            // empty
      assert(post("""{"embedding":[1,"x",3,4]}""")._1 == 422)   // non-numeric
      assert(post("""{"embedding":[1,2,3]}""")._1 == 422)       // wrong width
      assert(post("""{"embedding":[1,2,3,4],"top_k":0}""")._1 == 422)
      val ok = post("""{"query_id":0,"embedding":[1.0,0.05,0.05,0.05]}""")
      assert(ok._1 == 200 && ok._2.path("results").size() == 5 &&
        ok._2.path("family").asText == "pq")
      val r405 = client.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${server.port}/ann/search"))
          .GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r405.statusCode() == 405)
    } finally server.stop()
    // 503 when no index is loaded
    val bare = HttpApi.start()
    try {
      val r = client.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${bare.port}/ann/search"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"embedding":[1,2,3,4]}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 503)
    } finally bare.stop()
  }
}
