package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._

import graft.serve.{LocalScorer, ModelRegistry, Transaction}

/** The serving entry point end to end: registry → Serve.build → real
  * HTTP. With a registered `serving` LeafBoost the API blends; with a
  * mismatched-schema model it falls back to heuristic-only (stderr
  * note, no crash). */
class ServeSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readTree(r.body()))
  }
  private def get(port: Int, path: String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readTree(r.body()))
  }

  private val txn =
    """{"transaction_id":"T1","user_id":"U","transaction_amount":1500,
       |"merchant_id":"M","product_code":"Z",
       |"transaction_timestamp":"2026-02-12T03:00:00"}""".stripMargin

  private def trainServing(n: Int): graft.ml.LeafBoost.Model = {
    val df = spark.range(n).select(
      col("id"),
      (col("id") % 997 * 7.0 + 10.0).as("amount"),
      (col("id") % 24).cast("double").as("hour_of_day"),
      (col("id") % 3 === 0).cast("double").as("device_missing"),
      (col("id") % 5 === 0).cast("double").as("unusual_product"),
      ((col("id") % 997 * 7.0 + 10.0) > 3000.0).cast("double").as("label"),
      lit(1.0).as("weight"))
    graft.ml.LeafBoost.train(df, None, "id",
      LocalScorer.servingFeatureNames, "label", "weight",
      graft.ml.LeafBoost.Params(numTrees = 4, numLeaves = 6))
  }

  test("Serve.build with a registered serving model blends; health lists models") {
    val root = Files.createTempDirectory("graft_serve_reg").toString
    val m = trainServing(2000)
    ModelRegistry.registerLeafBoost(spark, root, "serving", m, Map("auc" -> 0.9))
    val server = Serve.build(spark, root, port = 0)
    try {
      val (hc, hj) = get(server.port, "/health")
      assert(hc == 200 && hj.get("status").asText == "healthy")
      assert((0 until hj.get("models_loaded").size())
        .map(hj.get("models_loaded").get(_).asText).contains("serving"))
      val (sc, sj) = post(server.port, "/score", txn)
      assert(sc == 200)
      assert(sj.get("model_used").asText == "LEAFBOOST")
      // exact blend: LocalScorer with the same hook
      val t = Transaction(transaction_id = "T1", user_id = "U",
        transaction_amount = 1500, merchant_id = "M", product_code = "Z",
        transaction_timestamp = java.sql.Timestamp.valueOf("2026-02-12 03:00:00"))
      val expected = LocalScorer.score(t, Some(LocalScorer.leafBoostHook(m)))
      assert(sj.get("fraud_score").asDouble ==
        math.rint(expected.riskScore * 1e4) / 1e4)
      assert(sj.get("risk_level").asText == expected.riskLevel)
      // /models reports the artifact family
      val (_, mj) = get(server.port, "/models")
      assert(mj.get("models").get("serving").get("kind").asText == "leafboost")
    } finally server.stop()
  }

  test("Serve.build serves a CATEGORICAL (product_code) model; unseen code parks; bit-equal to the Spark path") {
    val root = Files.createTempDirectory("graft_serve_regcat").toString
    // categorical serving schema: product_code is a raw string feature
    // (dict {A,B,W}); "Z"/"Q" are unseen at train time
    val df = spark.range(2000).select(
      col("id"),
      (col("id") % 997 * 7.0 + 10.0).as("amount"),
      (col("id") % 24).cast("double").as("hour_of_day"),
      (col("id") % 3 === 0).cast("double").as("device_missing"),
      when(col("id") % 5 === 0, "A").when(col("id") % 5 === 1, "B")
        .otherwise("W").as("product_code"),
      ((col("id") % 997 * 7.0 + 10.0) > 3000.0).cast("double").as("label"),
      lit(1.0).as("weight"))
    val m = graft.ml.LeafBoost.train(df, None, "id",
      Seq("amount", "hour_of_day", "device_missing"), "label", "weight",
      graft.ml.LeafBoost.Params(numTrees = 4, numLeaves = 6),
      catCols = Seq("product_code"))
    assert(m.catDicts.keySet == Set(3))
    ModelRegistry.registerLeafBoost(spark, root, "serving", m, Map("auc" -> 0.9))
    val server = Serve.build(spark, root, port = 0)
    try {
      // seen ("B") and unseen ("Z") product codes both serve the blend
      for (code <- Seq("B", "Z")) {
        val body = txn.replace("\"product_code\":\"Z\"", s""""product_code":"$code"""")
        val (sc, sj) = post(server.port, "/score", body)
        assert(sc == 200)
        assert(sj.get("model_used").asText == "LEAFBOOST")
        val t = Transaction(transaction_id = "T1", user_id = "U",
          transaction_amount = 1500, merchant_id = "M", product_code = code,
          transaction_timestamp = java.sql.Timestamp.valueOf("2026-02-12 03:00:00"))
        val expected = LocalScorer.score(t, Some(LocalScorer.leafBoostHook(m)))
        assert(sj.get("fraud_score").asDouble ==
          math.rint(expected.riskScore * 1e4) / 1e4, s"code=$code")
        assert(sj.get("risk_level").asText == expected.riskLevel)
      }
      // the hook's model term is bit-equal to LeafBoost.score on the
      // same mixed frame (string column scored map-side via the dict)
      val probeCodes = Seq("A", "B", "W", "Z", "Q")
      val probe = probeCodes.toDF("product_code").select(
        lit(1500.0).as("amount"), lit(3.0).as("hour_of_day"),
        lit(0.0).as("device_missing"), col("product_code"))
      val sparkP = graft.ml.LeafBoost.score(probe,
          LocalScorer.servingFeatureNamesCat, m, out = "p")
        .select("product_code", "p").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      probeCodes.foreach { code =>
        val t = Transaction(transaction_id = "T", user_id = "U",
          transaction_amount = 1500, merchant_id = "M", product_code = code,
          transaction_timestamp = java.sql.Timestamp.valueOf("2026-02-12 03:00:00"))
        assert(m.probabilityMixed(LocalScorer.servingFeaturesMixed(t)) ==
          sparkP(code), s"code=$code")
      }
      // unseen codes Z and Q share the reserved bin → identical model term
      assert(sparkP("Z") == sparkP("Q"))
    } finally server.stop()
  }

  test("Serve.build wires /score/sequence from a registered serving_seq BiLstm; parity with BiLstm.scoreSequences; dim mismatch disables") {
    val root = Files.createTempDirectory("graft_serve_seq").toString
    val dim = LocalScorer.servingFeatureNames.length
    // deterministic training sequences over the SERVING feature map
    // (LocalScorer.servingFeatures — the one definition both the hook
    // and the Spark scoring twin consume)
    def txn(i: Int, amt: Double): Transaction = Transaction(
      transaction_id = s"T$i", user_id = "U", transaction_amount = amt,
      merchant_id = "M", product_code = if (i % 4 == 0) "Z" else "W",
      device_info = if (i % 3 == 0) None else Some("dev"),
      transaction_timestamp =
        java.sql.Timestamp.from(java.time.Instant.parse("2026-02-12T00:00:00Z")
          .plusSeconds(i * 3600L)))
    val train = (0 until 60).map { s =>
      val amts = (0 until 3).map(j => 50.0 + ((s * 3 + j) % 7) * 900.0)
      val seq = amts.zipWithIndex.map { case (a, j) =>
        LocalScorer.servingFeatures(txn(s * 3 + j, a))
      }.toArray
      val label = if (amts.sum / 3 > 2000.0) 1.0 else 0.0
      (seq, label, 1.0)
    }
    val m = graft.ml.BiLstm.train(train, dim, hidden = 4, attDim = 3,
      epochs = 25, lr = 0.05, seed = 7L)
    ModelRegistry.registerBiLstm(spark, root, "serving_seq", m, Map("auc" -> 0.8))
    val server = Serve.build(spark, root, port = 0)
    try {
      assert(server.seqModel.map(_._1).contains("BILSTM"))
      // real HTTP round trip on a fresh 2-step sequence
      val body =
        """{"user_id":"U7","transactions":[
          |{"transaction_id":"S1","user_id":"U7","transaction_amount":4500,
          | "merchant_id":"M","product_code":"Z",
          | "transaction_timestamp":"2026-02-12T03:00:00"},
          |{"transaction_id":"S2","user_id":"U7","transaction_amount":120,
          | "merchant_id":"M","device_info":"dev",
          | "transaction_timestamp":"2026-02-12T04:00:00"}
          |]}""".stripMargin
      val (code, j) = post(server.port, "/score/sequence", body)
      assert(code == 200)
      val txns = Seq(
        Transaction(transaction_id = "S1", user_id = "U7",
          transaction_amount = 4500, merchant_id = "M", product_code = "Z",
          transaction_timestamp = java.sql.Timestamp.from(
            java.time.Instant.parse("2026-02-12T03:00:00Z"))),
        Transaction(transaction_id = "S2", user_id = "U7",
          transaction_amount = 120, merchant_id = "M",
          device_info = Some("dev"),
          transaction_timestamp = java.sql.Timestamp.from(
            java.time.Instant.parse("2026-02-12T04:00:00Z"))))
      // the registry-RELOADED model is what serves (Serve.build loads
      // it back; doubles round-trip bit-exactly in parquet)
      val reloaded = ModelRegistry.loadBiLstm(spark, root, "serving_seq")
      val expected = LocalScorer.biLstmHook(reloaded)(txns)
      assert(j.get("fraud_probability").asDouble ==
        math.rint(expected * 1e4) / 1e4)
      assert(j.get("user_id").asText == "U7")
      assert(j.get("sequence_length").asInt == 2)
      assert(j.get("is_fraud").asBoolean == (expected >= 0.5))
      assert(j.get("model_used").asText == "BILSTM")
      // parity with the DISTRIBUTED scoring twin: scoreSequences over a
      // frame holding the same serving-feature steps emits the same
      // probability (both paths are BiLstmModel.predict — the serving
      // asymmetry the round-12 verdict's #8 closed)
      val seqArr = txns.map(t => LocalScorer.servingFeatures(t).toSeq)
      val df = Seq((1L, seqArr)).toDF("seq_id", "seq")
      val sparkP = graft.ml.BiLstm.scoreSequences(df, "seq", reloaded)
        .select("p_fraud").head().getDouble(0)
      assert(sparkP == expected)
      // /models reports the artifact family
      val (_, mj) = get(server.port, "/models")
      assert(mj.get("models").get("serving_seq").get("kind").asText == "bilstm")
    } finally server.stop()
    // a serving_seq model with the WRONG dim is rejected at startup —
    // /score/sequence answers 503, never silently mis-scores
    val root2 = Files.createTempDirectory("graft_serve_seq2").toString
    val wrongDim = graft.ml.BiLstm.train(
      IndexedSeq((Array(Array(1.0, 2.0, 3.0)), 1.0, 1.0)),
      dim = 3, hidden = 2, attDim = 2, epochs = 1)
    ModelRegistry.registerBiLstm(spark, root2, "serving_seq", wrongDim)
    val disabled = Serve.build(spark, root2, port = 0)
    try {
      assert(disabled.seqModel.isEmpty)
      val (c, dj) = post(disabled.port, "/score/sequence",
        """{"user_id":"U","transactions":[{"transaction_id":"A","user_id":"U",
          |"transaction_amount":10,"merchant_id":"M",
          |"transaction_timestamp":"2026-02-12T12:00:00"}]}""".stripMargin)
      assert(c == 503 && dj.get("detail").asText.contains("no sequence model"))
    } finally disabled.stop()
  }

  test("Serve.build without a serving model (or mismatched schema) is heuristic-only") {
    val root = Files.createTempDirectory("graft_serve_reg2").toString
    // empty registry → heuristic
    val bare = Serve.build(spark, root, port = 0)
    try {
      val (_, j) = post(bare.port, "/score", txn)
      assert(j.get("model_used").asText == "Heuristic")
    } finally bare.stop()
    // model registered under the serving name but trained on the WRONG
    // feature schema → refused (fallback), never silently mis-scored
    val wrong = graft.ml.LeafBoost.train(
      spark.range(500).select(col("id"),
        (col("id") % 7).cast("double").as("x1"),
        (col("id") % 3).cast("double").as("x2"),
        (col("id") % 2).cast("double").as("label"), lit(1.0).as("weight")),
      None, "id", Seq("x1", "x2"), "label", "weight",
      graft.ml.LeafBoost.Params(numTrees = 2, numLeaves = 4))
    ModelRegistry.registerLeafBoost(spark, root, "serving", wrong)
    val fallback = Serve.build(spark, root, port = 0)
    try {
      val (_, j2) = post(fallback.port, "/score", txn)
      assert(j2.get("model_used").asText == "Heuristic")
    } finally fallback.stop()
  }
}
