package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp

import com.fasterxml.jackson.databind.ObjectMapper

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end HTTP parity with the reference API (`api/main.py`):
  * same endpoints, same response fields, scores bit-equal to
  * LocalScorer (which TransactionSpec already proves equal to the
  * Spark Column path — so HTTP == local == distributed). */
class HttpApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val mapper = new ObjectMapper()
  private var server: HttpApi.Server = _
  private lazy val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    server = HttpApi.start(inventory = () => Seq(
      HttpApi.ModelInfo("gbt_fraud", 2L, Map("auc" -> 0.99))))
  }
  override def afterAll(): Unit = if (server != null) server.stop()

  private def get(path: String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.port}$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readTree(r.body()))
  }

  private def post(path: String, body: String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.port}$path"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readTree(r.body()))
  }

  // the reference dashboard's "High risk" preset (static/index.html)
  private val highRisk =
    """{"transaction_id":"TXN1","user_id":"U1","transaction_amount":15000,
       |"merchant_id":"M1","product_code":"Z","card_type":"visa",
       |"transaction_timestamp":"2026-02-12T03:00:00"}""".stripMargin

  test("POST /score: response shape + scores bit-equal to LocalScorer") {
    val (code, j) = post("/score", highRisk)
    assert(code == 200)
    val expected = LocalScorer.score(Transaction(
      transaction_id = "TXN1", user_id = "U1", transaction_amount = 15000,
      merchant_id = "M1", product_code = "Z",
      transaction_timestamp = Timestamp.valueOf("2026-02-12 03:00:00")))
    assert(j.get("transaction_id").asText == "TXN1")
    assert(j.get("fraud_score").asDouble == math.rint(expected.riskScore * 1e4) / 1e4)
    assert(j.get("is_fraud").asBoolean == expected.isFraud)
    assert(j.get("risk_level").asText == expected.riskLevel)
    assert(j.get("confidence").asDouble == math.rint(expected.confidence * 1e4) / 1e4)
    assert(j.get("model_used").asText == "Heuristic")
    assert(j.get("processing_time_ms").isNumber)
    val reasons = (0 until j.get("reasons").size()).map(j.get("reasons").get(_).asText)
    assert(reasons == expected.reasons)
    assert(reasons.contains("very_high_amount") && reasons.contains("unusual_hour")
      && reasons.contains("unusual_product") && reasons.contains("missing_device"))
  }

  test("POST /score: defaults applied, empty reasons serialize as null") {
    val (code, j) = post("/score",
      """{"transaction_id":"TXN2","user_id":"U1","transaction_amount":20,
        |"merchant_id":"M1","device_info":"Chrome",
        |"transaction_timestamp":"2026-02-12T12:00:00"}""".stripMargin)
    assert(code == 200)
    assert(j.get("risk_level").asText == "MINIMAL")
    assert(!j.get("is_fraud").asBoolean)
    assert(j.get("reasons").isNull) // reference: `reasons or None`
  }

  test("POST /score: validation failures are 422 with detail") {
    val (c1, j1) = post("/score",
      """{"transaction_id":"T","user_id":"U","transaction_amount":-5,"merchant_id":"M"}""")
    assert(c1 == 422 && j1.get("detail").asText.contains("transaction_amount"))
    val (c2, _) = post("/score", """{"user_id":"U","transaction_amount":5}""")
    assert(c2 == 422)
    val (c3, _) = post("/score", "this is not json")
    assert(c3 == 500 || c3 == 422) // malformed body never kills the worker
  }

  test("POST /score/batch: counts frauds, preserves order") {
    val batch =
      s"""{"transactions":[
         |{"transaction_id":"A","user_id":"U","transaction_amount":10,
         | "merchant_id":"M","device_info":"d","transaction_timestamp":"2026-02-12T12:00:00"},
         |{"transaction_id":"B","user_id":"U","transaction_amount":15000,
         | "merchant_id":"M","product_code":"Z","transaction_timestamp":"2026-02-12T03:00:00"}
         |]}""".stripMargin
    val (code, j) = post("/score/batch", batch)
    assert(code == 200)
    assert(j.get("total_transactions").asInt == 2)
    assert(j.get("fraud_count").asInt == 1)
    assert(j.get("results").get(0).get("transaction_id").asText == "A")
    assert(j.get("results").get(1).get("transaction_id").asText == "B")
    assert(j.get("total_processing_time_ms").isNumber)
  }

  test("GET /health, /api-info, /models expose the inventory") {
    val (hc, h) = get("/health")
    assert(hc == 200 && h.get("status").asText == "healthy")
    assert(h.get("models_loaded").get(0).asText == "gbt_fraud")
    val (_, info) = get("/api-info")
    assert(info.get("service").asText == "Fraud Detection API")
    val (mc, m) = get("/models")
    assert(mc == 200 && m.get("total_loaded").asInt == 1)
    val entry = m.get("models").get("gbt_fraud")
    assert(entry.get("loaded").asBoolean && entry.get("version").asLong == 2L)
    assert(entry.get("metrics").get("auc").asDouble == 0.99)
  }

  test("GET /stats: running counters accumulate across requests") {
    val (_, before) = get("/stats")
    val n0 = before.get("total_predictions").asLong
    post("/score", highRisk); post("/score", highRisk)
    val (_, after) = get("/stats")
    assert(after.get("total_predictions").asLong == n0 + 2)
    assert(after.get("average_latency_ms").asDouble >= 0.0)
    assert(after.get("primary_model").asText == "GBT_FRAUD")
  }

  test("unknown route 404, wrong method 405") {
    assert(get("/nope")._1 == 404)
    assert(get("/score")._1 == 405)
    assert(post("/health", "{}")._1 == 405)
  }

  test("POST /score/sequence: 503 without a sequence model; batch /score unaffected") {
    // the default server (beforeAll) has no seqModel
    val (code, j) = post("/score/sequence",
      """{"user_id":"U1","transactions":[]}""")
    assert(code == 503)
    assert(j.get("detail").asText.contains("no sequence model"))
  }

  test("POST /score/sequence: parity with the hook, response shape, 422 paths") {
    // deterministic stand-in sequence model (the hook contract is any
    // Seq[Transaction] => Double; the registry-loaded BiLstm path is
    // spec'd in ServeSpec and oracle-gated end to end by q142)
    val hook: Seq[Transaction] => Double =
      ts => math.min(1.0, ts.map(_.transaction_amount).sum / 50000.0)
    val seqServer = HttpApi.start(seqModel = Some(("BILSTM", hook)))
    def postSeq(body: String) = {
      val r = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${seqServer.port}/score/sequence"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), mapper.readTree(r.body()))
    }
    try {
      val body =
        """{"user_id":"U9","transactions":[
          |{"transaction_id":"A","user_id":"U9","transaction_amount":20000,
          | "merchant_id":"M","transaction_timestamp":"2026-02-12T12:00:00"},
          |{"transaction_id":"B","user_id":"U9","transaction_amount":15000,
          | "merchant_id":"M","transaction_timestamp":"2026-02-12T13:00:00"}
          |]}""".stripMargin
      val (code, j) = postSeq(body)
      assert(code == 200)
      val expected = (20000.0 + 15000.0) / 50000.0
      assert(j.get("user_id").asText == "U9")
      assert(j.get("sequence_length").asInt == 2)
      assert(j.get("fraud_probability").asDouble ==
        math.rint(expected * 1e4) / 1e4)
      assert(j.get("is_fraud").asBoolean == (expected >= 0.5))
      assert(j.get("model_used").asText == "BILSTM")
      assert(j.get("processing_time_ms").isNumber)
      // top-level user_id absent → falls back to the first
      // transaction's (both txns carry user_id U9 in `body`)
      val noUid = body.replaceFirst("""\{"user_id":"U9",""", "{")
      val (c2, j2) = postSeq(noUid)
      assert(c2 == 200 && j2.get("user_id").asText == "U9")
      // 422: empty transactions array
      val (c3, j3) = postSeq("""{"user_id":"U","transactions":[]}""")
      assert(c3 == 422 && j3.get("detail").asText.contains("non-empty"))
      // 422: transactions not an array
      assert(postSeq("""{"user_id":"U","transactions":"x"}""")._1 == 422)
      // 422: one malformed transaction fails the whole sequence
      val bad =
        """{"user_id":"U","transactions":[
          |{"transaction_id":"A","user_id":"U","transaction_amount":-5,
          | "merchant_id":"M"}]}""".stripMargin
      val (c4, j4) = postSeq(bad)
      assert(c4 == 422 && j4.get("detail").asText.contains("transaction_amount"))
    } finally seqServer.stop()
  }

  test("POST /score with a model hook serves the 0.4/0.6 blend and names the model") {
    // deterministic stand-in model (the hook contract is any
    // Transaction => Double; the registry-loaded LeafBoost path is
    // oracle-gated end to end by q137)
    val hook: Transaction => Double = t => math.min(1.0, t.transaction_amount / 20000.0)
    val blendServer = HttpApi.start(model = Some(("LEAFBOOST", hook)))
    try {
      val r = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${blendServer.port}/score"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(highRisk)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200)
      val j = mapper.readTree(r.body())
      val t = Transaction(
        transaction_id = "TXN1", user_id = "U1", transaction_amount = 15000,
        merchant_id = "M1", product_code = "Z",
        transaction_timestamp = Timestamp.valueOf("2026-02-12 03:00:00"))
      val expected = LocalScorer.score(t, Some(hook))
      val heuristicOnly = LocalScorer.score(t)
      // blend arithmetic: m·0.4 + h·0.6 clipped — op-for-op RiskScore.blend
      val blend = math.min(1.0, math.max(0.0,
        hook(t) * 0.4 + heuristicOnly.riskScore * 0.6))
      assert(expected.riskScore == blend)
      assert(j.get("fraud_score").asDouble == math.rint(blend * 1e4) / 1e4)
      assert(j.get("risk_level").asText == expected.riskLevel)
      assert(j.get("is_fraud").asBoolean == expected.isFraud)
      assert(j.get("confidence").asDouble == math.rint(expected.confidence * 1e4) / 1e4)
      assert(j.get("model_used").asText == "LEAFBOOST")
      // reasons stay rule-based (heuristic rules), regardless of model
      val reasons = (0 until j.get("reasons").size()).map(j.get("reasons").get(_).asText)
      assert(reasons == heuristicOnly.reasons)
    } finally blendServer.stop()
  }
}
