package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The driver parses ONE bench line out of a ~2,000-byte output tail
  * (round-14 verdict #1: the 156-query record overflowed it and parsed
  * null). These tests pin the renderer's hard bound at battery sizes
  * well past the current one, so adding queries can never silently
  * re-break the driver's parse. */
class BenchRecordSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def battery(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%03d_some_longer_query_name", 7.0 + (i % 89) * 1.37))

  test("200-query record stays under the tail-window bound and parses") {
    val rec = BenchRecord.render(battery(200), Nil,
      """{"cpus":32,"jvm":"17.0.10","gb":113,"nq":200,"k":3,"mode":"cold"}""",
      "sf0.1")
    assert(rec.length <= BenchRecord.MaxRecordBytes)
    val node = mapper.readTree(rec) // throws on invalid JSON
    assert(node.get("metric").asText == "total")
    assert(math.abs(node.get("value").asDouble - battery(200).map(_._2).sum) < 0.01)
  }

  test("every battery size 1..300 fits, parses, and names failures") {
    (1 to 300).foreach { n =>
      val failed = if (n >= 2) Seq(battery(n).head._1) else Nil
      val rec = BenchRecord.render(battery(n), failed, """{"k":3}""", "sf0.1")
      assert(rec.length <= BenchRecord.MaxRecordBytes, s"overflow at n=$n")
      val node = mapper.readTree(rec)
      if (failed.nonEmpty) {
        val f = node.get("failed").get(0).asText
        // failed names share the key space of whichever tier rendered
        // the queries map ("q001" at tiers A/B and summary, "001" at B2)
        assert(f == "q001" || f == "001")
        if (node.has("queries"))
          assert(node.get("queries").has(f), s"failed key '$f' not in queries map at n=$n")
      }
      // whichever tier fired, the per-query numbers must be reachable:
      // inline map, or via the detail-file pointer
      assert(node.has("queries") || node.get("detail").asText == "BENCH_DETAIL.json")
    }
  }

  test("small batteries keep the 2-decimal inline map (tier A)") {
    val rec = BenchRecord.render(battery(100), Nil, """{"k":3}""", "sf0.1")
    val node = mapper.readTree(rec)
    assert(node.has("queries") && node.get("queries").size == 100)
    // 2-decimal precision survives: 7 + (1%89)*1.37 = 8.37
    assert(node.get("queries").get("q001").asText.contains("8.37"))
  }

  test("current battery (SparkEntry.queries) fits with per-query data inline") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => (n, 2.47)) // realistic per-query seconds
    val rec = BenchRecord.render(results, Nil,
      """{"cpus":32,"jvm":"17.0.10","gb":113,"nq":%d,"k":3,"mode":"cold"}"""
        .format(names.size), "sf0.1")
    assert(rec.length <= BenchRecord.MaxRecordBytes)
    val node = mapper.readTree(rec)
    assert(node.has("queries"), "current battery should still fit an inline map tier")
    assert(node.get("queries").size == names.size)
    // short keys are unique by construction — a collision would silently
    // drop a query from the driver's map
    assert(names.map(BenchRecord.shortKey).distinct.size == names.size)
  }

  test("detail companion carries full names, med and min, valid JSON") {
    val det = BenchRecord.detailJson(
      Seq(("q01_pricing_summary", 1.234, 1.111), ("q02_filter_project", 0.5, 0.4)),
      Seq("q02_filter_project"), 3, """{"k":3}""", "sf0.1")
    val node = mapper.readTree(det)
    assert(node.get("queries").get("q01_pricing_summary").get("med").asDouble == 1.234)
    assert(node.get("queries").get("q01_pricing_summary").get("min").asDouble == 1.111)
    assert(node.get("failed").get(0).asText == "q02_filter_project")
  }
}
