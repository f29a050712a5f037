package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** TextOps.repetitionSignals — Gopher-style intra-doc repetition
  * signals (q105). Hand-computed gram counts on known strings, the
  * short-doc truncated-gram contract, and the planted-repetition flag
  * the q105 oracle relies on. */
class RepetitionSpec extends SparkSpec {

  private def signals(texts: (Long, String)*) = {
    import spark.implicits._
    TextOps.repetitionSignals(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
         r.getLong(4), r.getLong(5), r.getLong(6))).toMap
  }

  test("hand-computed gram counts: totals, distincts, top frequencies") {
    val m = signals(1L -> "a b a b a b", 2L -> "w x y z")
    // doc 1: 2-grams [ab, ba, ab, ba, ab] -> tot 5, dist 2, top 3
    //        3-grams [aba, bab, aba, bab] -> tot 4, dist 2, top 2
    assert(m(1L) == (5L, 2L, 3L, 4L, 2L, 2L))
    // doc 2: no repetition at all: dist == tot, top == 1
    assert(m(2L) == (3L, 3L, 1L, 2L, 2L, 1L))
  }

  test("short docs yield one truncated gram (total >= 1, fractions total)") {
    val m = signals(1L -> "solo", 2L -> "two tokens")
    assert(m(1L) == (1L, 1L, 1L, 1L, 1L, 1L))
    // "two tokens": one 2-gram; 3-gram truncates to the whole doc
    assert(m(2L) == (1L, 1L, 1L, 1L, 1L, 1L))
  }

  test("planted phrase repetition drives the q105 flag, clean text does not") {
    val phrase = "the quick brown fox jumps"
    val repeated = Seq.fill(12)(phrase).mkString(" ")
    val m = signals(1L -> repeated,
      2L -> "alpha bravo charlie delta echo foxtrot golf hotel india juliet")
    val (n2, d2, t2, n3, d3, _) = m(1L)
    // 60 tokens: 59 2-grams over <=6 distinct; top 2-gram frac >> 0.2
    assert(t2.toDouble / n2 > 0.2 && 1.0 - d3.toDouble / n3 > 0.3)
    val (cn2, cd2, ct2, cn3, cd3, ct3) = m(2L)
    assert(cd2 == cn2 && ct2 == 1L && cd3 == cn3 && ct3 == 1L)
  }

  test("invariants on real documents: dist <= tot, top*dist >= tot, fractions in [0,1]") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val sig = TextOps.repetitionSignals(docs, "doc_id", "text")
    val bad = sig.filter(
      col("d_2grams") > col("n_2grams") || col("d_3grams") > col("n_3grams") ||
        col("top_2gram") * col("d_2grams") < col("n_2grams") ||
        col("top_3gram") * col("d_3grams") < col("n_3grams") ||
        col("top_2gram") > col("n_2grams") || col("top_3gram") > col("n_3grams"))
    assert(bad.isEmpty, "repetition-signal invariants violated")
    assert(sig.count() == docs.count())
  }

  test("plan guard: repetitionSignals has ZERO exchanges (the round-9 scale claim)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val sig = TextOps.repetitionSignals(docs, "doc_id", "text")
    sig.collect()
    val exchanges = sig.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"expected a pure map-side plan, found ${exchanges.size} exchange(s):\n" +
        sig.queryExecution.executedPlan)
  }
}
