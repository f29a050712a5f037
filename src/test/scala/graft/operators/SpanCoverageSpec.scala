package graft.operators

import graft.SparkSpec

/** Exact substring-span coverage contracts (bulk correctness is
  * oracle-gated by q152; this pins the POSITIONAL semantics — the three
  * cases a natural corpus blurs together: cross-doc sharing, within-doc
  * repetition, and repeated positions of one shared gram). */
class SpanCoverageSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    // d0/d1 share the 8-token span "p q r s t u v w"
    (0L, "p q r s t u v w x"),                       // 9 toks -> 2 grams
    (1L, "z p q r s t u v w end2"),                  // 10 toks -> 3 grams
    // d2 repeats its own 8-gram WITHIN the doc only — never shared
    (2L, "m n o p2 q2 r2 s2 t2 m n o p2 q2 r2 s2 t2"), // 16 toks -> 9 grams
    // d3 repeats a gram d4 also has: BOTH positions count
    (3L, "g h i j k l m n g h i j k l m n"),         // 16 toks -> 9 grams
    (4L, "pre g h i j k l m n"),                     // 9 toks -> 2 grams
    (5L, "one two three")                            // < 8 toks -> absent
  ).toDF("doc_id", "text")

  private lazy val out =
    Dedup.spanCoverage(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("cross-doc shared span counts at every holder") {
    assert(out(0L) == ((2L, 1L)))
    assert(out(1L) == ((3L, 1L)))
  }

  test("within-doc repetition alone is NOT shared (distinct-doc gate)") {
    assert(out(2L) == ((9L, 0L)))
  }

  test("positional counting: a doc holding a shared gram twice counts both") {
    assert(out(3L) == ((9L, 2L)))
    assert(out(4L) == ((2L, 1L)))
  }

  test("docs shorter than n tokens are absent (sparse semantics)") {
    assert(!out.contains(5L))
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("span length below 2 is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.spanCoverage(docs, "doc_id", "text", n = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.removeDupSpans(docs, "doc_id", "text", n = 1)
    }
  }

  // ---- removal (round 17 — the measurement→action gap): cut every
  // position covered by a cross-doc shared gram, except in the gram's
  // canonical (min-id) doc, and reassemble the survivors in order

  private lazy val removed =
    Dedup.removeDupSpans(docs, "doc_id", "text", n = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("removal: canonical doc keeps its span; every other holder loses " +
    "exactly the covered positions") {
    // d0 is canonical for "p q r s t u v w" (min id) — intact
    assert(removed(0L) == ((9L, 0L, "p q r s t u v w x")))
    // d1 holds it at position 2 — tokens 2..9 excised, survivors rejoin
    assert(removed(1L) == ((10L, 8L, "z end2")))
    // d3 is canonical for "g h i j k l m n" — BOTH its occurrences stay
    assert(removed(3L) == ((16L, 0L, "g h i j k l m n g h i j k l m n")))
    // d4 holds it at position 2 — only its prefix token survives
    assert(removed(4L) == ((9L, 8L, "pre")))
  }

  test("removal: within-doc-only repetition and short docs pass intact") {
    assert(removed(2L)._2 == 0L &&
      removed(2L)._3 == "m n o p2 q2 r2 s2 t2 m n o p2 q2 r2 s2 t2")
    assert(removed(5L) == ((3L, 0L, "one two three")))
    // one row per input doc — nothing disappears, even short docs
    assert(removed.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("removal: the cleaned corpus has zero cross-doc span coverage") {
    val cleaned = Dedup.removeDupSpans(docs, "doc_id", "text", n = 8)
      .selectExpr("doc_id", "cleaned_text AS text")
    val cov = Dedup.spanCoverage(cleaned, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cov.values.forall(_ == 0L),
      s"cleaned corpus must have no shared spans left: $cov")
  }
}
