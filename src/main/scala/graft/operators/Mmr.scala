package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity selector of the retrieval/curation tier: from a
  * per-query candidate list, greedily pick k items trading relevance
  * against redundancy with what is already picked:
  *
  *   step 1:  argmax rel(d)
  *   step i:  argmax λ·rel(d) − (1−λ)·max_{s∈picked} sim(d, s)
  *
  * This is what turns a near-duplicate-heavy top-N (retrieval over an
  * undeduplicated corpus, ANN over clustered embeddings) into a USEFUL
  * top-k — the classic use next to search is diverse example selection
  * for few-shot prompting and dedup-aware sampling of training data.
  *
  * Execution shape: the greedy is inherently sequential PER QUERY but
  * embarrassingly parallel ACROSS queries, and candidates are bounded
  * by the caller's top-N — so each group is a bounded in-memory
  * problem. `flatMapGroups` over the query key is the honest Spark
  * form (millions of queries scale out; no driver collect, no
  * cross-query state). Candidate-pair similarity is O(N²·dim) per
  * query with N = topN — bounded by the call, not the corpus.
  *
  * Determinism / replayability: candidates are sorted by id before the
  * greedy, ties break (score desc, id asc), and every pairwise cosine
  * is rounded to 1e-6 (BigDecimal HALF_UP — Spark's `round`) BEFORE
  * entering the objective, exactly like [[Pq]]'s rerank discipline.
  * Given quantized rel and sims, the objective arithmetic is the same
  * double operations in both engines, so the q171 oracle replays the
  * whole greedy as k chained SQL steps and hashes scores RAW.
  */
object Mmr {

  private def sparkRound1e6(x: Double): Double =
    java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6

  /** In-order double cosine over float vectors (NativeVector.cosine's
    * exact arithmetic), rounded to 1e-6; NaN (zero norm) → 0-sim is
    * NOT mapped — zero-norm vectors are the caller's contract breach
    * here (candidates come from a cosine ranking that such rows cannot
    * enter). */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val denom = math.sqrt(daa) * math.sqrt(dbb)
    // fail LOUDLY on the contract breach: a zero-norm vector would
    // yield NaN, which Math.round silently maps to 0 micro-units —
    // a fabricated sim, not an error (round-17 advice)
    require(denom > 0, "zero-norm vector in MMR candidates - " +
      "candidates must come from a cosine ranking (caller contract)")
    sparkRound1e6(dab / denom)
  }

  /** Greedy MMR over one query's candidates: (id, rel, vec) →
    * (id, rank, score) for the k picks. Exposed for the spec.
    *
    * EXACT-LONG objective (the exactSum doctrine applied to a greedy):
    * rel and pairwise sims are 1e-6 multiples, so they live losslessly
    * in integer micro-units R = rel·10⁶, M = sim·10⁶, and with λ in
    * tenths the objective is the exact integer
    * `λ₁₀·R − (10 − λ₁₀)·M` (scale 10⁷). No float enters a comparison
    * — a raw double multiply-subtract differed from DuckDB by 1 ulp
    * (FMA contraction) and 1e-6-quantizing it landed EXACTLY on
    * decimal halves (λ·R − (1−λ)·M is a 1e-7-grid value), so neither
    * float form can cross-engine-replay; the integer form is exact in
    * both engines by construction. The emitted double score is one
    * IEEE division of that integer (identical bits both sides). */
  private[operators] def select(cands: Seq[(Long, Double, Array[Float])],
                                k: Int, lambdaTenths: Int): Seq[(Long, Int, Double)] = {
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"lambdaTenths must be in [0, 10], got $lambdaTenths")
    val sorted = cands.sortBy(_._1).toArray
    val n = sorted.length
    // rel is a 1e-6 multiple (the caller contract) — recover the exact
    // integer; Math.round absorbs the representation ulp
    val relM = sorted.map(c => Math.round(c._2 * 1e6))
    val isPicked = new Array[Boolean](n)
    // max micro-sim of each candidate to the picked set, maintained
    // incrementally (one O(n·dim) sweep per pick)
    val maxSimM = Array.fill(n)(Long.MinValue)
    val out = Seq.newBuilder[(Long, Int, Double)]
    var step = 0
    val picks = math.min(k, n)
    while (step < picks) {
      var best = -1
      var bestKey = Long.MinValue
      var i = 0
      while (i < n) {
        if (!isPicked(i)) {
          val key =
            if (step == 0) relM(i)
            else lambdaTenths * relM(i) - (10L - lambdaTenths) * maxSimM(i)
          // ties: key desc, id asc — ids are already in asc order, so
          // strict > keeps the first (smallest-id) maximum
          if (key > bestKey) { best = i; bestKey = key }
        }
        i += 1
      }
      isPicked(best) = true
      out += ((sorted(best)._1, step + 1,
        if (step == 0) bestKey.toDouble / 1e6 else bestKey.toDouble / 1e7))
      i = 0
      while (i < n) {
        if (!isPicked(i)) {
          val s = Math.round(cos(sorted(i)._3, sorted(best)._3) * 1e6)
          if (s > maxSimM(i)) maxSimM(i) = s
        }
        i += 1
      }
      step += 1
    }
    out.result()
  }

  /** Re-rank `cands` — (queryCol, candCol, relCol, vecCol) rows, the
    * caller's bounded per-query top-N — to the k-item MMR selection.
    * Returns (query_id, neighbor_id, mmr_rank, mmr_score). `rel` MUST
    * be a 1e-6 multiple (callers pass an already-quantized ranking
    * score, e.g. [[Embeddings.cosineTopK]]'s 1e-6-rounded sim) — the
    * greedy runs on exact integer micro-units (see [[select]]).
    * `lambdaTenths` is λ·10 (7 ⇒ the classic λ=0.7). */
  def rerank(cands: DataFrame, queryCol: String, candCol: String,
             relCol: String, vecCol: String, k: Int,
             lambdaTenths: Int = 7): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val slim = cands.select(
      col(queryCol).cast("long"), col(candCol).cast("long"),
      col(relCol).cast("double"), col(vecCol))
    slim.as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        select(it.map(t => (t._2, t._3, t._4)).toSeq, k, lambdaTenths)
          .map { case (id, rank, score) => (qid, id, rank, score) }
          .iterator
      }(Encoders.product[(Long, Long, Int, Double)])
      .toDF("query_id", "neighbor_id", "mmr_rank", "mmr_score")
  }
}
