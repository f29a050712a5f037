package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level distribution statistics for training-data curation:
  * which domains look like the mixture (and which are drifting), and
  * whether the token distribution has the expected power-law head.
  * Both are bounded-output monitors a 100 TB ingest pipeline runs per
  * snapshot next to the census (q84) and drift (q111) probes.
  */
object CorpusStats {

  /** Per-source Jensen–Shannon divergence against the WHOLE corpus's
    * token distribution — the standard "is this domain representative
    * of the mixture?" monitor (JS rather than KL: symmetric-bounded in
    * [0, ln 2], defined without smoothing because the mixture m is
    * positive wherever either side is).
    *
    * Scale design — the sparse identity that makes this linear: for a
    * token ABSENT from source s (p_s = 0, p_g > 0) the JS contribution
    * is 0.5·p_g·ln(p_g / (p_g/2)) = 0.5·ln2·p_g, so the whole absent-
    * token tail collapses to the closed form 0.5·ln2·(1 − Σ_present p_g)
    * and only tokens PRESENT in s are ever materialized: per-source work
    * ∝ that source's own token count, never a dense |sources|×|vocab|
    * cross. Shuffles are the (source, token) count and a token-keyed
    * join against the global counts — both vocabulary-bounded, both
    * map-side combined.
    *
    * Output: one row per source — (source, n_tokens, n_types, js,
    * js_norm) with js_norm = js/ln2 ∈ [0,1]. */
  def jsDivergenceVsCorpus(docs: DataFrame, source: String,
                           text: String): DataFrame = {
    val perSrc = docs
      .select(col(source).as("__src"),
        explode(TextOps.tokens(col(text))).as("__t"))
      .groupBy("__src", "__t").agg(count(lit(1)).as("__cs"))
    val global = perSrc.groupBy("__t").agg(sum("__cs").as("__cg"))
    val totS = perSrc.groupBy("__src").agg(sum("__cs").as("__tot_s"),
      count(lit(1)).as("n_types"))
    val totG = global.agg(sum("__cg").as("__tot_g"))
    val ln2 = math.log(2.0)
    val joined = perSrc
      .join(global, Seq("__t"))
      .join(totS, Seq("__src"))
      .crossJoin(broadcast(totG))
    val ps = col("__cs").cast("double") / col("__tot_s")
    val pg = col("__cg").cast("double") / col("__tot_g")
    val m = (ps + pg) / 2.0
    joined
      .groupBy(col("__src"), col("__tot_s"), col("n_types"))
      .agg(
        sum(ps * log(ps / m) * 0.5 + pg * log(pg / m) * 0.5).as("__present"),
        sum(pg).as("__mass_g"))
      .select(col("__src").as(source),
        col("__tot_s").as("n_tokens"), col("n_types"),
        (col("__present") + lit(0.5 * ln2) * (lit(1.0) - col("__mass_g")))
          .as("js"))
      .withColumn("js_norm", col("js") / ln2)
  }

  /** Concentration/diversity of a categorical mix (sources, languages,
    * domains): Shannon entropy (nats), normalized entropy (÷ ln k),
    * Herfindahl–Hirschman index Σp², and the "effective number of
    * sources" e^H — the four numbers a data-mixing dashboard tracks per
    * snapshot. One vocabulary-bounded groupBy; output is ONE row. A mix
    * drifting toward one dominant source shows as HHI → 1 / effective
    * count → 1 long before any per-source threshold trips. */
  def mixConcentration(df: DataFrame, cat: String): DataFrame = {
    // __cnt vs __tot, never __n/__N: Spark resolves case-insensitively
    // by default, so names differing only in case are AMBIGUOUS
    val counts = df.groupBy(col(cat)).agg(count(lit(1)).as("__cnt"))
    val tot = counts.agg(sum("__cnt").as("__tot"), count(lit(1)).as("k"))
    counts.crossJoin(broadcast(tot))
      .select(col("k"), col("__tot"),
        (col("__cnt").cast("double") / col("__tot")).as("__p"))
      .groupBy(col("k"), col("__tot"))
      .agg(sum(-col("__p") * log(col("__p"))).as("entropy"),
        sum(col("__p") * col("__p")).as("hhi"))
      .select(col("k").as("n_categories"), col("__tot").as("n_rows"),
        col("entropy"),
        when(col("k") > 1, col("entropy") / log(col("k").cast("double")))
          .otherwise(lit(0.0)).as("entropy_norm"),
        col("hhi"),
        exp(col("entropy")).as("effective_n"))
  }

  /** Zipf power-law fit of the corpus token-frequency head: rank the
    * top-K tokens by collection frequency (total order: count desc,
    * token asc — engine-independent), then OLS on (ln rank, ln count);
    * alpha = −slope, with the fit's r² as the "is it actually Zipfian"
    * check (natural text ≈ alpha 1, r² > 0.9; a bot-generated or
    * template corpus shows up as a broken head).
    *
    * Scale: token counting is the vocabulary-bounded census shuffle;
    * ranking runs over the TOP-K ONLY (≤ K rows after a
    * TakeOrderedAndProject — bounded by the constant K, never by
    * vocabulary): a driver-fold local-relation rank
    * (`GlobalRank.zipIndexed`), not an unpartitioned window (same
    * plan-hygiene family as the percentile gates), and the regression
    * is one aggregate over K rows. */
  def zipfFit(docs: DataFrame, text: String, topK: Int = 1000): DataFrame = {
    val counts = docs
      .select(explode(TextOps.tokens(col(text))).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__c"))
    val nVocab = counts.agg(count(lit(1)).as("n_vocab"),
      sum("__c").as("n_tokens"))
    val top = GlobalRank.zipIndexed(
      counts.orderBy(col("__c").desc, col("__t").asc).limit(topK),
      Seq(col("__c").desc, col("__t").asc), "__rank", startAt = 1L,
      maxRows = topK)
    top
      .select(log(col("__rank").cast("double")).as("__x"),
        log(col("__c").cast("double")).as("__y"))
      .agg(count(lit(1)).as("k_fit"),
        (-regr_slope(col("__y"), col("__x"))).as("alpha"),
        regr_intercept(col("__y"), col("__x")).as("intercept"),
        regr_r2(col("__y"), col("__x")).as("r2"))
      .crossJoin(broadcast(nVocab))
      .select(col("n_vocab"), col("n_tokens"), col("k_fit"),
        col("alpha"), col("intercept"), col("r2"))
  }
}
