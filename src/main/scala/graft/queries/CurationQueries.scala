package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Curation, TextOps}
import graft.sources.Tables
import Util.{Q, qz}

/** Training-data curation queries over `documents` (SURVEY.md §7
  * extensions beyond the reference): context-window chunking (q81),
  * benchmark decontamination (q82), PII redaction (q83), token census /
  * TF-IDF / unigram log-prob / novelty scoring (q84/q85/q93/q98),
  * deterministic + weighted sampling and source rebalancing (q91/q94),
  * shard assignment + partitioned sink + sequence packing
  * (q86/q87/q95), incremental ingest dedup (q96), per-source top-k
  * (q92), and the corpus-vs-corpus MinHash sketch (q97). ALL fully
  * oracle-checked — every semantic keeps to the md5/regex/array common
  * subset DuckDB reproduces.
  */
object CurationQueries {

  def queries: Map[String, Q] = Map(
    // context-window chunking: 40-token chunks, 10-token overlap.
    // chunk_text itself is emitted as md5 so the hash compare covers
    // every character of every chunk without shipping the text twice.
    "q81_chunking" -> ((s, dir) =>
      Curation.chunk(Tables.documents(s, dir), "doc_id", "text",
          chunkTokens = 40, overlapTokens = 10)
        .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")),

    // benchmark decontamination. The "benchmark" is built inside the
    // query (q69/q59 planting pattern): the 8-token snippet at tokens
    // 5..12 of every 10th document. Every planted source doc MUST be
    // flagged (its own snippet is one of its 8-gram shingles), so green
    // means the overlap join found exactly the planted containments
    // (plus any natural cross-doc snippet repeats — the oracle computes
    // the same closure).
    "q82_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = TextOps.tokens(col("text"))
      val evalGrams = docs.filter(col("doc_id") % 10 === 0)
        .select(md5(concat_ws(" ", slice(toks, 5, 8))).as("g"))
      Curation.contamination(docs, "doc_id", "text", evalGrams, shingleLen = 8)
        .select(col("doc_id"), col("n_hits"), col("contaminated"))
        .orderBy("doc_id")
    }),

    // FUZZY decontamination (round 12): overlap-RATIO criterion — eval
    // set = every 10th doc, inventory = ALL its distinct 8-gram
    // shingles, so eval docs score ratio 1.0, their near-duplicates
    // score high, and incidental single-shingle collisions stay under
    // the 50% bar that q82's membership form would have flagged. The
    // flag is an integer comparison (2·hits ≥ grams); overlap is the
    // exact quotient of two identical longs — hash-safe in any engine.
    "q140_fuzzy_decontam" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // tokens STAGED before the shingle transform (HOF-staging rule)
      val evalGrams = docs.filter(col("doc_id") % 10 === 0)
        .select(TextOps.tokens(col("text")).as("__toks"))
        .select(explode(Curation.shingleMd5s(col("__toks"), 8)).as("g"))
      Curation.fuzzyContamination(docs, "doc_id", "text", evalGrams,
          shingleLen = 8, thresholdNum = 1, thresholdDen = 2)
        .select(col("doc_id"), col("n_grams"), col("n_hits"),
          qz(col("overlap"), 6).as("overlap"), col("contaminated"))
        .orderBy("doc_id")
    }),

    // PII redaction: plant one of each PII class per doc (address, URL,
    // IP, account number — all deterministic functions of doc_id), then
    // redact and prove byte parity via md5 + the removed-char count.
    // The redacted form is staged ONCE (HOF-staging rule).
    "q83_pii_redact" -> ((s, dir) => {
      val messy = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com via https://ex.com/p/"),
        col("doc_id"), lit(" from 10.0."), col("doc_id") % 256,
        lit(".7 acct 4111111111"), lpad(col("doc_id") % 1000000, 6, "0"))
      Tables.documents(s, dir)
        .select(col("doc_id"), length(messy).as("messy_len"),
          Curation.redactPii(messy).as("red"))
        .select(col("doc_id"),
          md5(col("red")).as("red_md5"),
          (col("messy_len") - length(col("red"))).cast("long").as("removed_chars"))
        .orderBy("doc_id")
    }),

    // corpus token census: top 25 tokens by collection frequency with
    // document frequency (the vocabulary head a tokenizer trainer or
    // stopword builder reads first). Deterministic tie-break on token.
    "q84_token_census" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tk"))
        .groupBy("tk")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("tk"))
        .limit(25)),

    // per-document top-3 TF-IDF terms (tf · ln(N/df)) — the classic
    // keyword surface for corpus exploration. ONE tokenizing pass: df is
    // derived from the (doc, token) tf frame (its rows are distinct by
    // construction, so counting them per token IS the document
    // frequency), and N comes from the documents table without any
    // explode. The df join is deliberately UNHINTED: vocabulary grows
    // with corpus size (Heaps' law — 10^8-10^9 distinct tokens at
    // 100 TB), so a forced broadcast would OOM executors at scale; both
    // sides are already keyed on tk, so AQE broadcasts while the vocab
    // is small and falls back to a one-exchange shuffle join when it
    // isn't. Only N rides in as a broadcast 1-row frame (no driver
    // action). The RANK KEY is the 6dp-quantized tfidf (q92/q51
    // convention): Java's and libm's ln can differ in the last ulp, and
    // row_number over a raw double would let near-ties order
    // differently per engine — quantize first, tie-break on token.
    "q85_tfidf" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tk"))
        .groupBy("doc_id", "tk").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tk").agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, Seq("tk")).crossJoin(broadcast(n))
        .withColumn("tfidf",
          qz(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("tk"))))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk").cast("long").as("rk"), col("tk"),
          col("tf"), col("df"), col("tfidf"))
        .orderBy("doc_id", "rk")
    }),

    // training-shard SINK round trip: write documents partitioned by
    // shard id (the file layout a training job reads — shard dirs are
    // partition-pruning keys, see CurationSpec's pruning assert), read
    // the directory tree back, and aggregate per shard. The oracle
    // recomputes the same aggregates from the parquet SOURCE, so any
    // loss in the partitioned write/read — rows, text bytes, or the
    // partition-column recovery itself — turns the row red.
    "q87_shard_sink" -> ((s, dir) => {
      val path = graft.sources.Io.scratchDir("graft_shard_sink")
      val sharded = Tables.documents(s, dir).select(
        col("doc_id"), col("text"),
        Curation.shardId(col("doc_id"), nShards = 8, salt = "epoch0").as("shard"))
      graft.sources.Io.writeParquet(sharded, path, partitionBy = Seq("shard"))
      s.read.parquet(path)
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_texts"),
          sum(length(col("text"))).cast("long").as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy("shard")
    }),

    // deterministic shard assignment (the global training-data shuffle):
    // 25 shards (deliberately not a power of 16 — proves the full 48-bit
    // hex parse, not just a digit slice), per-shard size and the FIRST
    // example in shuffled order (min_by on the md5 order key, = DuckDB
    // arg_min). Rerun/engine/partition-layout independent by design.
    "q86_shard_assign" -> ((s, dir) => {
      val sharded = Tables.documents(s, dir).select(
        col("doc_id"),
        Curation.shardId(col("doc_id"), nShards = 25, salt = "epoch0").as("shard"),
        Curation.shardOrder(col("doc_id"), salt = "epoch0").as("ord"))
      sharded.groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"),
          min_by(col("doc_id"), col("ord")).as("first_doc"))
        .orderBy("shard")
    }),

    // unigram log-probability scoring — the corpus-trained shape of a
    // perplexity quality filter (KenLM-style filters score against a
    // reference LM; the engine-side mechanics are identical: token ->
    // probability lookup -> per-doc mean log-prob). The vocabulary join
    // is UNHINTED (q85's rationale: vocab grows with corpus — a forced
    // broadcast is a 100 TB OOM; AQE picks broadcast while it fits);
    // one tokenizing pass; avg of ~doc-length doubles is engine-order
    // sensitive only below the 6dp quantization.
    "q93_unigram_logprob" -> ((s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tk"))
      val tf = tok.groupBy("tk").agg(count(lit(1)).as("tf"))
      val total = tf.agg(sum(col("tf")).as("total")) // reuses tf's exchange
      tok.join(tf, Seq("tk")).crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          qz(avg(log(col("tf").cast("double") / col("total"))), 6)
            .as("avg_logprob"))
        .orderBy("doc_id")
    }),

    // source rebalancing to a uniform target mix — THE data-mixing step
    // of a pretraining pipeline: per-source keep rate =
    // min(1, targetShare/actualShare), applied with the deterministic
    // weighted sampler, so the SELECTED ROW SET is engine-reproducible
    // (not just the rates). The harness corpus is source-uniform, which
    // would make every rate clamp to 1 and the row vacuously green — so
    // the query PLANTS skew (q69 pattern): 4 of 5 docs are reassigned
    // to one oversized source, whose rate then must fall to ~1/4 and
    // provably drop rows. Rates ride a broadcast source->rate frame.
    "q94_source_rebalance" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 5 === 0, col("source"))
          .otherwise(lit("src_big")).as("mix_src"))
      val counts = docs.groupBy("mix_src").agg(count(lit(1)).as("src_n"))
      // n and n_src both fall out of the per-source counts — no second
      // pass over the table
      val totals = counts.agg(sum(col("src_n")).as("n"),
        count(lit(1)).as("n_src"))
      val rates = counts.crossJoin(broadcast(totals))
        .select(col("mix_src"),
          least(lit(1.0),
            (col("n").cast("double") / col("n_src")) / col("src_n")).as("rate"))
      docs.join(broadcast(rates), Seq("mix_src"))
        .filter(graft.operators.Sampling.weightedKeep(
          col("doc_id"), col("rate"), salt = "mix"))
        .select(col("doc_id"), col("mix_src"))
        .orderBy("doc_id")
    }),

    // token-budget sequence packing: within each training shard, in the
    // deterministic shuffled order, pack documents into 2048-token
    // context bins by running token count (integer prefix sum — exact in
    // any engine; `div` keeps the bin id integral). One window exchange
    // on shard; no global sort.
    "q95_sequence_packing" -> ((s, dir) => {
      val sharded = Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.nTokens(col("text")).cast("long").as("n_tokens"),
        Curation.shardId(col("doc_id"), nShards = 8, salt = "pack").as("shard"),
        Curation.shardOrder(col("doc_id"), salt = "pack").as("ord"))
      sharded
        .withColumn("cum_tokens", sum(col("n_tokens")).over(
          Window.partitionBy("shard").orderBy("ord")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("cum_tokens").cast("long").as("cum_tokens"),
          expr("(cum_tokens - 1) div 2048").cast("long").as("bin"))
        .orderBy("doc_id")
    }),

    // incremental ingest dedup: a "new batch" (planted: 50 exact copies
    // of corpus docs + 100 genuinely-new docs derived by prefixing every
    // 5th doc's text) is deduplicated AGAINST the existing corpus by
    // content-hash LEFT ANTI join — the shape a daily-ingest pipeline
    // runs: the join shuffles 32-char hashes, never text, and the
    // corpus side carries only its distinct hash set. Exactly the 100
    // modified docs must survive.
    "q96_ingest_dedup" -> ((s, dir) => {
      val corpus = Tables.documents(s, dir)
      // negative plant ids, STRUCTURALLY disjoint (round-15 advice): the
      // two plant families interleave odd/even negatives — -(2a)-1 can
      // never equal -(2b)-2 for ANY a, b, and both stay negative, so the
      // scheme is collision-free among plants AND vs real ids at every
      // scale (the earlier -id-1 / -id-1e9 pair collided once the corpus
      // id range itself approached 1e9)
      val copies = corpus.filter(col("doc_id") % 10 === 0)
        .select((-col("doc_id") * 2L - 1L).as("doc_id"), col("text"))
      val fresh = corpus.filter(col("doc_id") % 5 === 1)
        .select((-col("doc_id") * 2L - 2L).as("doc_id"),
          concat(lit("new: "), col("text")).as("text"))
      val batch = copies.unionByName(fresh)
        .select(col("doc_id"), md5(col("text")).as("content_hash"))
      val known = corpus.select(md5(col("text")).as("content_hash")).distinct()
      batch.join(known, Seq("content_hash"), "left_anti")
        .select(col("doc_id"), col("content_hash"))
        .orderBy("doc_id")
    }),

    // corpus-vs-corpus similarity: exact shingle-set Jaccard between two
    // overlapping document corpora (planted: corpus B re-includes every
    // 10th doc of corpus A), plus the mergeable MinHash SKETCH estimate
    // (functions/MinHashSketchAgg — k longs per corpus, map-side
    // combined, shingles never shuffle) checked against the exact value
    // with a tolerance flag (q17/q62 pattern; k=128 -> sd <= 0.044, the
    // 0.15 bound is ~3.4 sigma and the fixed seed makes est deterministic
    // per dataset). This is the dataset-diff primitive: at 100 TB the
    // sketches are the ONLY thing two corpus snapshots exchange.
    "q97_corpus_sketch" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val ca = docs.filter(col("doc_id") % 2 === 0)
      val cb = docs.filter(col("doc_id") % 2 === 1)
        .unionByName(docs.filter(col("doc_id") % 10 === 0))
      // ONE pass, ONE job: the side-tagged shingle stream (the
      // tag-merging groupBy dedups, so no per-side distinct shuffle)
      // carries everything downstream — counts, intersection, AND the
      // minhash input hashes (xxhash64 of the gram mod 2^31-1; Jaccard
      // is preserved up to rare 2^31-space collisions, far below the
      // flag tolerance). A first cut evaluated the corpus shingle
      // pipeline six times (11.7 s at sf0.1); round 6 cut that to three
      // actions over a persisted frame (~1 s); this form folds all five
      // aggregates — three sums + the two SIDE-FILTERED sketches
      // (MinHashSketchAgg.Tagged) — into a single typed select, so the
      // tagged frame is consumed exactly once and nothing is cached.
      def shingleStream(df: org.apache.spark.sql.DataFrame) = df
        .select(TextOps.tokens(col("text")).as("__toks"))
        .select(explode(Curation.shingleMd5s(col("__toks"), 3)).as("g"))
      import graft.functions.MinHashSketchAgg
      val (na, nb, inter, skA, skB) =
        shingleStream(ca).select(col("g"), lit(1).as("in_a"), lit(0).as("in_b"))
          .unionByName(shingleStream(cb).select(col("g"), lit(0).as("in_a"), lit(1).as("in_b")))
          .groupBy("g")
          .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
          .select(col("in_a"), col("in_b"),
            pmod(xxhash64(col("g")), lit(2147483647L)).as("h"))
          .as[(Int, Int, Long)]
          .select(new MinHashSketchAgg.TaggedSum(_._1.toLong).toColumn,
            new MinHashSketchAgg.TaggedSum(_._2.toLong).toColumn,
            new MinHashSketchAgg.TaggedSum(t => (t._1 * t._2).toLong).toColumn,
            new MinHashSketchAgg.Tagged(128, 42L, 0).toColumn,
            new MinHashSketchAgg.Tagged(128, 42L, 1).toColumn)
          .head()
      val est = MinHashSketchAgg.estimate(skA, skB)
      // re-enter the engine for the emitted row so exact_j's rounding is
      // the same qz expression the oracle mirrors. The union (n_a + n_b
      // - inter) can only be 0 when both corpora are empty — guard the
      // quotient (0.0, and est_ok trivially true) so the empty-source
      // path is total, not engine-dependent NaN.
      val denom = col("n_a") + col("n_b") - col("inter")
      Seq((na, nb, inter, est))
        .toDF("n_a", "n_b", "inter", "est")
        .select(col("n_a"), col("n_b"), col("inter"),
          when(denom > 0, qz(col("inter").cast("double") / denom, 6))
            .otherwise(lit(0.0)).as("exact_j"),
          when(denom > 0,
            abs(col("est") - col("inter").cast("double") / denom) <= 0.15)
            .otherwise(lit(true)).as("est_ok"))
    }),

    // per-document NOVELTY: the fraction of a doc's distinct shingles
    // that appear in no other document — the doc-granular originality
    // signal (near-1 = unique content, near-0 = boilerplate/dup echo).
    // The gram's document frequency is a COUNT WINDOW over the gram key
    // (shingleMd5s is per-doc distinct, so rows per gram == documents
    // containing it): one evaluation of the tokenize->shingle lineage
    // and one shuffle on the hashed gram — a groupBy-then-join-back
    // form re-ran the whole scan+shingle pipeline for the probe side.
    // Window partitions are gram-df-sized (bounded by doc count), never
    // corpus-sized; text never shuffles.
    "q98_novelty" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
        .select(col("doc_id"),
          explode(Curation.shingleMd5s(col("__toks"), 3)).as("g"))
        .withColumn("gdf", count(lit(1)).over(Window.partitionBy("g")))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_grams"),
          sum((col("gdf") === 1).cast("long")).cast("long").as("n_unique"),
          qz(avg((col("gdf") === 1).cast("double")), 6).as("novelty"))
        .orderBy("doc_id")
    }),

    // CONTENT-DEFINED chunking — see Curation.cdcChunk for the design
    // (boundary predicate, shift re-alignment, window shape); emitted as
    // per-chunk md5 so the hash compare covers every chunk byte
    "q99_cdc_chunking" -> ((s, dir) =>
      Curation.cdcChunk(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")),

    // quality-proportional (weighted) deterministic sampling: longer
    // docs kept at a higher rate, membership a pure key function — the
    // row set must be IDENTICAL in DuckDB (q66's guarantee, per-row rate)
    "q91_weighted_sample" -> ((s, dir) => {
      val w = least(length(col("text")).cast("double") / 400.0, lit(1.0))
      graft.operators.Sampling.weightedSample(
          Tables.documents(s, dir), col("doc_id"), w, salt = "wq")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),

    // per-source top-3 documents by quality score (the keep-best-N-per-
    // domain curation step). Ranking key is the 6dp-quantized quality
    // (bit-identical cross-engine — q51 proves it) with doc_id as the
    // total-order tie-break, so row_number is deterministic in both
    // engines. One hash exchange on source; no global sort.
    "q92_topk_per_source" -> ((s, dir) => {
      val stop = TextOps.langWords.head._2
      val q = qz(TextOps.qualityScore(col("text"), stop), 6)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), q.as("quality"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))))
        .filter(col("rk") <= 3)
        .select(col("source"), col("rk").cast("long").as("rk"),
          col("doc_id"), col("quality"))
        .orderBy("source", "rk")
    }),

    // Temperature-based mixture sampling (share^0.5): the data-mixing
    // rule that up-weights small sources relative to their natural
    // share without discarding the big ones' long tail. α=0.5 because
    // sqrt is IEEE-correctly-rounded — the oracle must reproduce every
    // rate bit-for-bit (see Sampling.temperatureRates); integer
    // nano-unit weights make the normalization sum exact in both
    // engines. The kept row SET must be identical in DuckDB (q66/q91's
    // guarantee, now with per-source computed rates).
    "q109_temperature_mix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 5 === 0, col("source"))
          .otherwise(lit("src_big")).as("mix_src"))
      val counts = docs.groupBy("mix_src").agg(count(lit(1)).as("src_n"))
      val rates = graft.operators.Sampling.temperatureRates(
        counts, "mix_src", "src_n", budgetFraction = 0.5, sqrt)
      // rates is bounded by source count — broadcast is structural
      docs.join(broadcast(rates), Seq("mix_src"))
        .filter(graft.operators.Sampling.weightedKeep(
          col("doc_id"), col("rate"), salt = "temp"))
        .select(col("doc_id"), col("mix_src"))
        .orderBy("doc_id")
    }),

    // Bloom-prefiltered decontamination: SAME semantics as q82 (per-doc
    // eval-gram hit counts), DIFFERENT plan — the eval inventory rides
    // the plan as a ~1.2 byte/gram Bloom literal probed below the first
    // shuffle, and only surviving grams reach the exact verify join
    // (unhinted, AQE decides). The oracle is the exact closure: Bloom
    // false positives MUST be invisible in the answer, so a green row
    // here proves the prefilter-then-verify contract, not just the
    // happy path. Eval set differs from q82 (every 7th doc, 6-token
    // snippet at tokens 11..16) so the two queries cannot mask each
    // other's staging bugs.
    "q108_bloom_decontam" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = TextOps.tokens(col("text"))
      val evalGrams = docs.filter(col("doc_id") % 7 === 3)
        .select(md5(concat_ws(" ", slice(toks, 11, 6))).as("g"))
      Curation.contaminationBloom(docs, "doc_id", "text", evalGrams,
          shingleLen = 6, fpp = 0.01)
        .select(col("doc_id"), col("n_hits"), col("contaminated"))
        .orderBy("doc_id")
    }),

    // deterministic k-fold assignment audited per stratum: fold is a
    // pure key function (md5 prefix mod k — repartition/engine/rerun
    // independent), the output is the fold × language contingency with
    // each fold's within-stratum share, i.e. the balance evidence a CV
    // split needs. The oracle recomputes the fold hash from scratch.
    "q116_kfold_strata" -> ((s, dir) => {
      val folded = Tables.documents(s, dir)
        .select(col("lang"),
          graft.operators.Sampling.foldOf(col("doc_id"), 5).as("fold"))
      val strata = folded.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      folded.groupBy("lang", "fold").agg(count(lit(1)).as("n"))
        .join(strata, Seq("lang"))   // |langs| rows — AQE broadcasts
        .select(col("lang"), col("fold"), col("n"),
          qz(col("n").cast("double") / col("n_lang"), 6).as("share"))
        .orderBy("lang", "fold")
    }),

    // contrastive negative sampling: per user (anchor), 5 deterministic
    // uniform draws from the dense event-id space, REJECTING draws that
    // hit the anchor's own events (the standard accidental-positive
    // rejection — both engines reject identically, so the emitted pair
    // set is exact). The candidate join is keyed on event_id and sized
    // anchors×k; the corpus is never crossed with itself.
    "q120_negative_samples" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // eager 1-row job at construction time is deliberate (the draw
      // space needs the id bound before the plan builds); guard the
      // empty/null-max case so it fails with a clear error, not an NPE
      // (round-9 advice)
      val maxRow = ev.agg(max(col("event_id"))).head()
      require(!maxRow.isNullAt(0), "q120: events is empty — no id space to draw from")
      val n = maxRow.getLong(0) + 1
      val anchors = ev.select(col("user_id")).distinct()
      val draws = graft.operators.Sampling.idDraws(anchors, col("user_id"), k = 5, n = n)
      draws
        .join(ev.select(col("event_id"), col("user_id").as("owner"),
          col("value")), col("cand_id") === col("event_id"))
        .filter(col("owner") =!= col("anchor"))
        .select(col("anchor").as("user_id"), col("sample_idx"),
          col("event_id").as("neg_event_id"), col("owner"), col("value"))
        .orderBy("user_id", "sample_idx")
    }),

    // LEXICAL RETRIEVAL (BM25, round 14): the corpus-search primitive a
    // curation pipeline uses for dedup triage and decontamination
    // review. Okapi BM25 with Lucene's +1 idf smoothing; the per-doc
    // score sums per-term contributions as exact longs (round(x·10⁹)),
    // so it is association-free and hash-safe, and the oracle re-derives
    // every tf/df/dl/avgdl and the full formula from scratch in SQL with
    // the identical left-assoc float shapes. Top-10 via TakeOrdered
    // (rounded-score, doc_id tie-break), never a global window.
    "q149_bm25" -> ((s, dir) => {
      graft.operators.Retrieval.bm25(Tables.documents(s, dir),
          "doc_id", "text", Seq("spark", "merge", "vector"))
        .select(col("doc_id"), qz(col("bm25"), 6).as("bm25_q"))
        .orderBy(col("bm25_q").desc, col("doc_id"))
        .limit(10)
    }),

    // HYBRID RETRIEVAL (lexical shortlist → exact-cosine rerank, round
    // 14): the two-stage ranker of a hard-negative mining pipeline —
    // lexically close by BM25, semantically ordered by the embedding.
    // Query = doc 7's embedding; shortlisted docs without an embedding
    // drop out (coverage trails ingestion), self is excluded by the
    // rerank. The oracle replays BOTH stages in SQL: the full BM25
    // block, the rounded-score shortlist cut, the embedding join, and
    // the q58 cosine formula.
    "q150_hybrid_retrieval" -> ((s, dir) => {
      val qv = Tables.embeddings(s, dir).filter(col("vec_id") === 7)
      graft.operators.Retrieval.hybrid(Tables.documents(s, dir),
          "doc_id", "text", Seq("spark", "merge", "vector"),
          Tables.embeddings(s, dir), "vec_id", "embedding",
          qv, shortlist = 50, topK = 5)
        .orderBy("neighbor_id")
    }),

    // BIGRAM LM PERPLEXITY (round 14): the CCNet-shape quality filter —
    // score every document under an interpolated bigram LM trained on
    // the corpus itself (q93's unigram filter upgraded to conditional
    // probabilities; Jelinek–Mercer λ=0.75 — an exact binary fraction,
    // so the SQL twin's decimal literals fold to the identical
    // doubles). Per-position ln(p) quantizes to a long BEFORE the
    // per-doc sum (exact-long doctrine), so avg_logprob is
    // association-free and hashed RAW; the oracle re-derives every
    // count table and the full interpolation formula in SQL with
    // identical left-assoc float shapes. The ppl itself stays out of
    // the hash (exp spans orders of magnitude — see LangModel's note).
    "q151_bigram_perplexity" -> ((s, dir) => {
      graft.operators.LangModel.bigramLogprob(
          Tables.documents(s, dir), "doc_id", "text", lambda = 0.75)
        .select(col("doc_id"), col("n_bigrams"), col("avg_logprob"))
        .orderBy("doc_id")
    }),

    // EXACT SUBSTRING-SPAN DEDUP COVERAGE (round 14): per-doc fraction
    // of token-8-gram POSITIONS whose gram recurs in ≥2 distinct docs
    // (Lee et al. 2021 — the span-level dedup mode doc-level
    // exact/MinHash/SimHash cannot see). The harness corpus has no
    // guaranteed cross-doc verbatim spans, which would leave the signal
    // at the mercy of generator accidents — so the query PLANTS a
    // 10-token boilerplate header on every 10th doc (q61/q94 pattern):
    // those docs must show ≥3 shared positions (the header's interior
    // grams), and a regression in the positional counting turns the row
    // red. Grams hash to md5 map-side; text never shuffles.
    "q152_span_coverage" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" boiler plate license header repeated" +
            " verbatim across many corpus documents")))
          .otherwise(col("text")).as("text"))
      graft.operators.Dedup.spanCoverage(docs, "doc_id", "text", n = 8)
        .select(col("doc_id"), col("n_grams"), col("n_dup"),
          qz(col("n_dup").cast("double") / col("n_grams"), 6).as("dup_frac"))
        .orderBy("doc_id")
    }),

    // COMPOSITE QUALITY-FILTER VERDICT (round 14 capstone): the
    // FineWeb/CCNet-shape keep/drop decision a curation pipeline
    // actually emits — four independent signals composed into one
    // verdict per document: length floor, stopword-ratio floor
    // (gibberish gate), bigram-LM log-prob floor (q151's filter), and
    // span-duplication ceiling (q152's coverage). One planted corpus
    // (the q152 boilerplate) feeds ALL signals, so the dup-reject
    // branch provably fires; thresholds are calibrated against the
    // sf0.01 distributions so EVERY reject flag is non-vacuous there
    // (length p05=16 vs floor 20; stop-ratio p05=0 vs 0.01; logprob
    // p05≈-3.429 vs -3.43; 91 docs with dup_frac>0 vs ceiling 0.2).
    // Cross-engine safety: every compared value is either an exact
    // integer, an exact-long-derived double (avg_logprob), or a
    // qz-quantized ratio, and each threshold literal parses to the
    // identical double in both engines. At 100 TB you'd tokenize once
    // and persist; here each signal is its own corpus pass joined on
    // doc_id (the joins are id-keyed, text never shuffles).
    "q153_quality_filter" -> ((s, dir) => {
      val planted = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" boiler plate license header repeated" +
            " verbatim across many corpus documents")))
          .otherwise(col("text")).as("text"))
      val stop = graft.operators.TextOps.langWords.head._2
      val stats = planted.select(col("doc_id"),
        graft.operators.TextOps.nTokens(col("text")).cast("long").as("n_tokens"),
        qz(graft.operators.TextOps.hitCount(col("text"), stop).cast("double") /
          graft.operators.TextOps.nTokens(col("text")), 6).as("stop_ratio"))
      val lm = graft.operators.LangModel.bigramLogprob(
          planted, "doc_id", "text", lambda = 0.75)
        .select(col("doc_id"), col("avg_logprob"))
      val span = graft.operators.Dedup.spanCoverage(planted, "doc_id", "text", n = 8)
        .select(col("doc_id"),
          qz(col("n_dup").cast("double") / col("n_grams"), 6).as("dup_frac"))
      stats
        .join(lm, Seq("doc_id"), "left")
        .join(span, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("stop_ratio"),
          col("avg_logprob"), col("dup_frac"),
          (col("n_tokens") >= 20).as("ok_len"),
          (col("stop_ratio") >= 0.01).as("ok_stop"),
          (col("avg_logprob") >= -3.43).as("ok_lm"),
          (col("dup_frac") <= 0.2).as("ok_dup"),
          (col("n_tokens") >= 20 && col("stop_ratio") >= 0.01 &&
            col("avg_logprob") >= -3.43 && col("dup_frac") <= 0.2).as("keep"))
        .orderBy("doc_id")
    }),

    // CORPUS-RELATIVE QUALITY FLOORS (round 15, the verdict's
    // production-shape q153): the SAME four signals, but every
    // threshold now comes from the corpus's own distribution via
    // Util.discPercentiles (p05 floors for length / stopword ratio /
    // LM log-prob, p95 ceiling for span duplication) instead of
    // sf0.01-calibrated constants — the CCNet discipline (Wenzek et
    // al. 2020 bucket by corpus-relative perplexity precisely so the
    // filter transfers across corpora). The keep-rate is then SANE AT
    // EVERY SCALE by construction: each strict-below-p05 floor rejects
    // < 5%, so keep ≥ 80% is a union-bound guarantee, not a
    // calibration accident — pinned by the keep_rate_ok band flag
    // (measured 0.872 at sf0.01 and 0.870 at the sf1 replicas — steady
    // at 100x rows, where q153's fixed LM floor rejects most rows; the
    // floor itself self-adjusts, -3.435 -> -3.683, on the shifted
    // vocabulary), while q153 stays the fixed-floor cross-engine
    // agreement gate. Every floor is a ceil-rank DATA
    // value (discSql twins), so the whole frame — thresholds, flags,
    // verdicts — hashes bit-for-bit. 100 TB shape: signals as in q153
    // (id-keyed joins, text never shuffles); the four rank gates ride
    // the bucketed rank-k selection (no single-reducer sort) over the
    // cached signal frame, and production would swap them for
    // approx_percentile + a tolerance band (the q119 doctrine).
    "q160_quality_rel" -> ((s, dir) => {
      val planted = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" boiler plate license header repeated" +
            " verbatim across many corpus documents")))
          .otherwise(col("text")).as("text"))
      val stop = graft.operators.TextOps.langWords.head._2
      val stats = planted.select(col("doc_id"),
        graft.operators.TextOps.nTokens(col("text")).cast("long").as("n_tokens"),
        qz(graft.operators.TextOps.hitCount(col("text"), stop).cast("double") /
          graft.operators.TextOps.nTokens(col("text")), 6).as("stop_ratio"))
      val lm = graft.operators.LangModel.bigramLogprob(
          planted, "doc_id", "text", lambda = 0.75)
        .select(col("doc_id"), col("avg_logprob"))
      val span = graft.operators.Dedup.spanCoverage(planted, "doc_id", "text", n = 8)
        .select(col("doc_id"),
          qz(col("n_dup").cast("double") / col("n_grams"), 6).as("dup_frac"))
      val joined = stats
        .join(lm, Seq("doc_id"), "left")
        .join(span, Seq("doc_id"), "left")
        .cache()
      // ONE melted rank gate computes all four floors (signals explode
      // to (sig, v) rows and discPercentiles groups by sig) instead of
      // four separate gate chains — same ceil-rank VALUES, a quarter of
      // the rank passes; and the floors materialize EAGERLY to
      // constants, because the final frame and the keep-rate aggregate
      // both reference them and a lazy floors subtree would re-run the
      // gates per referencing evaluation. Each signal's nulls filter
      // exactly like the per-signal oracle CTEs' WHERE IS NOT NULL;
      // n_tokens ranks identically through its exact double cast
      // (small ints round-trip bit-exactly).
      val melted = joined.select(explode(array(
          struct(lit("len").as("sig"), col("n_tokens").cast("double").as("v")),
          struct(lit("stop").as("sig"), col("stop_ratio").as("v")),
          struct(lit("lm").as("sig"), col("avg_logprob").as("v")),
          struct(lit("dup").as("sig"), col("dup_frac").as("v")))).as("x"))
        .select(col("x.sig").as("sig"), col("x.v").as("v"))
        .filter(col("v").isNotNull)
      val fl = Util.discPercentiles(melted, Seq("sig"), "v",
          Seq(("p05", 1, 20), ("p95", 19, 20)))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
        .toMap
      val (lenFloor, stopFloor) = (fl("len")._1.toLong, fl("stop")._1)
      val (lmFloor, dupCeil) = (fl("lm")._1, fl("dup")._2)
      val keepExpr = col("n_tokens") >= lenFloor &&
        col("stop_ratio") >= stopFloor &&
        col("avg_logprob") >= lmFloor &&
        col("dup_frac") <= dupCeil
      val flagged = joined
        .withColumn("len_floor", lit(lenFloor))
        .withColumn("stop_floor", lit(stopFloor))
        .withColumn("lm_floor", lit(lmFloor))
        .withColumn("dup_ceil", lit(dupCeil))
        .withColumn("keep", keepExpr)
      val rate = flagged.agg(
        (sum(when(col("keep"), 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("kr"))
      flagged.crossJoin(broadcast(rate))
        .select(col("doc_id"), col("n_tokens"), col("stop_ratio"),
          col("avg_logprob"), col("dup_frac"),
          col("len_floor"), col("stop_floor"), col("lm_floor"), col("dup_ceil"),
          col("keep"),
          (col("kr") >= 0.80 && col("kr") < 1.0).as("keep_rate_ok"))
        .orderBy("doc_id")
    }),

    // PER-LANGUAGE CORPUS-RELATIVE FLOORS (round 16 — CCNet's ACTUAL
    // bucketing discipline, the r15 verdict's composition of q160's
    // melted gate with q52's lang-ID): every document is bucketed by
    // the PREDICTED language (the production shape — no label
    // side-channel), and each bucket gets its own p05/p95 thresholds
    // from ONE melted rank gate grouped by (lang, sig). A French
    // sub-corpus no longer has its LM floor set by the English
    // majority — exactly why Wenzek et al. 2020 bucket per language.
    // The keep ≥ 80% union bound holds PER BUCKET by the same rank
    // arithmetic (each strict-below-p05 floor rejects < 5% of its own
    // bucket), so keep_rate_ok is asserted per language. Floors join
    // back by lang (a ≤ langs×4 literal frame, eager-collected — the
    // q160 fused-gate lesson), and the whole frame — lang, signals,
    // per-lang thresholds, flags — hashes bit-for-bit via the discSql
    // twins PARTITIONed BY lang. 100 TB shape: identical to q160 plus
    // one broadcast join; the rank gates stay bucketed and the lang
    // dimension only narrows each gate's partitions.
    "q163_quality_rel_lang" -> ((s, dir) => {
      import s.implicits._
      val planted = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" boiler plate license header repeated" +
            " verbatim across many corpus documents")))
          .otherwise(col("text")).as("text"))
      val stop = graft.operators.TextOps.langWords.head._2
      val stats = planted.select(col("doc_id"),
        graft.operators.TextOps.predictLang(col("text")).as("lang"),
        graft.operators.TextOps.nTokens(col("text")).cast("long").as("n_tokens"),
        qz(graft.operators.TextOps.hitCount(col("text"), stop).cast("double") /
          graft.operators.TextOps.nTokens(col("text")), 6).as("stop_ratio"))
      // round 17 (the r16 verdict's completion of this query): the LM
      // floor is now fed by the PER-LANGUAGE LM (q165's operator) — the
      // thresholds were already bucketed per language, but fluency
      // itself was still scored under the majority-trained global LM;
      // Wenzek et al. bucket BOTH. Same predicted-language column
      // drives the scoring bucket and the floor bucket.
      val lm = graft.operators.LangModel.bigramLogprobByLang(
          planted.select(col("doc_id"),
            graft.operators.TextOps.predictLang(col("text")).as("lang"),
            col("text")),
          "doc_id", "text", "lang", lambda = 0.75)
        .select(col("doc_id"), col("avg_logprob"))
      val span = graft.operators.Dedup.spanCoverage(planted, "doc_id", "text", n = 8)
        .select(col("doc_id"),
          qz(col("n_dup").cast("double") / col("n_grams"), 6).as("dup_frac"))
      val joined = stats
        .join(lm, Seq("doc_id"), "left")
        .join(span, Seq("doc_id"), "left")
        .cache()
      val melted = joined.select(col("lang"), explode(array(
          struct(lit("len").as("sig"), col("n_tokens").cast("double").as("v")),
          struct(lit("stop").as("sig"), col("stop_ratio").as("v")),
          struct(lit("lm").as("sig"), col("avg_logprob").as("v")),
          struct(lit("dup").as("sig"), col("dup_frac").as("v")))).as("x"))
        .select(col("lang"), col("x.sig").as("sig"), col("x.v").as("v"))
        .filter(col("v").isNotNull)
      // eager per-(lang, sig) floors; a (lang, sig) group can be absent
      // when a tiny bucket has no non-null signal rows — its floor is
      // then null and the keep conjunct nulls out, exactly like the SQL
      // twin's missing LEFT-JOIN row
      val fl = Util.discPercentiles(melted, Seq("lang", "sig"), "v",
          Seq(("p05", 1, 20), ("p95", 19, 20)))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getDouble(2), r.getDouble(3)))).toMap
      val langs = fl.keys.map(_._1).toSeq.distinct.sorted
      val floors = langs.map { l =>
        (l,
          fl.get((l, "len")).map(_._1.toLong),
          fl.get((l, "stop")).map(_._1),
          fl.get((l, "lm")).map(_._1),
          fl.get((l, "dup")).map(_._2))
      }.toDF("lang", "len_floor", "stop_floor", "lm_floor", "dup_ceil")
      val flagged = joined.join(broadcast(floors), Seq("lang"))
        .withColumn("keep", col("n_tokens") >= col("len_floor") &&
          col("stop_ratio") >= col("stop_floor") &&
          col("avg_logprob") >= col("lm_floor") &&
          col("dup_frac") <= col("dup_ceil"))
      val rates = flagged.groupBy("lang").agg(
        (sum(when(col("keep"), 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("kr"))
      flagged.join(broadcast(rates), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("stop_ratio"),
          col("avg_logprob"), col("dup_frac"),
          col("len_floor"), col("stop_floor"), col("lm_floor"), col("dup_ceil"),
          col("keep"), (col("kr") >= 0.80).as("keep_rate_ok"))
        .orderBy("doc_id")
    }),

    // SPAN-LEVEL DEDUP REMOVAL (round 17 — the round-16 verdict's
    // measurement→action gap: q152 measures duplicated-span fractions;
    // this CUTS them and emits the cleaned corpus, Lee et al. 2021's
    // actual pipeline step). The q152 plant makes the removal provably
    // fire: every 10th doc carries the same 10-token boilerplate
    // header, whose 3 interior 8-grams are shared across all planted
    // docs — the MIN planted doc_id keeps its copy (the q110 canonical
    // convention), every other planted doc loses exactly the header's
    // covered positions. The oracle replays the ENTIRE position
    // arithmetic in SQL — gram starts, the ≥2-distinct-docs gate, the
    // min-doc canonical, interval coverage, ordered reassembly — and
    // the cleaned text is compared BY MD5, so one moved token anywhere
    // in the corpus flips the row.
    "q164_span_dedup_removal" -> ((s, dir) => {
      val planted = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" boiler plate license header repeated" +
            " verbatim across many corpus documents")))
          .otherwise(col("text")).as("text"))
      graft.operators.Dedup.removeDupSpans(planted, "doc_id", "text", n = 8)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("cleaned_text")).as("cleaned_md5"))
        .orderBy("doc_id")
    }),

    // PER-LANGUAGE BIGRAM LM (round 17 — the round-16 verdict's
    // "Missing #2": q163 bucketed the THRESHOLDS per language but the
    // LM underneath was still trained on the whole corpus, so a
    // minority language's fluency was scored against the majority's
    // distribution; Wenzek et al. 2020 train one LM per language).
    // Every count table now keys on the q52-PREDICTED language (no
    // label side-channel — the q163 discipline), and each document is
    // scored under its own bucket's distribution. The oracle replays
    // the lang-ID CASE and the full interpolation chain with lang
    // joined into every count table — exact-long sums, hashed raw.
    "q165_bigram_lm_lang" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        graft.operators.TextOps.predictLang(col("text")).as("lang"),
        col("text"))
      graft.operators.LangModel.bigramLogprobByLang(
          docs, "doc_id", "text", "lang", lambda = 0.75)
        .select(col("doc_id"), col("lang"), col("n_bigrams"),
          col("avg_logprob"))
        .orderBy("doc_id")
    }),

    // RETRIEVAL EVALUATION (round 14): IR metrics over the batch BM25
    // ranker — MRR, precision@10, recall@10 per query, against the
    // deterministic relevance label "doc contains ALL query terms"
    // (derivable in both engines from the same tf inventory, so the
    // label needs no annotation side-channel). Five query sets mix
    // dense terms (df≈380/500) with a sparse one ('dup', df=25); rank
    // ties break on (quantized score, doc_id) — the q150 discipline —
    // so the permutation is engine-independent. The ranking window is
    // PARTITIONED by query. Completes the retrieval story: build
    // (q149), serve hybrid (q150), evaluate (here).
    "q154_retrieval_eval" -> ((s, dir) => {
      import s.implicits._
      val scored = graft.operators.Retrieval.bm25Batch(
        Tables.documents(s, dir), "doc_id", "text", irQueries)
      val nt = irQueries.map { case (q, ts) => (q, ts.size.toLong) }
        .toDF("query_id", "n_terms")
      val ranked = scored.join(broadcast(nt), Seq("query_id"))
        .withColumn("rel", col("n_terms_matched") === col("n_terms"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(qz(col("bm25"), 6).desc, col("doc_id"))))
      ranked.groupBy("query_id")
        .agg(
          sum(when(col("rel"), 1L).otherwise(0L)).as("n_rel"),
          sum(when(col("rel") && col("rank") <= 10, 1L).otherwise(0L))
            .as("hits_at_10"))
        .select(col("query_id"), col("n_rel"), col("hits_at_10"),
          qz(col("hits_at_10").cast("double") / 10.0, 6).as("p_at_10"),
          when(col("n_rel") > 0,
            qz(col("hits_at_10").cast("double") / col("n_rel"), 6))
            .otherwise(lit(0.0)).as("r_at_10"))
        .join(
          ranked.filter(col("rel"))
            .groupBy("query_id")
            .agg(qz(max(lit(1.0) / col("rank")), 6).as("rr")),
          Seq("query_id"), "left")
        .select(col("query_id"), col("n_rel"), col("hits_at_10"),
          col("p_at_10"), col("r_at_10"),
          coalesce(col("rr"), lit(0.0)).as("rr"))
        .orderBy("query_id")
    })
  )

  /** Shared IR query inventory (q154): the Spark side and the generated
    * SQL oracle derive from this ONE value, so the two engines cannot
    * disagree about what was asked. */
  private val irQueries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("spark", "merge", "vector"),
    1 -> Seq("join", "hash"),
    2 -> Seq("dup", "scan"),
    3 -> Seq("stream", "window", "batch"),
    4 -> Seq("fast", "slow", "sort"))

  private val stopList = TextOps.stopListSql

  def oracle: Map[String, String] = Map(
    "q93_unigram_logprob" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tk
        | FROM documents),
        |tf AS (SELECT tk, count(*) AS tf FROM tok GROUP BY tk),
        |n AS (SELECT count(*) AS total FROM tok)
        |SELECT tok.doc_id, count(*) AS n_tokens,
        | round((avg(ln(CAST(tf.tf AS DOUBLE) / n.total))) * 1000000.0)
        |  / 1000000.0 + 0.0 AS avg_logprob
        |FROM tok JOIN tf ON tok.tk = tf.tk CROSS JOIN n
        |GROUP BY tok.doc_id ORDER BY tok.doc_id""".stripMargin,

    // identical row set: the rate formula and the weighted predicate are
    // both pure functions of the table
    "q94_source_rebalance" ->
      """WITH d AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN source ELSE 'src_big' END AS mix_src
        | FROM documents),
        |c AS (SELECT mix_src, count(*) AS src_n FROM d GROUP BY mix_src),
        |t AS (SELECT count(*) AS n, count(DISTINCT mix_src) AS n_src FROM d),
        |r AS (
        | SELECT c.mix_src,
        |  least(1.0, (CAST(t.n AS DOUBLE) / t.n_src) / c.src_n) AS rate
        | FROM c CROSS JOIN t)
        |SELECT d.doc_id, d.mix_src
        |FROM d JOIN r ON d.mix_src = r.mix_src
        |WHERE CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
        |   AS UBIGINT)
        |  < floor(least(greatest(r.rate, 0.0), 1.0) * 4294967296.0)
        |ORDER BY d.doc_id""".stripMargin,

    "q95_sequence_packing" ->
      """WITH s AS (
        | SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 12)
        |    AS UBIGINT) % 8 AS BIGINT) AS shard,
        |  md5('pack:' || CAST(doc_id AS VARCHAR)) AS ord
        | FROM documents),
        |w AS (
        | SELECT doc_id, shard, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY ord
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        | FROM s)
        |SELECT doc_id, shard, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
        | CAST((cum_tokens - 1) // 2048 AS BIGINT) AS bin
        |FROM w ORDER BY doc_id""".stripMargin,

    // exact counts + jaccard recomputed; the sketch tolerance flag is
    // the predicted-true emission (q17/q62 pattern)
    "q97_corpus_sketch" ->
      """WITH ta AS (
        | SELECT regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents WHERE doc_id % 2 = 0),
        |tb AS (
        | SELECT regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents WHERE doc_id % 2 = 1
        | UNION ALL
        | SELECT regexp_split_to_array(trim(text), '\s+')
        | FROM documents WHERE doc_id % 10 = 0),
        |sa AS (
        | SELECT DISTINCT unnest(list_transform(
        |   generate_series(0, greatest(len(toks) - 3, 0)),
        |   i -> md5(array_to_string(toks[i+1:i+3], ' ')))) AS g FROM ta),
        |sb AS (
        | SELECT DISTINCT unnest(list_transform(
        |   generate_series(0, greatest(len(toks) - 3, 0)),
        |   i -> md5(array_to_string(toks[i+1:i+3], ' ')))) AS g FROM tb),
        |m AS (
        | SELECT (SELECT count(*) FROM sa) AS n_a,
        |  (SELECT count(*) FROM sb) AS n_b,
        |  (SELECT count(*) FROM sa JOIN sb ON sa.g = sb.g) AS inter)
        |SELECT n_a, n_b, inter,
        | CASE WHEN n_a + n_b - inter > 0 THEN
        |  round((CAST(inter AS DOUBLE) / (n_a + n_b - inter)) * 1000000.0)
        |   / 1000000.0 + 0.0
        | ELSE 0.0 END AS exact_j,
        | TRUE AS est_ok
        |FROM m""".stripMargin,

    "q98_novelty" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents),
        |sh AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(
        |   generate_series(0, greatest(len(toks) - 3, 0)),
        |   i -> md5(array_to_string(toks[i+1:i+3], ' '))))) AS g
        | FROM t),
        |df AS (SELECT g, count(DISTINCT doc_id) AS gdf FROM sh GROUP BY g)
        |SELECT sh.doc_id, count(*) AS n_grams,
        | CAST(sum(CASE WHEN df.gdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        | round((avg(CASE WHEN df.gdf = 1 THEN 1.0 ELSE 0.0 END)) * 1000000.0)
        |  / 1000000.0 + 0.0 AS novelty
        |FROM sh JOIN df ON sh.g = df.g
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    // same boundary predicate + running boundary count; chunk text
    // rebuilt with an ORDER BY inside list()
    "q99_cdc_chunking" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents),
        |p AS (
        | SELECT doc_id, i - 1 AS pos, toks[i] AS tok,
        |  CASE WHEN substr(md5(toks[i]), 1, 1) = '0' THEN 1 ELSE 0 END AS b
        | FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
        |c AS (
        | SELECT doc_id, pos, tok,
        |  sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id
        | FROM p)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        | count(*) AS n_tokens,
        | md5(array_to_string(list(tok ORDER BY pos), ' ')) AS chunk_md5
        |FROM c GROUP BY doc_id, chunk_id
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // only the genuinely-new (prefixed) docs survive the anti join
    "q96_ingest_dedup" ->
      """WITH batch AS (
        | SELECT -doc_id * 2 - 1 AS doc_id, md5(text) AS content_hash
        | FROM documents WHERE doc_id % 10 = 0
        | UNION ALL
        | SELECT -doc_id * 2 - 2, md5('new: ' || text)
        | FROM documents WHERE doc_id % 5 = 1)
        |SELECT b.doc_id, b.content_hash
        |FROM batch b
        |WHERE NOT EXISTS (
        | SELECT 1 FROM documents d WHERE md5(d.text) = b.content_hash)
        |ORDER BY b.doc_id""".stripMargin,

    // same per-row-rate md5 predicate — identical row set required
    "q91_weighted_sample" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents
        |WHERE CAST('0x' || substr(md5('wq:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |   AS UBIGINT)
        |  < floor(least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 4294967296.0)
        |ORDER BY doc_id""".stripMargin,

    // q51's quality formula, ranked per source (6dp-quantized key +
    // doc_id tie-break = deterministic row_number in both engines)
    "q92_topk_per_source" ->
      s"""WITH t AS (
         | SELECT doc_id, source,
         |  regexp_split_to_array(trim(text), '\\s+') AS toks,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
         | FROM documents),
         |f AS (
         | SELECT doc_id, source,
         |  CAST(len(toks) AS DOUBLE) AS n,
         |  len(list_filter(toks, x -> list_contains($stopList, x))) AS stop_hits,
         |  n_punct
         | FROM t),
         |q AS (
         | SELECT doc_id, source,
         |  round((0.4 * least(1.0, n / 100.0)
         |   + 0.3 * (stop_hits / n)
         |   + 0.3 * (1.0 - least(1.0, n_punct / n))) * 1000000.0) / 1000000.0
         |   + 0.0 AS quality
         | FROM f),
         |r AS (
         | SELECT source, doc_id, quality, row_number() OVER (
         |   PARTITION BY source ORDER BY quality DESC, doc_id) AS rk
         | FROM q)
         |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, quality
         |FROM r WHERE rk <= 3 ORDER BY source, rk""".stripMargin,
    "q81_chunking" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents),
        |c AS (
        | SELECT doc_id, toks,
        |  unnest(generate_series(0, greatest(len(toks) - 11, 0), 30)) AS start
        | FROM t)
        |SELECT doc_id, CAST(start / 30 AS BIGINT) AS chunk_id,
        | CAST(len(toks[start+1:start+40]) AS BIGINT) AS n_chunk_tokens,
        | md5(array_to_string(toks[start+1:start+40], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q82_decontaminate" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents),
        |ev AS (
        | SELECT DISTINCT md5(array_to_string(toks[5:12], ' ')) AS g
        | FROM t WHERE doc_id % 10 = 0),
        |sh AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(
        |   generate_series(0, greatest(len(toks) - 8, 0)),
        |   i -> md5(array_to_string(toks[i+1:i+8], ' '))))) AS g
        | FROM t)
        |SELECT sh.doc_id, count(ev.g) AS n_hits, count(ev.g) > 0 AS contaminated
        |FROM sh LEFT JOIN ev ON sh.g = ev.g
        |GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin,

    // ratio twin: ev = ALL distinct shingles of the eval docs; flag is
    // the integer comparison 2*hits >= grams (no float threshold)
    "q140_fuzzy_decontam" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents),
        |ev AS (
        | SELECT DISTINCT unnest(list_distinct(list_transform(
        |   generate_series(0, greatest(len(toks) - 8, 0)),
        |   i -> md5(array_to_string(toks[i+1:i+8], ' '))))) AS g
        | FROM t WHERE doc_id % 10 = 0),
        |sh AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(
        |   generate_series(0, greatest(len(toks) - 8, 0)),
        |   i -> md5(array_to_string(toks[i+1:i+8], ' '))))) AS g
        | FROM t),
        |agg AS (
        | SELECT sh.doc_id, count(*) AS n_grams, count(ev.g) AS n_hits
        | FROM sh LEFT JOIN ev ON sh.g = ev.g
        | GROUP BY sh.doc_id)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        | CAST(n_hits AS BIGINT) AS n_hits,
        | round((CAST(n_hits AS DOUBLE) / n_grams) * 1000000.0) / 1000000.0 + 0.0 AS overlap,
        | n_hits * 2 >= n_grams AS contaminated
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q83_pii_redact" ->
      """WITH m AS (
        | SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
        |  || '@example.com via https://ex.com/p/' || CAST(doc_id AS VARCHAR)
        |  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |  || '.7 acct 4111111111' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0')
        |  AS messy
        | FROM documents),
        |r AS (
        | SELECT doc_id, length(messy) AS messy_len,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(messy,
        |   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |   'https?://[^ ]+', '<URL>', 'g'),
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |   '\b\d{9,}\b', '<NUM>', 'g') AS red
        | FROM m)
        |SELECT doc_id, md5(red) AS red_md5,
        | CAST(messy_len - length(red) AS BIGINT) AS removed_chars
        |FROM r ORDER BY doc_id""".stripMargin,

    "q84_token_census" ->
      """SELECT tk, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id,
        |       unnest(regexp_split_to_array(trim(text), '\s+')) AS tk
        |      FROM documents)
        |GROUP BY tk ORDER BY tf DESC, tk LIMIT 25""".stripMargin,

    // rank key is the ROUNDED tfidf on both sides (deterministic
    // cross-engine row_number; see the Spark-side comment)
    "q85_tfidf" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tk
        | FROM documents),
        |tf AS (SELECT doc_id, tk, count(*) AS tf FROM tok GROUP BY doc_id, tk),
        |df AS (SELECT tk, count(*) AS df FROM tf GROUP BY tk),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        | SELECT tf.doc_id, tf.tk, tf.tf, df.df,
        |  round((tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)) * 1000000.0)
        |   / 1000000.0 + 0.0 AS tfidf
        | FROM tf JOIN df ON tf.tk = df.tk CROSS JOIN n),
        |rk AS (
        | SELECT *, row_number() OVER (PARTITION BY doc_id
        |   ORDER BY tfidf DESC, tk) AS rk
        | FROM scored)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tk, tf, df, tfidf
        |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // aggregates recomputed from the SOURCE — equality proves the
    // partitioned sink round trip lossless
    "q87_shard_sink" ->
      """WITH s AS (
        | SELECT doc_id, text,
        |  CAST(CAST('0x' || substr(md5('epoch0:' || CAST(doc_id AS VARCHAR)), 1, 12)
        |    AS UBIGINT) % 8 AS BIGINT) AS shard
        | FROM documents)
        |SELECT shard, count(*) AS n_docs,
        | count(DISTINCT md5(text)) AS n_texts,
        | CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        | min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin,

    "q86_shard_assign" ->
      """WITH s AS (
        | SELECT doc_id,
        |  CAST(CAST('0x' || substr(md5('epoch0:' || CAST(doc_id AS VARCHAR)), 1, 12)
        |    AS UBIGINT) % 25 AS BIGINT) AS shard,
        |  md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS ord
        | FROM documents)
        |SELECT shard, count(*) AS n_docs, min(doc_id) AS min_doc,
        | max(doc_id) AS max_doc, arg_min(doc_id, ord) AS first_doc
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin,

    // every rate re-derived from scratch: counts → sqrt-share in exact
    // nano-units → normalized budget rate → md5 keep predicate
    "q109_temperature_mix" ->
      """WITH d AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN source ELSE 'src_big' END AS mix_src
        | FROM documents),
        |c AS (SELECT mix_src, count(*) AS src_n FROM d GROUP BY mix_src),
        |t AS (SELECT sum(src_n) AS n FROM c),
        |w AS (
        | SELECT mix_src, src_n, n,
        |  CAST(round(sqrt(CAST(src_n AS DOUBLE) / CAST(n AS DOUBLE))
        |    * 1000000000.0) AS BIGINT) AS w_int
        | FROM c CROSS JOIN t),
        |ws AS (SELECT sum(w_int) AS ws FROM w),
        |r AS (
        | SELECT mix_src,
        |  least(1.0, (CAST(w_int AS DOUBLE) / CAST(ws AS DOUBLE))
        |    * 0.5 * CAST(n AS DOUBLE) / CAST(src_n AS DOUBLE)) AS rate
        | FROM w CROSS JOIN ws)
        |SELECT d.doc_id, d.mix_src
        |FROM d JOIN r ON d.mix_src = r.mix_src
        |WHERE CAST('0x' || substr(md5('temp:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |   AS UBIGINT)
        |  < floor(least(greatest(rate, 0.0), 1.0) * 4294967296.0)
        |ORDER BY doc_id""".stripMargin,

    // the EXACT decontamination closure — the Bloom prefilter must be
    // invisible in the result
    "q108_bloom_decontam" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents),
        |ev AS (
        | SELECT DISTINCT md5(array_to_string(toks[11:16], ' ')) AS g
        | FROM t WHERE doc_id % 7 = 3),
        |sh AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(
        |   generate_series(0, greatest(len(toks) - 6, 0)),
        |   i -> md5(array_to_string(toks[i+1:i+6], ' '))))) AS g
        | FROM t)
        |SELECT sh.doc_id, count(ev.g) AS n_hits, count(ev.g) > 0 AS contaminated
        |FROM sh LEFT JOIN ev ON sh.g = ev.g
        |GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin,

    // fold hash recomputed from scratch: md5('fold:' || id) prefix mod 5
    "q116_kfold_strata" ->
      """WITH f AS (
        | SELECT lang,
        |  CAST(CAST('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |    AS UBIGINT) % 5 AS BIGINT) AS fold
        | FROM documents),
        |s AS (SELECT lang, count(*) AS n_lang FROM f GROUP BY 1),
        |c AS (SELECT lang, fold, count(*) AS n FROM f GROUP BY 1, 2)
        |SELECT c.lang AS lang, c.fold, c.n,
        | round(CAST(c.n AS DOUBLE) / n_lang * 1000000.0) / 1000000.0 + 0.0 AS share
        |FROM c JOIN s ON c.lang = s.lang
        |ORDER BY c.lang, c.fold""".stripMargin,

    // draw hash recomputed from scratch; same rejection join
    "q120_negative_samples" ->
      """WITH n AS (SELECT max(event_id) + 1 AS n FROM events),
        |anchors AS (SELECT DISTINCT user_id FROM events),
        |draws AS (
        | SELECT user_id AS anchor, j AS sample_idx,
        |  CAST(CAST('0x' || substr(md5('neg:' || CAST(user_id AS VARCHAR)
        |    || ':' || CAST(j AS VARCHAR)), 1, 8) AS UBIGINT)
        |   % (SELECT n FROM n) AS BIGINT) AS cand_id
        | FROM anchors CROSS JOIN generate_series(0, 4) AS t(j))
        |SELECT d.anchor AS user_id, d.sample_idx,
        | e.event_id AS neg_event_id, e.user_id AS owner, e.value
        |FROM draws d JOIN events e ON d.cand_id = e.event_id
        |WHERE e.user_id <> d.anchor
        |ORDER BY user_id, sample_idx""".stripMargin,

    // full interpolated-bigram re-derivation: the pair stream via
    // list_zip of the shifted token slices, every count table (bigram,
    // first-token margin, unigram, total), and the λ·c12/c1 +
    // (1−λ)·u2/T formula with the IDENTICAL left-assoc float shapes
    // (0.75/0.25 are exact binary fractions — decimal literals fold to
    // the same doubles Spark's lit()s hold); per-position ln rounds to
    // an exact long before the per-doc sum, like the Spark side.
    // Multi-referenced CTEs are AS MATERIALIZED (the q121 lesson):
    // DuckDB otherwise INLINES t/b/c12 into each of their references —
    // fine at sf0.01, an unbounded >50 GB spill at the sf5 spot gate
    // (measured: 17 s materialized vs killed-at-10-min inlined)
    "q151_bigram_perplexity" ->
      """WITH t AS MATERIALIZED (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents),
        |bgz AS (
        | SELECT doc_id,
        |  unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
        | FROM t),
        |b AS MATERIALIZED (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM bgz),
        |c12 AS MATERIALIZED (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2),
        |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
        |tok AS MATERIALIZED (SELECT unnest(toks) AS w2 FROM t),
        |u AS (SELECT w2, count(*) AS u2 FROM tok GROUP BY w2),
        |n AS (SELECT count(*) AS t FROM tok),
        |s AS (
        | SELECT b.doc_id,
        |  CAST(round(ln(0.75 * (CAST(c12.c12 AS DOUBLE) / c1.c1)
        |    + 0.25 * (CAST(u.u2 AS DOUBLE) / n.t)) * 1000000.0) AS BIGINT) AS ls
        | FROM b JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
        |  JOIN c1 ON b.w1 = c1.w1
        |  JOIN u ON b.w2 = u.w2
        |  CROSS JOIN n)
        |SELECT doc_id, count(*) AS n_bigrams,
        | sum(ls) / 1000000.0 / count(*) + 0.0 AS avg_logprob
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // positional 8-gram re-derivation: the same boilerplate plant, the
    // gram stream via generate_series window slices (grams group by
    // their RAW text where Spark groups by md5 — identical counts),
    // the per-(doc,gram) position counts, the distinct-doc gate at 2,
    // and the coverage fraction; pg is double-referenced so it must be
    // AS MATERIALIZED (q151's note — 12 s vs unbounded spill at sf5)
    "q152_span_coverage" ->
      """WITH base AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0
        |   THEN text || ' boiler plate license header repeated verbatim across many corpus documents'
        |   ELSE text END AS text
        | FROM documents),
        |t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM base),
        |g AS (
        | SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
        | FROM t, unnest(generate_series(1, len(toks)-7)) AS u(i)),
        |pg AS MATERIALIZED (SELECT doc_id, gram, count(*) AS np FROM g GROUP BY doc_id, gram),
        |dg AS (SELECT gram, count(*) AS nd FROM pg GROUP BY gram)
        |SELECT pg.doc_id, CAST(sum(pg.np) AS BIGINT) AS n_grams,
        | CAST(sum(CASE WHEN dg.nd >= 2 THEN pg.np ELSE 0 END) AS BIGINT) AS n_dup,
        | round((CAST(sum(CASE WHEN dg.nd >= 2 THEN pg.np ELSE 0 END) AS DOUBLE)
        |  / sum(pg.np)) * 1000000.0) / 1000000.0 + 0.0 AS dup_frac
        |FROM pg JOIN dg ON pg.gram = dg.gram
        |GROUP BY pg.doc_id ORDER BY pg.doc_id""".stripMargin,

    // the full composite: the planted base feeds the q51-shape stats,
    // the ENTIRE q151 bigram chain, and the ENTIRE q152 span chain;
    // every threshold literal parses to the identical double in both
    // engines, and the compared values are exact ints / exact-long
    // doubles / qz-quantized ratios, so the boolean verdicts agree
    // bit-for-bit. Multi-referenced CTEs stay AS MATERIALIZED.
    "q153_quality_filter" ->
      s"""WITH base AS MATERIALIZED (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0
        |   THEN text || ' boiler plate license header repeated verbatim across many corpus documents'
        |   ELSE text END AS text
        | FROM documents),
        |t AS MATERIALIZED (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        | FROM base),
        |st AS (
        | SELECT doc_id, len(toks) AS n_tokens,
        |  round((CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
        |   / len(toks)) * 1000000.0) / 1000000.0 + 0.0 AS stop_ratio
        | FROM t),
        |bgz AS (
        | SELECT doc_id,
        |  unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
        | FROM t),
        |b AS MATERIALIZED (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM bgz),
        |c12 AS MATERIALIZED (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2),
        |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
        |tok AS MATERIALIZED (SELECT unnest(toks) AS w2 FROM t),
        |u AS (SELECT w2, count(*) AS u2 FROM tok GROUP BY w2),
        |n AS (SELECT count(*) AS t FROM tok),
        |sc AS (
        | SELECT b.doc_id,
        |  CAST(round(ln(0.75 * (CAST(c12.c12 AS DOUBLE) / c1.c1)
        |    + 0.25 * (CAST(u.u2 AS DOUBLE) / n.t)) * 1000000.0) AS BIGINT) AS ls
        | FROM b JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
        |  JOIN c1 ON b.w1 = c1.w1
        |  JOIN u ON b.w2 = u.w2
        |  CROSS JOIN n),
        |lm AS (
        | SELECT doc_id, sum(ls) / 1000000.0 / count(*) + 0.0 AS avg_logprob
        | FROM sc GROUP BY doc_id),
        |g AS (
        | SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
        | FROM t, unnest(generate_series(1, len(toks)-7)) AS gi(i)),
        |pg AS MATERIALIZED (SELECT doc_id, gram, count(*) AS np FROM g GROUP BY doc_id, gram),
        |dg AS (SELECT gram, count(*) AS nd FROM pg GROUP BY gram),
        |span AS (
        | SELECT pg.doc_id,
        |  round((CAST(sum(CASE WHEN dg.nd >= 2 THEN pg.np ELSE 0 END) AS DOUBLE)
        |   / sum(pg.np)) * 1000000.0) / 1000000.0 + 0.0 AS dup_frac
        | FROM pg JOIN dg ON pg.gram = dg.gram
        | GROUP BY pg.doc_id)
        |SELECT st.doc_id, st.n_tokens, st.stop_ratio, lm.avg_logprob, span.dup_frac,
        | st.n_tokens >= 20 AS ok_len,
        | st.stop_ratio >= 0.01 AS ok_stop,
        | lm.avg_logprob >= -3.43 AS ok_lm,
        | span.dup_frac <= 0.2 AS ok_dup,
        | (st.n_tokens >= 20 AND st.stop_ratio >= 0.01
        |  AND lm.avg_logprob >= -3.43 AND span.dup_frac <= 0.2) AS keep
        |FROM st
        |LEFT JOIN lm ON st.doc_id = lm.doc_id
        |LEFT JOIN span ON st.doc_id = span.doc_id
        |ORDER BY st.doc_id""".stripMargin,

    // q153's signal CTEs + the GENERATED discSql ceil-rank floors
    // (Util.discSql — the same snippet generator the Spark side's
    // discPercentiles is proven against), then the keep verdict and
    // the union-bound keep-rate band, all replayed exactly
    "q160_quality_rel" ->
      s"""WITH base AS MATERIALIZED (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0
        |   THEN text || ' boiler plate license header repeated verbatim across many corpus documents'
        |   ELSE text END AS text
        | FROM documents),
        |t AS MATERIALIZED (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        | FROM base),
        |st AS (
        | SELECT doc_id, len(toks) AS n_tokens,
        |  round((CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
        |   / len(toks)) * 1000000.0) / 1000000.0 + 0.0 AS stop_ratio
        | FROM t),
        |bgz AS (
        | SELECT doc_id,
        |  unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
        | FROM t),
        |b AS MATERIALIZED (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM bgz),
        |c12 AS MATERIALIZED (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2),
        |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
        |tok AS MATERIALIZED (SELECT unnest(toks) AS w2 FROM t),
        |u AS (SELECT w2, count(*) AS u2 FROM tok GROUP BY w2),
        |n AS (SELECT count(*) AS t FROM tok),
        |sc AS (
        | SELECT b.doc_id,
        |  CAST(round(ln(0.75 * (CAST(c12.c12 AS DOUBLE) / c1.c1)
        |    + 0.25 * (CAST(u.u2 AS DOUBLE) / n.t)) * 1000000.0) AS BIGINT) AS ls
        | FROM b JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
        |  JOIN c1 ON b.w1 = c1.w1
        |  JOIN u ON b.w2 = u.w2
        |  CROSS JOIN n),
        |lm AS (
        | SELECT doc_id, sum(ls) / 1000000.0 / count(*) + 0.0 AS avg_logprob
        | FROM sc GROUP BY doc_id),
        |g AS (
        | SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
        | FROM t, unnest(generate_series(1, len(toks)-7)) AS gi(i)),
        |pg AS MATERIALIZED (SELECT doc_id, gram, count(*) AS np FROM g GROUP BY doc_id, gram),
        |dg AS (SELECT gram, count(*) AS nd FROM pg GROUP BY gram),
        |span AS (
        | SELECT pg.doc_id,
        |  round((CAST(sum(CASE WHEN dg.nd >= 2 THEN pg.np ELSE 0 END) AS DOUBLE)
        |   / sum(pg.np)) * 1000000.0) / 1000000.0 + 0.0 AS dup_frac
        | FROM pg JOIN dg ON pg.gram = dg.gram
        | GROUP BY pg.doc_id),
        |joined AS MATERIALIZED (
        | SELECT st.doc_id, st.n_tokens, st.stop_ratio, lm.avg_logprob, span.dup_frac
        | FROM st
        | LEFT JOIN lm ON st.doc_id = lm.doc_id
        | LEFT JOIN span ON st.doc_id = span.doc_id),
        |r1 AS (SELECT n_tokens AS v, row_number() OVER (ORDER BY n_tokens) AS rn,
        |  count(*) OVER () AS n FROM joined),
        |f1 AS (SELECT ${Util.discSql("v", 1, 20)} AS len_floor FROM r1),
        |r2 AS (SELECT stop_ratio AS v, row_number() OVER (ORDER BY stop_ratio) AS rn,
        |  count(*) OVER () AS n FROM joined),
        |f2 AS (SELECT ${Util.discSql("v", 1, 20)} AS stop_floor FROM r2),
        |r3 AS (SELECT avg_logprob AS v, row_number() OVER (ORDER BY avg_logprob) AS rn,
        |  count(*) OVER () AS n FROM joined WHERE avg_logprob IS NOT NULL),
        |f3 AS (SELECT ${Util.discSql("v", 1, 20)} AS lm_floor FROM r3),
        |r4 AS (SELECT dup_frac AS v, row_number() OVER (ORDER BY dup_frac) AS rn,
        |  count(*) OVER () AS n FROM joined WHERE dup_frac IS NOT NULL),
        |f4 AS (SELECT ${Util.discSql("v", 19, 20)} AS dup_ceil FROM r4),
        |fl AS (SELECT * FROM f1 CROSS JOIN f2 CROSS JOIN f3 CROSS JOIN f4),
        |fj AS MATERIALIZED (
        | SELECT j.*, fl.len_floor, fl.stop_floor, fl.lm_floor, fl.dup_ceil,
        |  (j.n_tokens >= fl.len_floor AND j.stop_ratio >= fl.stop_floor
        |   AND j.avg_logprob >= fl.lm_floor AND j.dup_frac <= fl.dup_ceil) AS keep
        | FROM joined j CROSS JOIN fl),
        |rate AS (SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
        |  / count(*) AS kr FROM fj)
        |SELECT fj.doc_id, fj.n_tokens, fj.stop_ratio, fj.avg_logprob, fj.dup_frac,
        | fj.len_floor, fj.stop_floor, fj.lm_floor, fj.dup_ceil, fj.keep,
        | (rate.kr >= 0.80 AND rate.kr < 1.0) AS keep_rate_ok
        |FROM fj CROSS JOIN rate
        |ORDER BY fj.doc_id""".stripMargin,

    // q160's full replay, bucketed: lang from the q52 prediction CASE,
    // rank CTEs PARTITIONed BY lang, discSql floors GROUP BY lang,
    // keep-rate per lang — the whole per-language frame hashes raw
    "q163_quality_rel_lang" ->
      s"""WITH base AS MATERIALIZED (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0
        |   THEN text || ' boiler plate license header repeated verbatim across many corpus documents'
        |   ELSE text END AS text
        | FROM documents),
        |t AS MATERIALIZED (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        | FROM base),
        |lg AS MATERIALIZED (
        | SELECT doc_id,
        |  CASE WHEN hits_en > 0 AND hits_en >= greatest(hits_fr, hits_de, hits_es) THEN 'en'
        |       WHEN hits_fr > 0 AND hits_fr >= greatest(hits_de, hits_es) THEN 'fr'
        |       WHEN hits_de > 0 AND hits_de >= hits_es THEN 'de'
        |       WHEN hits_es > 0 THEN 'es'
        |       ELSE 'unknown' END AS lang
        | FROM (
        |  SELECT doc_id,
        |   len(list_filter(toks, x -> list_contains(['the','a','of','to','and','is','in'], x))) AS hits_en,
        |   len(list_filter(toks, x -> list_contains(['le','la','de','et','un','est'], x))) AS hits_fr,
        |   len(list_filter(toks, x -> list_contains(['der','die','das','und','ein','ist'], x))) AS hits_de,
        |   len(list_filter(toks, x -> list_contains(['el','los','de','y','un','es'], x))) AS hits_es
        |  FROM t)),
        |st AS (
        | SELECT doc_id, len(toks) AS n_tokens,
        |  round((CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
        |   / len(toks)) * 1000000.0) / 1000000.0 + 0.0 AS stop_ratio
        | FROM t),
        |bgz AS (
        | SELECT t.doc_id, lg.lang,
        |  unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
        | FROM t JOIN lg ON t.doc_id = lg.doc_id),
        |b AS MATERIALIZED (SELECT doc_id, lang, z[1] AS w1, z[2] AS w2 FROM bgz),
        |c12 AS MATERIALIZED (SELECT lang, w1, w2, count(*) AS c12 FROM b GROUP BY lang, w1, w2),
        |c1 AS (SELECT lang, w1, sum(c12) AS c1 FROM c12 GROUP BY lang, w1),
        |tok AS MATERIALIZED (
        | SELECT lg.lang, unnest(toks) AS w2
        | FROM t JOIN lg ON t.doc_id = lg.doc_id),
        |u AS (SELECT lang, w2, count(*) AS u2 FROM tok GROUP BY lang, w2),
        |n AS (SELECT lang, count(*) AS t FROM tok GROUP BY lang),
        |sc AS (
        | SELECT b.doc_id,
        |  CAST(round(ln(0.75 * (CAST(c12.c12 AS DOUBLE) / c1.c1)
        |    + 0.25 * (CAST(u.u2 AS DOUBLE) / n.t)) * 1000000.0) AS BIGINT) AS ls
        | FROM b JOIN c12 ON b.lang = c12.lang AND b.w1 = c12.w1 AND b.w2 = c12.w2
        |  JOIN c1 ON b.lang = c1.lang AND b.w1 = c1.w1
        |  JOIN u ON b.lang = u.lang AND b.w2 = u.w2
        |  JOIN n ON b.lang = n.lang),
        |lm AS (
        | SELECT doc_id, sum(ls) / 1000000.0 / count(*) + 0.0 AS avg_logprob
        | FROM sc GROUP BY doc_id),
        |g AS (
        | SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
        | FROM t, unnest(generate_series(1, len(toks)-7)) AS gi(i)),
        |pg AS MATERIALIZED (SELECT doc_id, gram, count(*) AS np FROM g GROUP BY doc_id, gram),
        |dg AS (SELECT gram, count(*) AS nd FROM pg GROUP BY gram),
        |span AS (
        | SELECT pg.doc_id,
        |  round((CAST(sum(CASE WHEN dg.nd >= 2 THEN pg.np ELSE 0 END) AS DOUBLE)
        |   / sum(pg.np)) * 1000000.0) / 1000000.0 + 0.0 AS dup_frac
        | FROM pg JOIN dg ON pg.gram = dg.gram
        | GROUP BY pg.doc_id),
        |joined AS MATERIALIZED (
        | SELECT st.doc_id, lg.lang, st.n_tokens, st.stop_ratio,
        |  lm.avg_logprob, span.dup_frac
        | FROM st
        | JOIN lg ON st.doc_id = lg.doc_id
        | LEFT JOIN lm ON st.doc_id = lm.doc_id
        | LEFT JOIN span ON st.doc_id = span.doc_id),
        |r1 AS (SELECT lang, n_tokens AS v,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n FROM joined),
        |f1 AS (SELECT lang, ${Util.discSql("v", 1, 20)} AS len_floor
        |  FROM r1 GROUP BY lang),
        |r2 AS (SELECT lang, stop_ratio AS v,
        |  row_number() OVER (PARTITION BY lang ORDER BY stop_ratio) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n FROM joined),
        |f2 AS (SELECT lang, ${Util.discSql("v", 1, 20)} AS stop_floor
        |  FROM r2 GROUP BY lang),
        |r3 AS (SELECT lang, avg_logprob AS v,
        |  row_number() OVER (PARTITION BY lang ORDER BY avg_logprob) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n
        |  FROM joined WHERE avg_logprob IS NOT NULL),
        |f3 AS (SELECT lang, ${Util.discSql("v", 1, 20)} AS lm_floor
        |  FROM r3 GROUP BY lang),
        |r4 AS (SELECT lang, dup_frac AS v,
        |  row_number() OVER (PARTITION BY lang ORDER BY dup_frac) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n
        |  FROM joined WHERE dup_frac IS NOT NULL),
        |f4 AS (SELECT lang, ${Util.discSql("v", 19, 20)} AS dup_ceil
        |  FROM r4 GROUP BY lang),
        |fl AS (SELECT f1.lang, f1.len_floor, f2.stop_floor, f3.lm_floor, f4.dup_ceil
        | FROM f1
        | LEFT JOIN f2 ON f1.lang = f2.lang
        | LEFT JOIN f3 ON f1.lang = f3.lang
        | LEFT JOIN f4 ON f1.lang = f4.lang),
        |fj AS MATERIALIZED (
        | SELECT j.*, fl.len_floor, fl.stop_floor, fl.lm_floor, fl.dup_ceil,
        |  (j.n_tokens >= fl.len_floor AND j.stop_ratio >= fl.stop_floor
        |   AND j.avg_logprob >= fl.lm_floor AND j.dup_frac <= fl.dup_ceil) AS keep
        | FROM joined j JOIN fl ON j.lang = fl.lang),
        |rate AS (SELECT lang, CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
        |  / count(*) AS kr FROM fj GROUP BY lang)
        |SELECT fj.doc_id, fj.lang, fj.n_tokens, fj.stop_ratio, fj.avg_logprob,
        | fj.dup_frac, fj.len_floor, fj.stop_floor, fj.lm_floor, fj.dup_ceil,
        | fj.keep, (rate.kr >= 0.80) AS keep_rate_ok
        |FROM fj JOIN rate ON fj.lang = rate.lang
        |ORDER BY fj.doc_id""".stripMargin,

    // full position-arithmetic replay of the span REMOVAL: the q152
    // plant and gram stream, the ≥2-distinct-docs gate WITH min-doc
    // canonical, the start→covered-positions expansion, the ordered
    // token reassembly (string_agg ORDER BY position == Spark's
    // order-preserving array filter), and the md5 of the cleaned text.
    // Grams group by RAW text where Spark groups by md5 — identical
    // inventories (q152's note). Zero-kept docs reassemble to '' via
    // the coalesce (string_agg over no rows is NULL).
    "q164_span_dedup_removal" ->
      """WITH base AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0
        |   THEN text || ' boiler plate license header repeated verbatim across many corpus documents'
        |   ELSE text END AS text
        | FROM documents),
        |t AS MATERIALIZED (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM base),
        |g AS MATERIALIZED (
        | SELECT doc_id, i, array_to_string(toks[i:i+7], ' ') AS gram
        | FROM t, unnest(generate_series(1, len(toks)-7)) AS u(i)),
        |pg AS (SELECT doc_id, gram FROM g GROUP BY doc_id, gram),
        |dg AS (SELECT gram, count(*) AS nd, min(doc_id) AS canon
        | FROM pg GROUP BY gram),
        |cs AS MATERIALIZED (
        | SELECT g.doc_id, g.i FROM g JOIN dg ON g.gram = dg.gram
        | WHERE dg.nd >= 2 AND g.doc_id <> dg.canon),
        |cut AS MATERIALIZED (
        | SELECT DISTINCT doc_id, j
        | FROM cs, unnest(generate_series(cs.i, cs.i + 7)) AS v(j)),
        |tp AS MATERIALIZED (
        | SELECT doc_id, p.j, toks[p.j] AS tok
        | FROM t, unnest(generate_series(1, len(toks))) AS p(j)),
        |keepx AS (
        | SELECT tp.doc_id, tp.j, tp.tok
        | FROM tp LEFT JOIN cut ON tp.doc_id = cut.doc_id AND tp.j = cut.j
        | WHERE cut.j IS NULL),
        |agg AS (
        | SELECT doc_id, count(*) AS n_kept,
        |  string_agg(tok, ' ' ORDER BY j) AS cleaned
        | FROM keepx GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        | CAST(len(t.toks) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
        | md5(coalesce(a.cleaned, '')) AS cleaned_md5
        |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // the q151 chain with the q52 lang-ID CASE joined into EVERY count
    // table (bigram, prefix, unigram, per-lang total) — each document
    // scored under its own predicted-language distribution; exact-long
    // per-position sums, avg_logprob hashed raw
    "q165_bigram_lm_lang" ->
      """WITH t AS MATERIALIZED (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents),
        |lg AS MATERIALIZED (
        | SELECT doc_id,
        |  CASE WHEN hits_en > 0 AND hits_en >= greatest(hits_fr, hits_de, hits_es) THEN 'en'
        |       WHEN hits_fr > 0 AND hits_fr >= greatest(hits_de, hits_es) THEN 'fr'
        |       WHEN hits_de > 0 AND hits_de >= hits_es THEN 'de'
        |       WHEN hits_es > 0 THEN 'es'
        |       ELSE 'unknown' END AS lang
        | FROM (
        |  SELECT doc_id,
        |   len(list_filter(toks, x -> list_contains(['the','a','of','to','and','is','in'], x))) AS hits_en,
        |   len(list_filter(toks, x -> list_contains(['le','la','de','et','un','est'], x))) AS hits_fr,
        |   len(list_filter(toks, x -> list_contains(['der','die','das','und','ein','ist'], x))) AS hits_de,
        |   len(list_filter(toks, x -> list_contains(['el','los','de','y','un','es'], x))) AS hits_es
        |  FROM t)),
        |bgz AS (
        | SELECT t.doc_id, lg.lang,
        |  unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
        | FROM t JOIN lg ON t.doc_id = lg.doc_id),
        |b AS MATERIALIZED (
        | SELECT doc_id, lang, z[1] AS w1, z[2] AS w2 FROM bgz),
        |c12 AS MATERIALIZED (
        | SELECT lang, w1, w2, count(*) AS c12 FROM b GROUP BY lang, w1, w2),
        |c1 AS (SELECT lang, w1, sum(c12) AS c1 FROM c12 GROUP BY lang, w1),
        |tok AS MATERIALIZED (
        | SELECT lg.lang, unnest(toks) AS w2
        | FROM t JOIN lg ON t.doc_id = lg.doc_id),
        |u AS (SELECT lang, w2, count(*) AS u2 FROM tok GROUP BY lang, w2),
        |n AS (SELECT lang, count(*) AS t FROM tok GROUP BY lang),
        |s AS (
        | SELECT b.doc_id, b.lang,
        |  CAST(round(ln(0.75 * (CAST(c12.c12 AS DOUBLE) / c1.c1)
        |    + 0.25 * (CAST(u.u2 AS DOUBLE) / n.t)) * 1000000.0) AS BIGINT) AS ls
        | FROM b JOIN c12 ON b.lang = c12.lang AND b.w1 = c12.w1 AND b.w2 = c12.w2
        |  JOIN c1 ON b.lang = c1.lang AND b.w1 = c1.w1
        |  JOIN u ON b.lang = u.lang AND b.w2 = u.w2
        |  JOIN n ON b.lang = n.lang)
        |SELECT doc_id, lang, count(*) AS n_bigrams,
        | sum(ls) / 1000000.0 / count(*) + 0.0 AS avg_logprob
        |FROM s GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin,

    // GENERATED multi-query BM25 + IR metrics: the query inventory is
    // the VALUES rendering of the SAME irQueries value the Spark side
    // reads (the q144 generated-oracle discipline — the two engines
    // cannot disagree about what was asked); the per-(query,doc) BM25
    // block mirrors bm25Sql's left-assoc shapes, relevance is the
    // all-terms-matched count equality, ranks break ties on
    // (quantized score, doc_id), and RR is max(1/rank) over relevant
    "q154_retrieval_eval" -> {
      val qtValues = irQueries.flatMap { case (q, ts) =>
        ts.map(t => s"($q, '$t')") }.mkString(", ")
      s"""WITH tok AS (
        | SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS dl
        | FROM documents),
        |e AS (
        | SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tk
        | FROM documents),
        |qt AS (SELECT * FROM (VALUES $qtValues) AS v(query_id, tk)),
        |tf AS (
        | SELECT qt.query_id, e.doc_id, e.tk, CAST(count(*) AS DOUBLE) AS tf
        | FROM e JOIN qt ON e.tk = qt.tk GROUP BY qt.query_id, e.doc_id, e.tk),
        |dft AS (
        | SELECT query_id, tk, CAST(count(*) AS DOUBLE) AS df
        | FROM tf GROUP BY query_id, tk),
        |st AS (
        | SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl FROM tok),
        |sc AS (
        | SELECT tf.query_id, tf.doc_id,
        |  CAST(round((ln((n - df + 0.5) / (df + 0.5) + 1.0) * tf * (1.2 + 1.0)
        |   / (tf + ((dl * 0.75 * n / sumdl) + (1.0 - 0.75)) * 1.2)) * 1000000000.0) AS BIGINT) AS ts
        | FROM tf JOIN dft ON tf.query_id = dft.query_id AND tf.tk = dft.tk
        |  JOIN tok ON tf.doc_id = tok.doc_id CROSS JOIN st),
        |bm AS MATERIALIZED (
        | SELECT query_id, doc_id, sum(ts) / 1000000000.0 + 0.0 AS bm25,
        |  count(*) AS nm
        | FROM sc GROUP BY query_id, doc_id),
        |nt AS (SELECT query_id, count(*) AS n_terms FROM qt GROUP BY query_id),
        |rk AS MATERIALIZED (
        | SELECT bm.query_id, bm.doc_id, (bm.nm = nt.n_terms) AS rel,
        |  row_number() OVER (PARTITION BY bm.query_id
        |   ORDER BY round(bm25 * 1000000.0) / 1000000.0 + 0.0 DESC, doc_id) AS rank
        | FROM bm JOIN nt ON bm.query_id = nt.query_id),
        |agg AS (
        | SELECT query_id,
        |  CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
        |  CAST(sum(CASE WHEN rel AND rank <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_10
        | FROM rk GROUP BY query_id),
        |mrr AS (
        | SELECT query_id,
        |  round(max(CAST(1.0 AS DOUBLE) / rank) * 1000000.0) / 1000000.0 + 0.0 AS rr
        | FROM rk WHERE rel GROUP BY query_id)
        |SELECT agg.query_id, agg.n_rel, agg.hits_at_10,
        | round((CAST(hits_at_10 AS DOUBLE) / 10.0) * 1000000.0) / 1000000.0 + 0.0 AS p_at_10,
        | CASE WHEN n_rel > 0
        |  THEN round((CAST(hits_at_10 AS DOUBLE) / n_rel) * 1000000.0) / 1000000.0 + 0.0
        |  ELSE 0.0 END AS r_at_10,
        | coalesce(mrr.rr, 0.0) AS rr
        |FROM agg LEFT JOIN mrr ON agg.query_id = mrr.query_id
        |ORDER BY agg.query_id""".stripMargin
    },

    // full BM25 re-derivation: tf/df/dl/avgdl and the Okapi formula with
    // the IDENTICAL left-assoc float shapes as Retrieval.bm25 (the
    // (1.2 + 1.0) literal is deliberate — both engines fold it with the
    // same IEEE add); per-term scores round to exact longs before the
    // per-doc sum, like the Spark side
    "q149_bm25" -> bm25Sql(
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        | round(bm25 * 1000000.0) / 1000000.0 + 0.0 AS bm25_q
        |FROM bm ORDER BY bm25_q DESC, doc_id LIMIT 10"""),

    // both stages replayed: the BM25 block, the rounded-score shortlist
    // cut (same tie-break), the embedding join (coverage drop), and the
    // q58 cosine formula; self excluded like the rerank
    "q150_hybrid_retrieval" -> bm25Sql(
      """short AS (
        | SELECT doc_id, round(bm25 * 1000000.0) / 1000000.0 AS bq
        | FROM bm ORDER BY bq DESC, doc_id LIMIT 50),
        |e AS (
        | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        | FROM embeddings),
        |qv AS (SELECT v AS qvec FROM e WHERE vec_id = 7),
        |cand AS (
        | SELECT s.doc_id, s.bq, e.v FROM short s JOIN e ON e.vec_id = s.doc_id),
        |sims AS (
        | SELECT CAST(7 AS BIGINT) AS query_id, CAST(doc_id AS BIGINT) AS neighbor_id,
        |  round((list_dot_product(qvec, v)
        |   / (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(v, v)))) * 1000000.0) / 1000000.0 + 0.0 AS sim,
        |  bq FROM cand CROSS JOIN qv WHERE doc_id <> 7),
        |rk AS (
        | SELECT *, row_number() OVER (ORDER BY sim DESC, neighbor_id) AS rn
        | FROM sims)
        |SELECT query_id, neighbor_id, sim, bq + 0.0 AS bm25_q
        |FROM rk WHERE rn <= 5 ORDER BY neighbor_id""", extraCte = true)
  )

  /** Shared BM25 CTE block (q149/q150): one definition so the two
    * oracles' formula shapes cannot drift from each other. */
  private def bm25Sql(tail: String, extraCte: Boolean = false): String = {
    val sep = if (extraCte) "," else ""
    s"""WITH tok AS (
       | SELECT doc_id,
       |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS dl
       | FROM documents),
       |t AS (
       | SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tk
       | FROM documents),
       |tf AS (
       | SELECT doc_id, tk, CAST(count(*) AS DOUBLE) AS tf FROM t
       | WHERE tk IN ('spark', 'merge', 'vector') GROUP BY doc_id, tk),
       |dft AS (SELECT tk, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tk),
       |st AS (
       | SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl FROM tok),
       |sc AS (
       | SELECT tf.doc_id,
       |  CAST(round((ln((n - df + 0.5) / (df + 0.5) + 1.0) * tf * (1.2 + 1.0)
       |   / (tf + ((dl * 0.75 * n / sumdl) + (1.0 - 0.75)) * 1.2)) * 1000000000.0) AS BIGINT) AS ts
       | FROM tf JOIN dft USING (tk) JOIN tok USING (doc_id) CROSS JOIN st),
       |bm AS (
       | SELECT doc_id, sum(ts) / 1000000000.0 + 0.0 AS bm25 FROM sc GROUP BY doc_id)$sep
       |${tail.stripMargin}""".stripMargin
  }
}
