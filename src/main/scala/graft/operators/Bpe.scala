package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.NativeVector

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.
  * 2016, public — the GPT-2/HF training algorithm).
  *
  * The scale insight every real BPE trainer uses: merges depend only on
  * the DISTINCT-WORD HISTOGRAM, not the corpus. One corpus-sized
  * word-count shuffle up front (vocabulary-bounded output), then every
  * merge round runs on the word table: count adjacent symbol pairs
  * weighted by word count (explode → groupBy pair — bounded by the
  * live pair vocabulary), take the argmax (freq desc, then pair
  * lexicographic — a total order, so training is deterministic across
  * engines/layouts), and apply the merge to each word's symbol array
  * map-side via the codegen'd `bpe_merge` expression. A 100 TB corpus
  * and a 100 GB corpus with the same vocabulary train at the SAME
  * per-round cost after the first shuffle.
  *
  * Each round persists its symbol table and unpersists the previous one
  * (K rounds would otherwise stack K transforms of lineage onto every
  * job). The driver holds one (pair, freq) row per round — nothing
  * else ever collects. */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** End-of-word marker, appended as a separate final symbol so merges
    * can distinguish word-final from word-internal contexts (the
    * original BPE formulation). Chosen outside any natural alphabet. */
  val EndOfWord = "</w>"

  /** Train `numMerges` merges on the word histogram of `text`. Returns
    * the ordered merge table; `vocabulary` rebuilds the final symbol
    * vocabulary from it. Words shorter than 2 symbols never merge and
    * ride along untouched.
    *
    * Two EXACT-equivalent execution branches (BpeSpec proves parity on
    * real documents), chosen by histogram size — the Ivf/Pq bounded-
    * state doctrine, except here the bounded path is exact, not
    * approximate, because merges are a pure function of the histogram:
    *  - histogram ≤ `localThreshold` distinct words: collect it and run
    *    the merge loop driver-side. K merge rounds over a 10⁵-word
    *    histogram are milliseconds; K distributed rounds would pay K
    *    fixed job latencies for the same answer.
    *  - larger (the 100 TB corpus with a 10⁸ vocabulary): stay
    *    distributed — per round, one vocabulary-bounded pair-count job
    *    (argmax collects ONE row) and a lazy map-side merge via the
    *    codegen'd `bpe_merge`; each round's table is persisted and the
    *    previous one dropped only after its successor materializes. */
  def train(docs: DataFrame, text: String, numMerges: Int,
            localThreshold: Long = 100000L): Seq[Merge] = {
    val spark = docs.sparkSession
    NativeVector.register(spark)
    val hist = wordHistogram(docs, text).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (hist.count() <= localThreshold) {
        val local = hist.collect().map(r => r.getString(0) -> r.getLong(1))
        localTrain(local, numMerges)
      } else distributedTrain(hist, numMerges)
    } finally hist.unpersist()
  }

  /** ONE corpus-sized job: word histogram (map-side combined). The
    * single construction both train() and vocabulary() read — a drift
    * between their tokenizations would silently decouple the replayed
    * vocabulary from the trained merge table. */
  private def wordHistogram(docs: DataFrame, text: String): DataFrame =
    docs
      .select(explode(TextOps.tokens(col(text))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Histogram rows → (cnt, syms) with the end marker appended; shared
    * by the distributed branch and vocabulary(). split("") keeps
    * multi-byte code points whole. */
  private def withSyms(hist: DataFrame): DataFrame =
    hist.select(col("cnt"),
      concat(split(col("w"), "").cast("array<string>"),
        array(lit(EndOfWord))).as("syms"))

  /** Spark's string ordering compares UTF-8 BYTES (code-point order);
    * Java's String '<' compares UTF-16 code units, which DISAGREES for
    * supplementary-plane symbols (an emoji's lead surrogate sorts below
    * U+FFFF in UTF-16 but above it in UTF-8). The local branch must
    * tie-break exactly like the distributed orderBy or the two branches
    * diverge on such corpora. */
  private def utf8Less(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** Driver-side merge loop over a collected histogram — bit-identical
    * merges to the distributed branch (same tie-break total order,
    * UTF-8 byte comparison included). */
  private[operators] def localTrain(hist: Array[(String, Long)],
                                    numMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] = hist.map { case (w, c) =>
      (w.split("").filter(_.nonEmpty) :+ EndOfWord, c)
    }
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Array[Long]]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          val cur = counts.get(k)
          if (cur == null) counts.put(k, Array(c)) else cur(0) += c
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (k, v) =>
          if (best == null || v(0) > best._2 ||
            (v(0) == best._2 && (utf8Less(k._1, best._1._1) ||
              (k._1 == best._1._1 && utf8Less(k._2, best._1._2))))) best = (k, v(0))
        }
        val ((a, b), f) = best
        out += Merge(r, a, b, f)
        words = words.map { case (syms, c) =>
          (applyMerge(syms, a, b), c)
        }
      }
      r += 1
    }
    out.toSeq
  }

  /** The same left-to-right non-overlapping fuse as the `bpe_merge`
    * expression, over driver-local arrays. */
  private def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new Array[String](syms.length)
    var i = 0; var o = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out(o) = a + b; i += 2
      } else { out(o) = syms(i); i += 1 }
      o += 1
    }
    java.util.Arrays.copyOf(out, o)
  }

  private def distributedTrain(hist: DataFrame, numMerges: Int): Seq[Merge] = {
    var cur = withSyms(hist).persist(StorageLevel.MEMORY_AND_DISK)
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      bestPair(cur) match {
        case Some((a, b, f)) =>
          // bestPair materialized `cur`'s cache — NOW the predecessor
          // can go (dropping it earlier would recompute full lineage)
          prev.foreach(_.unpersist())
          prev = Some(cur)
          merges += Merge(r, a, b, f)
          cur = cur
            .withColumn("syms", NativeVector.bpeMerge(col("syms"), lit(a), lit(b)))
            .persist(StorageLevel.MEMORY_AND_DISK)
        case None => exhausted = true // every word is one symbol
      }
      r += 1
    }
    prev.foreach(_.unpersist())
    cur.unpersist()
    merges.toSeq
  }

  /** Most frequent adjacent pair, weighted by word count; total-order
    * tie-break (freq desc, left asc, right asc) makes the argmax — and
    * therefore the whole training run — deterministic. */
  private def bestPair(words: DataFrame): Option[(String, String, Long)] = {
    val row = words
      .select(col("cnt"), col("syms"), posexplode(slice(col("syms"), lit(1),
        greatest(size(col("syms")) - 1, lit(0)))).as(Seq("i", "a")))
      // posexplode is 0-indexed, element_at 1-indexed: +2 pairs (i, i+1)
      .withColumn("b", element_at(col("syms"), col("i") + 2))
      .groupBy("a", "b").agg(sum("cnt").as("freq"))
      .orderBy(desc("freq"), col("a").asc, col("b").asc)
      .limit(1)
      .collect()
    row.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** Re-derive the final vocabulary (distinct symbols + their weighted
    * corpus frequency) by replaying the merge table over the word
    * histogram — the artifact a tokenizer ships. */
  def vocabulary(docs: DataFrame, text: String, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    NativeVector.register(spark)
    val words = withSyms(wordHistogram(docs, text))
    val merged = merges.foldLeft(words) {
      case (df, m) =>
        df.withColumn("syms", NativeVector.bpeMerge(col("syms"), lit(m.left), lit(m.right)))
    }
    merged
      .select(col("cnt"), explode(col("syms")).as("symbol"))
      .groupBy("symbol").agg(sum("cnt").as("freq"))
  }

}
