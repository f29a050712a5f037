package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.NativeVector

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference BPE trainer (plain Scala, no Spark): the
    * textbook algorithm over a word histogram, with the SAME total-order
    * tie-break (freq desc, then UTF-8-byte-order left/right asc — the
    * order Spark's orderBy uses; Java's String '<' would diverge on
    * supplementary-plane symbols). Deliberately written structurally
    * differently (maps + sorted scans) so agreement with the
    * distributed trainer is evidence, not shared code. */
  private def utf8Key(s: String): Seq[Int] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq.map(_ & 0xff)

  private def refTrain(wordCounts: Map[String, Long],
                       numMerges: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toVector :+ Bpe.EndOfWord) -> c
    }
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var r = 0
    while (r < numMerges) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) =
          pairCounts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairCounts.isEmpty) return out.toSeq
      import scala.math.Ordering.Implicits.seqOrdering
      val ((a, b), f) = pairCounts.toSeq
        .sortBy { case ((x, y), c) => (-c, utf8Key(x), utf8Key(y)) }.head
      out += ((a, b, f))
      words = words.map { case (syms, c) =>
        val merged = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            merged += (a + b); i += 2
          } else { merged += syms(i); i += 1 }
        }
        merged.toVector -> c
      }.groupMapReduce(_._1)(_._2)(_ + _)
      r += 1
    }
    out.toSeq
  }

  test("bpe_merge expression: left-to-right non-overlapping fuse") {
    NativeVector.register(spark)
    val out = spark.range(1)
      .select(NativeVector.bpeMerge(
        typedLit(Seq("a", "a", "a", "b", "a", "a")), lit("a"), lit("a")).as("m"))
      .first().getAs[scala.collection.Seq[String]]("m")
    // "aaabaa" under (a,a): [aa, a, b, aa] — the overlap does NOT chain
    assert(out == Seq("aa", "a", "b", "aa"))
  }

  test("classic hand example: 'low lower lowest' learns the lo/low stem first") {
    val docs = Seq((1L, "low low low lower lower lowest")).toDF("id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
    val ref = refTrain(Map("low" -> 3L, "lower" -> 2L, "lowest" -> 1L), 4)
    assert(merges.map(m => (m.left, m.right, m.freq)) == ref, s"$merges vs $ref")
    // the first two merges build the shared stem on all 6 words
    assert(merges.head.left == "l" && merges.head.right == "o" && merges.head.freq == 6)
    assert(merges(1).left == "lo" && merges(1).right == "w" && merges(1).freq == 6)
  }

  test("BOTH branches match the independent reference on real documents (local ≡ distributed ≡ ref)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val local = Bpe.train(docs, "text", numMerges = 12) // histogram fits → local branch
    val dist = Bpe.train(docs, "text", numMerges = 12, localThreshold = 0L)
    val hist = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = refTrain(hist, 12)
    assert(local.map(m => (m.left, m.right, m.freq)) == ref,
      s"\nlocal $local\nwant  $ref")
    assert(dist == local, s"\ndist  $dist\nlocal $local")
    assert(local.map(_.rank) == (0 until 12))
  }

  test("vocabulary replay: symbol frequencies conserve total symbol mass") {
    val docs = Seq((1L, "aa aa ab")).toDF("id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 2)
    val vocab = Bpe.vocabulary(docs, "text", merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Whatever merge path is taken, every word's symbol multiset must
    // concatenate back to word + </w>: character mass (marker stripped —
    // merged symbols may have absorbed it) and marker mass both conserve.
    val charMass = vocab
      .map { case (s, f) => s.replace(Bpe.EndOfWord, "").length * f }.sum
    assert(charMass == 2 * 2 + 2 * 1, vocab) // "aa"×2 + "ab"×1 characters
    val markerMass = vocab.map { case (s, f) =>
      Bpe.EndOfWord.r.findAllIn(s).size * f
    }.sum
    assert(markerMass == 3, vocab) // one </w> per word occurrence
  }
}
