package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.NativeVector

/** Binary quantization — the cheapest memory tier of the ANN family
  * (FAISS `IndexBinaryFlat` shape; round-20 verdict stretch #8): each
  * vector compresses to an `nBits`-bit sign signature under fixed
  * random hyperplanes (the SRP machinery `Embeddings.srpBucket`
  * introduced for LSH candidate generation, here packed into long
  * words and SCANNED by Hamming distance instead of bucketed). At 256
  * bits a 64-d float vector is 32 B instead of 256 B — 8× under raw
  * floats, 2× under SQ8 — and the scan arithmetic is XOR+popcount on
  * 4 longs: integer ops with no float-accumulation order sensitivity,
  * so every stage is exactly replayable cross-engine.
  *
  * Grounding: sign-random-projection preserves angle — P[bit differs]
  * = θ/π (Goemans–Williamson / Charikar 2002), so Hamming distance is
  * a ~binomial(nBits, θ/π) estimator of the angle and ranking by it
  * approximates ranking by cosine; 256 bits puts the estimator's σ at
  * ~π/32, enough to shortlist well (the q188 gate floors it; the
  * FrontierProbe row prices it against the other families).
  *
  * Deployment contract = the [[Sq.searchReranked]] mold: Hamming-scan
  * shortlist (ham asc, id asc — deterministic integer ties), exact
  * cosine re-rank on true vectors; an EXHAUSTIVE shortlist reproduces
  * [[Embeddings.cosineTopK]] bit-for-bit (the q188 exactness lever).
  * Scale shape: the scan touches ONLY the packed words (32 B/vector);
  * float vectors stay cold until the rerank reads the shortlist rows.
  * The quantizer itself is DATA-INDEPENDENT (planes are a pure
  * function of the seed) — nothing trains, nothing drifts, an append
  * is just an encode of the delta (FAISS's binary-flat add()).
  */
object Bq {

  /** Fixed random hyperplanes: planes(b)(d) ∈ [-0.5, 0.5), drawn in
    * (bit, dim) order from one seeded generator — the
    * `Embeddings.planes` convention, so signatures are a pure function
    * of (seed, nBits, dim) and any two engines agree bit for bit. */
  final case class Quantizer(planes: Array[Array[Double]], seed: Long) {
    def nBits: Int = planes.length
    def dim: Int = planes(0).length
    def nWords: Int = nBits / 64
  }

  /** Data-independent "training": draw the planes. `nBits` must pack
    * whole 64-bit words (the FAISS binary convention is multiples of
    * 8; words keep the scan to `bit_count(xor)` on longs). */
  def train(dim: Int, nBits: Int = 256, seed: Long = 42L): Quantizer = {
    require(nBits > 0 && nBits % 64 == 0,
      s"nBits must be a positive multiple of 64 (word packing), got $nBits")
    val rnd = new scala.util.Random(seed)
    Quantizer(Array.fill(nBits)(Array.fill(dim)(rnd.nextDouble() - 0.5)), seed)
  }

  /** The packed-signature expression for one 64-bit word: bit i of
    * word w is sign(dot(v, plane(w·64+i))) — [[NativeVector.dot]]'s
    * in-order double accumulation, strictly-positive convention
    * (`Embeddings.srpBucket` verbatim), summed into the word. */
  private def wordCol(v: Column, q: Quantizer, w: Int): Column =
    (0 until 64).map { i =>
      val p = q.planes(w * 64 + i)
      val proj = NativeVector.dot(v, array(p.map(lit): _*))
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Append `bq_codes` (array<long>, nWords packed words). Rows of the
    * wrong width park as null codes (never ranked — the [[Pq.encode]]
    * convention). Map-side only: at 100 TB this is one codegen'd scan,
    * no shuffle. */
  def encode(df: DataFrame, vec: String, q: Quantizer): DataFrame = {
    NativeVector.register(df.sparkSession)
    val v = col(vec)
    df.withColumn("bq_codes",
      when(size(v) === q.dim,
        array((0 until q.nWords).map(wordCol(v, q, _)): _*)))
  }

  /** Hamming distance between two packed signatures:
    * Σ_w popcount(a_w XOR b_w) — all codegen'd builtins. */
  def hammingCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, x) => acc + x.cast("int"))

  /** Hamming-scan shortlist + EXACT re-rank (the [[Sq.searchReranked]]
    * deployment contract on binary codes): queries encode map-side
    * under the SAME planes, the scan ranks a `shortlist` per query by
    * (hamming asc, id asc) — integer ties, fully deterministic — and
    * exact cosine re-scores only those, keeping `topK` with the
    * canonical (sim desc, id asc) ranking. An exhaustive shortlist
    * reproduces [[Embeddings.cosineTopK]] bit-for-bit. The shortlist
    * rides [[BoundedTopK]] (negated distance — the aggregate keeps
    * maxima), so only k-bounded buffers cross the shuffle. */
  def searchReranked(encoded: DataFrame, id: String, vec: String,
                     q: Quantizer, queries: DataFrame,
                     qid: String, qvec: String, shortlist: Int, topK: Int,
                     dropSelf: Boolean = false): DataFrame = {
    NativeVector.register(encoded.sparkSession)
    val corpus = encoded
      .select(col(id).as("neighbor_id"), col("bq_codes"))
      .filter(col("bq_codes").isNotNull)
    val qv = broadcast(
      encode(queries.select(col(qid).cast("long").as("query_id"),
        col(qvec).as("__qv")), "__qv", q)
        .select(col("query_id"), col("bq_codes").as("__qcodes"))
        .filter(col("__qcodes").isNotNull))
    val paired = corpus.crossJoin(qv)
    val scoredAll =
      if (dropSelf) paired.filter(col("neighbor_id") =!= col("query_id"))
      else paired
    // negate: BoundedTopK keeps maxima; (-ham desc, id asc) == (ham asc, id asc)
    val scored = scoredAll.withColumn("__approx",
      -hammingCol(col("__qcodes"), col("bq_codes")).cast("double"))
    val cands = BoundedTopK.shortlist(scored, "query_id", "__approx",
      "neighbor_id", shortlist)
    Pq.rerank(cands, encoded, id, vec, queries, qid, qvec, topK)
  }

  /** Persist the planes (`bq_meta`: one row per bit, plane as
    * array<double> — doubles round-trip parquet bit-exactly). Codes
    * ride the [[Pq.saveCodes]] convention like every other family. */
  def save(spark: SparkSession, q: Quantizer, path: String): Unit = {
    import spark.implicits._
    q.planes.indices.map(b => (b, q.planes(b).toSeq, q.seed))
      .toDF("bit", "plane", "seed")
      .repartition(1).write.mode("overwrite").parquet(s"$path/bq_meta")
  }

  /** Load planes written by [[save]]; bit-identical encode/search. */
  def load(spark: SparkSession, path: String): Quantizer = {
    val rows = spark.read.parquet(s"$path/bq_meta")
      .select("bit", "plane", "seed").collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, s"no bq_meta table at $path")
    Quantizer(
      rows.map(_.getAs[scala.collection.Seq[Double]](1).toArray),
      rows.head.getLong(2))
  }
}
