package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HNSW — Hierarchical Navigable Small World graphs (Malkov & Yashunin
  * 2016), the graph tier of the ANN family next to the quantizers
  * (IVF/PQ/OPQ/SQ8): a multi-layer proximity graph searched by greedy
  * descent, the structure behind most single-node vector-serving
  * engines. This implementation is DETERMINISTIC by construction so
  * the battery can gate it:
  *
  *  - node levels come from xxhash64(id, seed) mapped to (0,1) and the
  *    paper's floor(−ln(u)·mL) with mL = 1/ln(M) — a pure function of
  *    the id, never of iteration order or thread count;
  *  - nodes insert in ascending-id order (the corpus is collected and
  *    sorted once), candidate heaps break distance ties by node id;
  *  - neighbor selection is the paper's simple closest-M (Algorithm 3;
  *    the §4 heuristic matters on hard clustered corpora — documented
  *    trade-off, not an oversight).
  *
  * Execution shape: build and search are DRIVER/SERVING-side over one
  * bounded shard — the LocalAnn contract (FAISS/HNSWlib serving model:
  * one graph per node, fleet routing above; [[graft.serve.LocalAnn
  * .searchSharded]]'s fan-out/merge applies unchanged because
  * [[search]] returns the same (sim desc, id asc)-ordered exact-cosine
  * hits as every other family). Distributed corpora reach it through
  * per-shard builds, exactly like the sharded PQ deployment (q168).
  *
  * Distances: the graph is built and searched on cosine DISSIMILARITY
  * (1 − cos); emitted sims are exact cosine rounded 1e-6 — the
  * codebase's canonical ranking semantic, so hits merge bit-compatibly
  * with every other family's results.
  */
object Hnsw {

  /** A built graph. `links(node)(level)` = neighbor node indices
    * (indices into ids/vecs, which are ascending-id-sorted). */
  final case class Graph(ids: Array[Long], vecs: Array[Array[Float]],
                         levels: Array[Int], links: Array[Array[Array[Int]]],
                         entry: Int, maxLevel: Int, m: Int, efC: Int,
                         seed: Long) {
    def size: Int = ids.length
  }

  private def dist(a: Array[Float], b: Array[Float]): Double = {
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val denom = math.sqrt(daa) * math.sqrt(dbb)
    if (denom > 0) 1.0 - dab / denom else 2.0 // zero-norm rows sort last
  }

  /** Deterministic level draw: xxhash64(id, seed) → u ∈ (0,1) →
    * floor(−ln(u) · 1/ln(M)). */
  private def levelOf(id: Long, seed: Long, mL: Double): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(id, seed)
    // map to (0,1): use the top 53 bits as a double mantissa; guard 0
    val u = ((h >>> 11).toDouble + 1.0) / (1L << 53).toDouble
    math.floor(-math.log(u) * mL).toInt
  }

  /** Greedy beam search at one level: returns up to `ef` (dist, node)
    * pairs, ascending dist, ties by node id (deterministic). */
  private def searchLayer(g: Graph, q: Array[Float], entry: Seq[(Double, Int)],
                          ef: Int, level: Int): Seq[(Double, Int)] = {
    val ord = Ordering.Tuple2[Double, Int]
    val visited = collection.mutable.HashSet[Int](entry.map(_._2): _*)
    val candidates = collection.mutable.TreeSet[(Double, Int)](entry: _*)(ord)
    val best = collection.mutable.TreeSet[(Double, Int)](entry: _*)(ord)
    while (candidates.nonEmpty) {
      val c = candidates.head
      candidates.remove(c)
      if (best.size >= ef && c._1 > best.last._1) {
        candidates.clear() // every remaining candidate is farther
      } else {
        val ls = g.links(c._2)
        val nbrs = if (level < ls.length) ls(level) else Array.empty[Int]
        var i = 0
        while (i < nbrs.length) {
          val n = nbrs(i)
          if (visited.add(n)) {
            val d = dist(q, g.vecs(n))
            if (best.size < ef || d < best.last._1 ||
                (d == best.last._1 && n < best.last._2)) {
              candidates.add((d, n))
              best.add((d, n))
              if (best.size > ef) best.remove(best.last)
            }
          }
          i += 1
        }
      }
    }
    best.toSeq
  }

  /** Build from a bounded, collected corpus — (id, vec) pairs. The
    * caller owns the shard-size contract (one serving node's worth,
    * the LocalAnn doctrine). */
  def build(rows: Seq[(Long, Array[Float])], m: Int = 16,
            efConstruction: Int = 100, seed: Long = 42L): Graph = {
    require(rows.nonEmpty, "empty corpus")
    val sorted = rows.sortBy(_._1).toArray
    val n = sorted.length
    val ids = sorted.map(_._1)
    val vecs = sorted.map(_._2)
    val mL = 1.0 / math.log(m.toDouble)
    val levels = Array.tabulate(n)(i => levelOf(ids(i), seed, mL))
    val links = Array.tabulate(n)(i =>
      Array.fill(levels(i) + 1)(Array.empty[Int]))
    val maxM0 = 2 * m
    var entry = 0
    var maxLevel = levels(0)
    val g = Graph(ids, vecs, levels, links, entry, maxLevel, m, efConstruction, seed)

    def maxAt(level: Int) = if (level == 0) maxM0 else m

    var i = 1
    while (i < n) {
      val q = vecs(i)
      val l = levels(i)
      // 1. greedy descent on levels above l (ef = 1)
      var ep: Seq[(Double, Int)] = Seq((dist(q, vecs(entry)), entry))
      var lc = maxLevel
      while (lc > l) {
        ep = Seq(searchLayer(g, q, ep, 1, lc).head)
        lc -= 1
      }
      // 2. insert at levels min(l, maxLevel) .. 0
      lc = math.min(l, maxLevel)
      while (lc >= 0) {
        val cand = searchLayer(g, q, ep, efConstruction, lc)
        val selected = cand.take(maxAt(lc)).map(_._2)
        links(i)(lc) = selected.toArray
        // bidirectional: add i to each neighbor, pruning to the cap by
        // (dist, id) — the same deterministic order as selection
        selected.foreach { nb =>
          val cur = links(nb)(lc)
          val merged = (cur :+ i).distinct
          links(nb)(lc) =
            if (merged.length <= maxAt(lc)) merged
            else merged.map(x => (dist(vecs(nb), vecs(x)), x))
              .sortBy(identity).take(maxAt(lc)).map(_._2).toArray
        }
        ep = cand
        lc -= 1
      }
      if (l > maxLevel) { maxLevel = l; entry = i }
      i += 1
    }
    Graph(ids, vecs, levels, links, entry, maxLevel, m, efConstruction, seed)
  }

  /** Collect a DataFrame corpus and build (the bounded-shard form). */
  def fromDataFrame(df: DataFrame, id: String, vec: String, m: Int = 16,
                    efConstruction: Int = 100, seed: Long = 42L): Graph =
    build(df.select(col(id).cast("long"), col(vec)).collect().map(r =>
      r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray).toSeq,
      m, efConstruction, seed)

  /** Search: greedy descent to level 0, beam `efSearch`, emit topK as
    * (neighbor id, exact cosine rounded 1e-6) with the canonical
    * (sim desc, id asc) order — merge-compatible with every family. */
  def search(g: Graph, query: Array[Float], efSearch: Int, topK: Int,
             dropId: Option[Long] = None): Seq[(Long, Double)] = {
    require(query.forall(x => !x.isNaN && !x.isInfinite), "query must be finite")
    var ep: Seq[(Double, Int)] = Seq((dist(query, g.vecs(g.entry)), g.entry))
    var lc = g.maxLevel
    while (lc > 0) {
      ep = Seq(searchLayer(g, query, ep, 1, lc).head)
      lc -= 1
    }
    val ef = math.max(efSearch, topK + (if (dropId.isDefined) 1 else 0))
    searchLayer(g, query, ep, ef, 0)
      .filterNot(t => dropId.contains(g.ids(t._2)))
      .map { case (_, node) =>
        val c = 1.0 - dist(query, g.vecs(node))
        (g.ids(node), java.math.BigDecimal.valueOf(c * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6)
      }
      .sortBy { case (id, sim) => (-sim, id) }
      .take(topK)
  }

  /** Persist: one parquet row per node (id, level, per-level links as
    * neighbor IDS — stable across reload re-sorts) + vecs + meta. */
  def save(spark: SparkSession, g: Graph, path: String): Unit = {
    import spark.implicits._
    g.ids.indices.map { i =>
      (g.ids(i), g.vecs(i).toSeq, g.levels(i),
        g.links(i).map(_.map(g.ids(_)).toSeq).toSeq)
    }.toDF("id", "vec", "level", "links")
      .repartition(1).write.mode("overwrite").parquet(s"$path/hnsw_nodes")
    Seq((g.m, g.efC, g.seed, g.ids(g.entry), g.maxLevel))
      .toDF("m", "ef_construction", "seed", "entry_id", "max_level")
      .repartition(1).write.mode("overwrite").parquet(s"$path/hnsw_meta")
  }

  /** Load a graph saved by [[save]]; bit-identical search behavior. */
  def load(spark: SparkSession, path: String): Graph = {
    val meta = spark.read.parquet(s"$path/hnsw_meta")
      .select("m", "ef_construction", "seed", "entry_id", "max_level").head()
    val rows = spark.read.parquet(s"$path/hnsw_nodes")
      .select("id", "vec", "level", "links").collect()
      .sortBy(_.getLong(0))
    val ids = rows.map(_.getLong(0))
    val ix = ids.zipWithIndex.toMap
    val vecs = rows.map(_.getAs[scala.collection.Seq[Float]](1).toArray)
    val levels = rows.map(_.getInt(2))
    val links = rows.map(_.getAs[scala.collection.Seq[scala.collection.Seq[Long]]](3)
      .map(_.map(ix(_)).toArray).toArray)
    Graph(ids, vecs, levels, links, ix(meta.getLong(3)), meta.getInt(4),
      meta.getInt(0), meta.getInt(1), meta.getLong(2))
  }
}
