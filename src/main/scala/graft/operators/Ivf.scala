package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NativeVector

/** IVF (inverted-file) approximate nearest neighbor search — the
  * clustered scale path for embedding similarity (SURVEY.md §7), next to
  * the SRP-LSH variant in Embeddings.
  *
  * Build: spherical k-means into nLists coarse cells, store assignments.
  * The coarse quantizer is trained DRIVER-SIDE on a bounded sample (the
  * standard IVF practice — centroid quality converges after a few hundred
  * points per cell, so training cost is independent of corpus size), then
  * every vector is assigned MAP-SIDE by an argmax-of-dots expression
  * against the broadcast centroid literal: zero shuffles and zero
  * iterative jobs touch the full corpus. Because centroids are unit
  * vectors, argmax dot(raw, c) == argmax cosine — no per-row
  * normalization is ever materialized (a per-element normalize lambda
  * re-evaluates the norm aggregate per element: O(dim²) interpreted —
  * measured 10× the entire search cost).
  * Search: score queries against the (tiny, broadcast) centroid table,
  * probe the nProbe nearest lists, exact-cosine only the candidates — at
  * 1B vectors with nLists≈√n and nProbe≪nLists the scan touches
  * ~nProbe/nLists of the corpus instead of all of it, and the candidate
  * join shuffles on centroid_id.
  */
object Ivf {

  final case class Index(centroids: DataFrame, assigned: DataFrame,
                         idCol: String, vecCol: String)

  /** Rows excluded from the index because their embedding contains a
    * non-finite component (assigned `centroid_id = -1` by `build`; no
    * probe ever joins them, so they are unsearchable BY CONTRACT).
    * Callers that must not lose rows should check this is empty. */
  def invalid(index: Index): DataFrame =
    index.assigned.filter(col("centroid_id") === -1)

  /** MULTIPLE ASSIGNMENT (Jégou, Douze, Schmid 2011 §V — the standard
    * IVF cell-recall lever): each vector is indexed under its top-r
    * nearest cells instead of only the argmax cell. At a FIXED nProbe
    * this raises the probability that a probed cell holds the true
    * neighbor — the PqProbe decomposition showed q118's recall was
    * ceilinged by cell recall (0.79 at nProbe=8/16 on the uniform
    * corpus, identical at shortlist 50/200 and m 8/16), so more code
    * fidelity could not help; wider membership can. Cost: r× code
    * storage and r× scanned rows per probed cell (codes are bytes —
    * 2×16 B/vector is still 16× under one float vector), and the
    * shortlist must dedup (query, neighbor) pairs before re-rank.
    *
    * Same map-side shape as build's assignment: per-row dots against
    * the broadcast centroid literal, sorted by (sim desc, cid asc) via
    * an array_sort comparator, top-r exploded. Non-finite vectors park
    * in cell −1 exactly once (never duplicated, never probed). */
  def assignedTopR(index: Index, r: Int): DataFrame = {
    val spark = index.assigned.sparkSession
    NativeVector.register(spark)
    val cents: Seq[(Int, Seq[Float])] = index.centroids.collect()
      .map(row => row.getInt(0) -> row.getAs[scala.collection.Seq[Float]](1).toSeq.toSeq)
      .toSeq.sortBy(_._1)
    val centLit = typedLit(cents).cast("array<struct<cid:int,v:array<float>>>")
    val vec = col(index.vecCol)
    val scored = transform(centLit, c => struct(
      NativeVector.dot(vec, c.getField("v")).as("s"),
      c.getField("cid").as("cid")))
    val sorted = array_sort(scored, (l, rr) =>
      when(l.getField("s") > rr.getField("s"), -1)
        .when(l.getField("s") < rr.getField("s"), 1)
        .otherwise(when(l.getField("cid") < rr.getField("cid"), -1)
          .when(l.getField("cid") > rr.getField("cid"), 1).otherwise(0)))
    val base = index.assigned.select(col(index.idCol), vec)
    base
      .withColumn("__top", when(allFinite(vec), slice(sorted, 1, r))
        .otherwise(array(struct(lit(Double.NaN).as("s"), lit(-1).as("cid")))))
      .select(col(index.idCol), vec, explode(col("__top")).as("__a"))
      .withColumn("centroid_id", col("__a.cid"))
      .drop("__a")
  }

  /** True iff every component is finite (no NaN/±Inf). A NaN would make
    * every centroid dot NaN and the argmax undefined — such rows are
    * parked in list −1 and surfaced via `invalid`, never silently lost. */
  private def allFinite(vec: Column): Column =
    !exists(vec, x =>
      isnan(x.cast("double")) || abs(x.cast("double")) === lit(Double.PositiveInfinity))

  /** Build the index: nLists spherical-k-means centroids + per-vector
    * list assignment. The training sample is the `maxTrainRows` smallest
    * id-hashes — a deterministic pseudo-random subset gathered with one
    * TakeOrdered pass (never a full sort), so centroids are stable across
    * partitioning, core count, and reruns. */
  def build(df: DataFrame, id: String, vec: String, nLists: Int,
            seed: Long = 42L, maxIter: Int = 8,
            maxTrainRows: Int = 16384): Index =
    assemble(df, id, vec, trainCentroids(df, id, vec, nLists, seed, maxIter, maxTrainRows))

  /** The DISTRIBUTED training branch (round-12 verdict #5: the
    * dual-branch discipline, extended to the coarse quantizer): seed
    * exactly like [[build]] (bounded-sample local spherical k-means),
    * then refine with `refineIters` Lloyd rounds over the FULL corpus
    * via [[Kmeans.refine]] — exact fixed-point reductions, so the
    * refined centroids are bit-identical at any partitioning or core
    * count. Use when the bounded sample under-represents the corpus
    * (heavy cluster imbalance, > ~10⁸ rows per cell); the default
    * bounded-sample build stays the right call for most corpora (a few
    * hundred points per cell converge the seeds). Cost: refineIters
    * full scans of the (persisted) vector column. */
  def buildDistributed(df: DataFrame, id: String, vec: String, nLists: Int,
                       seed: Long = 42L, maxIter: Int = 8,
                       maxTrainRows: Int = 16384,
                       refineIters: Int = 4): Index = {
    val seeds = trainCentroids(df, id, vec, nLists, seed, maxIter, maxTrainRows)
    val refined = Kmeans.refine(df, vec, Array(seeds), refineIters,
      spherical = true).head
    assemble(df, id, vec, refined)
  }

  /** Incremental index maintenance (FAISS `add()` semantics, the
    * operation a production deployment runs per arriving shard): assign
    * a DELTA batch to the EXISTING centroids and union it into the
    * index — the coarse quantizer is FROZEN; only periodic rebuilds
    * retrain. The delta goes through the same map-side assignment
    * expression as [[build]], so `append(build(A), B).assigned` is
    * bit-identical to assembling A∪B over A's centers (IvfSpec), and
    * pre-existing rows are untouched bytes — a search whose true
    * neighbors predate the delta returns exactly what it returned
    * before the append. At 100 TB this is the difference between a
    * daily full-corpus rebuild and a map-only pass over the new shard.
    * Composes with [[save]]/[[load]]: load → append → save is the
    * steady-state index-refresh job. */
  def append(index: Index, delta: DataFrame): Index =
    index.copy(assigned = index.assigned.unionByName(assignDelta(index, delta)))

  /** The map-only pass behind [[append]] and [[appendShard]]: assign a
    * delta batch to the index's FROZEN centroids (nLists rows collected
    * — KiB) and return just the delta's assigned rows. */
  private def assignDelta(index: Index, delta: DataFrame): DataFrame = {
    val centers: Array[Array[Float]] = index.centroids
      .orderBy("centroid_id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("cvec").toArray)
    assemble(delta, index.idCol, index.vecCol, centers).assigned
  }

  /** Incremental refresh of a SAVED index (round-14 verdict #5's
    * streaming composition): assign `delta` to the artifact's frozen
    * centroids and write the assigned rows as a BATCH-KEYED shard
    * (`$path/ivf_shards/batch=<batchId>`) — centroids, meta, and the
    * base `ivf_assigned` table are untouched; nothing corpus-sized is
    * rewritten, and [[load]] sees base ∪ all shards. This is the
    * per-micro-batch form of load→append→save: a foreachBatch sink
    * calls it once per arriving batch with Structured Streaming's
    * batchId, and the artifact is always searchable.
    *
    * EXACTLY-ONCE under replay (round-15 verdict #2 — previously the
    * caller's contract, now the engine's): Structured Streaming replays
    * a failed micro-batch with the SAME batchId, and the shard write is
    * an idempotent per-directory overwrite — the replay replaces its
    * own shard byte-for-byte instead of appending duplicate index rows
    * (IvfSpec pins load-equality after a double call). */
  def appendShard(spark: org.apache.spark.sql.SparkSession, path: String,
                  delta: DataFrame, batchId: Long): Unit =
    assignDelta(load(spark, path), delta)
      .write.mode("overwrite").parquet(s"$path/ivf_shards/batch=$batchId")

  /** Shared seed training: bounded deterministic sample → local
    * spherical k-means (one definition for both branches). */
  private def trainCentroids(df: DataFrame, id: String, vec: String,
                             nLists: Int, seed: Long, maxIter: Int,
                             maxTrainRows: Int): Array[Array[Float]] = {
    NativeVector.register(df.sparkSession)
    val sample: Array[Array[Float]] = Samples.hashTopN(
        df.filter(allFinite(col(vec))), // a NaN point would poison k-means
        id, Seq(col(vec)), maxTrainRows)
      .collect()
      .map { r =>
        val v = r.getAs[scala.collection.Seq[Float]](0).toArray
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
        val n = math.sqrt(s)
        if (n > 0) { i = 0; while (i < v.length) { v(i) = (v(i) / n).toFloat; i += 1 } }
        v
      }
    localSphericalKMeans(sample, nLists, maxIter, seed)
  }

  /** Shared index assembly from trained centroids (one definition for
    * both branches — the assignment expression is the operator's
    * contract, training only decides the centers). */
  private def assemble(df: DataFrame, id: String, vec: String,
                       centers: Array[Array[Float]]): Index = {
    val spark = df.sparkSession
    NativeVector.register(spark)
    // map-side assignment on RAW vectors: centroids are unit, ‖v‖ is a
    // positive per-row constant, so argmax dot == argmax cosine.
    // array_position takes the first maximum — ties break
    // deterministically toward the lower centroid_id.
    val centLit = typedLit(centers.map(_.toSeq).toSeq)
    val sims = transform(centLit, c => NativeVector.dot(col(vec), c))
    val assigned = df
      .select(col(id), col(vec))
      .withColumn("centroid_id",
        when(allFinite(col(vec)),
          (array_position(sims, array_max(sims)) - 1).cast("int"))
          .otherwise(lit(-1))) // non-finite: parked, surfaced via invalid()

    import spark.implicits._
    val centroids = centers.zipWithIndex
      .map { case (c, i) => (i, c) }
      .toSeq.toDF("centroid_id", "cvec")
    Index(centroids, assigned, id, vec)
  }

  /** Spherical k-means (assign by max dot, update = renormalized mean) on
    * driver-local points: k-means++ seeding, Lloyd until convergence or
    * maxIter. Points are unit vectors; centroids stay unit so the Spark
    * assignment expression and the probe ranking use the same geometry.
    * Cost is O(maxTrainRows · k · dim · iters) — milliseconds at any
    * corpus scale because the sample is bounded. */
  private[operators] def localSphericalKMeans(
      points: Array[Array[Float]], k: Int, maxIter: Int,
      seed: Long): Array[Array[Float]] = {
    require(points.nonEmpty, "empty training sample")
    val rnd = new scala.util.Random(seed)
    val n = points.length
    val dim = points(0).length
    val kk = math.min(k, n)

    def sqDist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }

    // k-means++ seeding
    val centers = Array.ofDim[Array[Float]](kk)
    centers(0) = points(rnd.nextInt(n)).clone()
    val minD2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var i = 0; var total = 0.0
      while (i < n) {
        val d2 = sqDist(points(i), centers(c - 1))
        if (d2 < minD2(i)) minD2(i) = d2
        total += minD2(i); i += 1
      }
      var r = rnd.nextDouble() * total
      var j = 0
      while (j < n - 1 && r > minD2(j)) { r -= minD2(j); j += 1 }
      centers(c) = points(j).clone()
      c += 1
    }

    val assign = Array.fill(n)(-1)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      converged = true
      var i = 0
      while (i < n) {
        var best = 0; var bestDot = Double.NegativeInfinity
        var cc = 0
        while (cc < kk) {
          var s = 0.0; var d = 0
          while (d < dim) { s += points(i)(d).toDouble * centers(cc)(d); d += 1 }
          if (s > bestDot) { bestDot = s; best = cc }
          cc += 1
        }
        if (assign(i) != best) { converged = false; assign(i) = best }
        i += 1
      }
      val sums = Array.fill(kk, dim)(0.0)
      val counts = new Array[Int](kk)
      i = 0
      while (i < n) {
        val a = assign(i); counts(a) += 1
        var d = 0
        while (d < dim) { sums(a)(d) += points(i)(d); d += 1 }
        i += 1
      }
      var cc = 0
      while (cc < kk) {
        if (counts(cc) > 0) {
          var norm = 0.0; var d = 0
          while (d < dim) { val v = sums(cc)(d); norm += v * v; d += 1 }
          norm = math.sqrt(norm)
          if (norm > 0) {
            d = 0
            while (d < dim) { centers(cc)(d) = (sums(cc)(d) / norm).toFloat; d += 1 }
          }
        } // empty cell keeps its previous (unit) centroid
        cc += 1
      }
      iter += 1
    }
    centers
  }

  // ---- persistence (round-13 verdict #5: every model family had
  // registry save/load — LeafBoost, BiLstm, PipelineModel — while the
  // ANN artifacts a 100 TB deployment must persist were rebuilt per
  // job). Format: plain parquet, the LeafBoost.save doctrine — floats
  // round-trip bit-exactly, the artifact is itself queryable, no
  // serialization library enters the build.
  //   $path/ivf_centroids : (centroid_id, cvec) — nLists rows
  //   $path/ivf_assigned  : the full assigned corpus (id, vec,
  //                         centroid_id) — corpus-sized by design
  //                         (FAISS persists the inverted lists; the
  //                         re-assignment scan is exactly what save
  //                         amortizes), written at input parallelism
  //   $path/ivf_meta      : one row (idCol, vecCol)
  // Reload bit-equality (same search results to the bit) is asserted
  // by IvfSpec.

  /** Persist the index under `path` (overwrites). Any `ivf_shards`
    * residue from a previous incarnation of `path` is cleared FIRST —
    * save writes the full assigned frame into `ivf_assigned`, and a
    * stale shard surviving beside it would double its rows on load.
    * (As with any save-over-the-source, write to a fresh path when the
    * index being saved was loaded from `path` itself.) */
  def save(index: Index, path: String): Unit = {
    val spark = index.centroids.sparkSession
    val shards = new org.apache.hadoop.fs.Path(s"$path/ivf_shards")
    shards.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(shards, true)
    index.centroids.repartition(1).write.mode("overwrite")
      .parquet(s"$path/ivf_centroids")
    index.assigned.write.mode("overwrite").parquet(s"$path/ivf_assigned")
    import spark.implicits._
    Seq((index.idCol, index.vecCol)).toDF("idCol", "vecCol")
      .repartition(1).write.mode("overwrite").parquet(s"$path/ivf_meta")
  }

  /** Load an index previously written by [[save]] (plus any shards
    * [[appendShard]] added since); searches over the reloaded index are
    * bit-identical to the fresh build's. Shard rows union in behind the
    * base table with their `batch` partition key dropped — the index
    * schema is identical whether or not refreshes ever ran. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val meta = spark.read.parquet(s"$path/ivf_meta")
      .select("idCol", "vecCol").head()
    val base = spark.read.parquet(s"$path/ivf_assigned")
    val shardsDir = new org.apache.hadoop.fs.Path(s"$path/ivf_shards")
    val fs = shardsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // union only COMMITTED batch=* shard directories (round-16 advice):
    // a killed appendShard leaves a _temporary dir under ivf_shards,
    // and gating on a bare nonEmpty listing would hand that residue to
    // the parquet reader — schema inference fails and the whole
    // artifact is unloadable until the batch replays. Crash residue is
    // ignored; the replayed batch overwrites its own batch=<id> dir.
    val shardPaths =
      if (fs.exists(shardsDir))
        fs.listStatus(shardsDir).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
          .map(_.getPath.toString)
      else Seq.empty
    val assigned =
      if (shardPaths.nonEmpty)
        base.unionByName(
          spark.read
            .option("basePath", s"$path/ivf_shards")
            .parquet(shardPaths: _*)
            .drop("batch"))
      else base
    Index(
      spark.read.parquet(s"$path/ivf_centroids").select("centroid_id", "cvec"),
      assigned,
      meta.getString(0), meta.getString(1))
  }

  /** DRIVER-LOCAL twin of [[load]] for serving nodes (round-20
    * optimization): the same files with the same union-of-committed-
    * shards semantics, read without Spark jobs — `LocalAnn.load`
    * collected the loaded DataFrames to driver arrays anyway, paying
    * plan+schedule orchestration per tiny table. Returns
    * (idCol, vecCol, centroid rows, assigned rows, assigned schema). */
  def loadLocal(spark: org.apache.spark.sql.SparkSession, path: String):
      (String, String, Array[org.apache.spark.sql.Row],
        Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType) = {
    val meta = graft.sources.DriverParquet.headRow(spark,
      s"$path/ivf_meta", Seq("idCol", "vecCol"))
    val shardsDir = new org.apache.hadoop.fs.Path(s"$path/ivf_shards")
    val fs = shardsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // union only COMMITTED batch=* shard directories — [[load]]'s
    // crash-residue contract verbatim
    val shardPaths =
      if (fs.exists(shardsDir))
        fs.listStatus(shardsDir).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
          .sortBy(_.getPath.getName)
          .map(_.getPath.toString)
      else Seq.empty
    val assigned = graft.sources.DriverParquet
      .readRows(spark, s"$path/ivf_assigned") ++
      shardPaths.flatMap(graft.sources.DriverParquet.readRows(spark, _))
    (meta.getString(0), meta.getString(1),
      graft.sources.DriverParquet.readRows(spark, s"$path/ivf_centroids",
        Seq("centroid_id", "cvec")),
      assigned,
      graft.sources.DriverParquet.schemaOf(spark, s"$path/ivf_assigned"))
  }

  /** Probe the nProbe nearest lists per query (broadcast centroid
    * scoring), then exact cosine top-k inside the probed lists only.
    * Probe ranking uses raw dots — ‖q‖ is constant within a query
    * partition, so the ordering equals the cosine ordering. */
  /** HNSW graph over the coarse centroids (round 19 — FAISS's
    * IVF_HNSW shape: at nlist ~10⁵–10⁶ the per-row argmax scan over
    * EVERY centroid becomes the assignment/probe bottleneck, and the
    * standard answer is a graph over the CENTROIDS searched per
    * vector). Centroid ids become node ids; centroids are unit
    * vectors, so the graph's cosine geometry and [[assemble]]'s
    * dot-argmax rank cells identically up to rounding — which is why
    * [[assignGraph]] re-scores proposals exactly. */
  def centroidGraph(index: Index, m: Int = 16,
                    efConstruction: Int = 100): Hnsw.Graph =
    Hnsw.build(
      index.centroids.orderBy("centroid_id").collect()
        .map(r => r.getInt(0).toLong ->
          r.getAs[scala.collection.Seq[Float]]("cvec").toArray).toSeq,
      m, efConstruction)

  /** Graph-assisted assignment — the IVF_HNSW composition's build
    * side. The centroid graph's beam PROPOSES `cand` cells per row and
    * an EXACT in-order-double dot argmax — ties toward the lower
    * centroid_id, [[assemble]]'s array_position semantics, the same
    * accumulation NativeVector.dot generates — DECIDES among them: the
    * shortlist-then-exact-rerank doctrine applied to the quantizer
    * itself (the beam's 1e-6-rounded cosine may merge near-tied cells;
    * the exact re-score keeps the decision bit-faithful). With
    * `efSearch ≥ nLists` over a connected graph the beam visits every
    * cell, so assignment reproduces assemble()'s argmax BIT-FOR-BIT
    * (the exactness lever — q184 derives the flag); a tight ef is the
    * scale path: O(ef·log nlist) proposals per row instead of the
    * O(nlist) scan, distributed as mapPartitions over the broadcast
    * graph (centroids are KiB–MiB at any real nlist). Non-finite rows
    * park in cell −1, exactly like assemble(). */
  def assignGraph(df: DataFrame, id: String, vec: String, g: Hnsw.Graph,
                  efSearch: Int, cand: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the output schema narrows node ids to Int centroid_ids (the index
    // schema) — safe for centroidGraph-built graphs by construction, but
    // the public API accepts any Hnsw.Graph, where an id above
    // Int.MaxValue would silently wrap (round-19 advice)
    require(g.ids.forall(_.isValidInt),
      "assignGraph needs a centroid graph: every node id must be a " +
        "valid Int centroid_id (build it with Ivf.centroidGraph)")
    val bg = spark.sparkContext.broadcast(g)
    df.select(col(id).cast("long"), col(vec).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val graph = bg.value
        val ix = graph.ids.zipWithIndex.toMap
        it.map { case (rid, v) =>
          val finite = v != null &&
            v.forall(x => !x.isNaN && !x.isInfinite)
          if (!finite) (rid, v, -1)
          else {
            val proposed = Hnsw.search(graph, v, efSearch, cand)
              .map(_._1).sorted // ascending cid: first strict max wins ties
            var best = -1; var bestDot = Double.NegativeInfinity
            proposed.foreach { cid =>
              val c = graph.vecs(ix(cid))
              var s = 0.0; var i = 0
              while (i < v.length) {
                s += v(i).toDouble * c(i).toDouble; i += 1
              }
              if (s > bestDot) { bestDot = s; best = cid.toInt }
            }
            (rid, v, best)
          }
        }
      }
      .toDF(id, vec, "centroid_id")
  }

  def search(index: Index, queries: DataFrame, qid: String, vec: String,
             nProbe: Int, topK: Int): DataFrame =
    scanProbed(index, probeCells(index, queries, qid, vec, nProbe), topK)

  /** Probe-cell selection, SCAN form (the O(nlist)-per-query arm):
    * score every centroid against every query via the broadcast
    * centroid table and rank-window the top nProbe. Probe ranking uses
    * raw dots — ‖q‖ is constant within a query partition, so the
    * ordering equals the cosine ordering; ties break toward the lower
    * centroid_id. Output: (query_id, qv, centroid_id), one row per
    * probed cell. */
  def probeCells(index: Index, queries: DataFrame, qid: String,
                 vec: String, nProbe: Int): DataFrame = {
    NativeVector.register(queries.sparkSession)
    val q = queries.select(col(qid).as("query_id"), col(vec).as("qv"))
    val wProbe = Window.partitionBy("query_id").orderBy(desc("csim"), col("centroid_id"))
    q.crossJoin(broadcast(index.centroids))
      .withColumn("csim", NativeVector.dot(col("qv"), col("cvec")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "centroid_id")
  }

  /** Probe-cell selection, GRAPH form (round 20 — the IVF_HNSW
    * composition's QUERY side, closing round-19 verdict #1: [[search]]
    * still paid the O(nlist)-per-query centroid scan that
    * [[assignGraph]] already replaced on the corpus side — the
    * identical shape IvfHnswProbe priced 19× at 16K cells, now on the
    * latency-critical path). Same discipline as [[assignGraph]]: the
    * centroid graph's beam PROPOSES `cand` cells per query, an EXACT
    * in-order-double dot ordering — ties toward the lower centroid_id,
    * [[probeCells]]'s window semantics — DECIDES the top-nProbe probe
    * set. With `efSearch ≥ nLists` and `cand ≥ nLists` over a
    * connected graph the beam visits every cell, so the probe set
    * reproduces the scan's BIT-FOR-BIT (the exactness lever — q185
    * derives the flag); tight (ef, cand) is the scale path:
    * O(ef·log nlist) per query instead of O(nlist). Distributed as
    * mapPartitions over the broadcast graph (KiB–MiB at any real
    * nlist). Queries must be finite — [[Hnsw.search]] rejects NaN/Inf
    * loudly (the scan arm's NaN dots would rank junk cells silently;
    * a non-finite QUERY is caller error, unlike corpus rows, which
    * [[build]] parks). */
  def probeCellsGraph(index: Index, g: Hnsw.Graph, queries: DataFrame,
                      qid: String, vec: String, nProbe: Int,
                      efSearch: Int, cand: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    require(g.ids.forall(_.isValidInt),
      "probeCellsGraph needs a centroid graph: every node id must be a " +
        "valid Int centroid_id (build it with Ivf.centroidGraph)")
    val bg = spark.sparkContext.broadcast(g)
    queries.select(col(qid).cast("long"), col(vec).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val graph = bg.value
        val ix = graph.ids.zipWithIndex.toMap
        it.flatMap { case (queryId, qv) =>
          val proposed = Hnsw.search(graph, qv, efSearch, cand).map(_._1)
          proposed
            .map { cid =>
              val c = graph.vecs(ix(cid))
              var s = 0.0; var i = 0
              while (i < qv.length) {
                s += qv(i).toDouble * c(i).toDouble; i += 1
              }
              (s, cid.toInt)
            }
            .sortBy { case (s, cid) => (-s, cid) }
            .take(nProbe)
            .map { case (_, cid) => (queryId, qv, cid) }
        }
      }
      .toDF("query_id", "qv", "centroid_id")
  }

  /** Graph-assisted [[search]]: probe cells proposed by the centroid
    * graph ([[probeCellsGraph]] — O(ef·log nlist) per query instead of
    * the O(nlist) scan), then the same exact-cosine top-k inside the
    * probed lists. With `efSearch`/`cand ≥ nLists` this is [[search]]
    * bit-for-bit (IvfSpec + the q185 gate); tight budgets trade cell
    * recall for the scan, exactly like the corpus-side [[assignGraph]]. */
  def searchGraph(index: Index, g: Hnsw.Graph, queries: DataFrame,
                  qid: String, vec: String, nProbe: Int, topK: Int,
                  efSearch: Int, cand: Int): DataFrame =
    scanProbed(index,
      probeCellsGraph(index, g, queries, qid, vec, nProbe, efSearch, cand),
      topK)

  /** The shared probed-scan half of [[search]]/[[searchGraph]]: join
    * the (query_id, qv, centroid_id) probe rows with the inverted
    * lists on centroid_id — only probed cells' rows are ever scanned —
    * and exact-cosine top-k. The candidate join shuffles on
    * centroid_id; at nProbe ≪ nLists it touches ~nProbe/nLists of the
    * corpus. */
  private def scanProbed(index: Index, probes: DataFrame,
                         topK: Int): DataFrame = {
    NativeVector.register(index.assigned.sparkSession)
    val scored = probes.join(index.assigned, Seq("centroid_id"))
      .withColumnRenamed(index.idCol, "neighbor_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        round(NativeVector.cosine(col("qv"), col(index.vecCol)) * 1e6) / 1e6)
    // round-20: k-bounded rank instead of the row_number window — same
    // (sim desc nulls-last, id asc) selection (IvfSpec's reload/search
    // bit-equality pins it), k-sized buffers instead of a full sort of
    // every probed pair
    BoundedTopK.rankHits(scored, "query_id", "sim", "neighbor_id", topK)
      .select("query_id", "neighbor_id", "sim")
  }
}
