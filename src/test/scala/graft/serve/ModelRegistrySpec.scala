package graft.serve

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ml.FraudModel
import graft.sources.SyntheticData

class ModelRegistrySpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = FraudModel.withClassWeight(
    SyntheticData.transactions(spark, 2000L), col("is_fraud"))
  private val cols = Seq("transaction_amt", "v1", "v2", "v3")

  test("register assigns monotone versions; load resolves latest by default") {
    val root = Files.createTempDirectory("graft_registry").toString
    val m1 = FraudModel.gbtPipeline(cols, "is_fraud", maxIter = 3).fit(data)
    val m2 = FraudModel.gbtPipeline(cols, "is_fraud", maxIter = 5).fit(data)
    assert(ModelRegistry.register(spark, root, "gbt", m1,
      Map("roc_auc" -> 0.9)) == 1L)
    assert(ModelRegistry.register(spark, root, "gbt", m2,
      Map("roc_auc" -> 0.95)) == 2L)
    // latest (v2, maxIter=5) predicts identically to the in-memory m2
    val loaded = ModelRegistry.load(spark, root, "gbt")
    val a = FraudModel.withProbability(m2.transform(data))
      .agg(sum($"p_fraud")).first().getDouble(0)
    val b = FraudModel.withProbability(loaded.transform(data))
      .agg(sum($"p_fraud")).first().getDouble(0)
    assert(a == b)
    // explicit version still reachable
    val v1 = ModelRegistry.load(spark, root, "gbt", version = 1L)
    assert(v1.stages.length == 2)
    val meta = ModelRegistry.list(spark, root)
    assert(meta.count() == 2 && meta.filter($"metric" === "roc_auc").count() == 2)
  }

  test("health reports status and model counts; empty registry is 'empty'") {
    val root = Files.createTempDirectory("graft_registry_h").toString
    val empty = ModelRegistry.health(spark, root).collect()(0)
    assert(empty.getString(0) == "empty" && empty.getLong(1) == 0L)
    val m = FraudModel.gbtPipeline(cols, "is_fraud", maxIter = 3).fit(data)
    ModelRegistry.register(spark, root, "a", m)
    ModelRegistry.register(spark, root, "a", m)
    ModelRegistry.register(spark, root, "b", m)
    val h = ModelRegistry.health(spark, root).collect()(0)
    assert(h.getString(0) == "healthy")
    assert(h.getLong(1) == 2L && h.getLong(2) == 3L)
    intercept[IllegalArgumentException] {
      ModelRegistry.load(spark, root, "missing")
    }
  }

  test("prune keeps the newest versions; latest resolution survives; other names untouched") {
    val root = Files.createTempDirectory("graft_registry_p").toString
    val vecs = (0 until 24)
      .map(i => (i.toLong, Array.fill(4)(((i * 7 + 3) % 19) / 10.0f - 0.9f)))
      .toDF("vec_id", "embedding")
    val idx = graft.operators.Ivf.build(vecs, "vec_id", "embedding", nLists = 2)
    for (_ <- 1 to 3)
      ModelRegistry.registerIvf(spark, root, "ann", idx, Map("recall" -> 1.0))
    ModelRegistry.registerIvf(spark, root, "other", idx)
    assert(ModelRegistry.prune(spark, root, "ann", keepLast = 1) == Seq(1L, 2L))
    // latest resolution survives pruning; the artifact still loads and searches
    assert(ModelRegistry.latestVersion(spark, root, "ann") == 3L)
    assert(ModelRegistry.loadIvf(spark, root, "ann").assigned.count() == 24L)
    // pruned versions: metadata rows gone, artifact dirs deleted
    val meta = ModelRegistry.list(spark, root)
    assert(meta.filter($"name" === "ann").select("version").distinct().count() == 1L)
    assert(!new java.io.File(s"$root/ann/v1").exists())
    assert(!new java.io.File(s"$root/ann/v2").exists())
    intercept[Exception] { ModelRegistry.loadIvf(spark, root, "ann", version = 1L) }
    // other names untouched; registration continues past the pruned range
    assert(ModelRegistry.latestVersion(spark, root, "other") == 1L)
    assert(ModelRegistry.registerIvf(spark, root, "ann", idx) == 4L)
    // nothing left to prune at keepLast=2 after that
    assert(ModelRegistry.prune(spark, root, "ann", keepLast = 2).isEmpty)
    intercept[IllegalArgumentException] {
      ModelRegistry.prune(spark, root, "ann", keepLast = 0)
    }
  }

  test("prune is tombstone-append (crash-safe); gc sweeps orphan version " +
    "dirs and leaves live artifacts untouched") {
    val root = Files.createTempDirectory("graft_registry_gc").toString
    val vecs = (0 until 24)
      .map(i => (i.toLong, Array.fill(4)(((i * 7 + 3) % 19) / 10.0f - 0.9f)))
      .toDF("vec_id", "embedding")
    val idx = graft.operators.Ivf.build(vecs, "vec_id", "embedding", nLists = 2)
    for (_ <- 1 to 2)
      ModelRegistry.registerIvf(spark, root, "ann", idx)
    assert(ModelRegistry.prune(spark, root, "ann", keepLast = 1) == Seq(1L))
    // crash-safety shape (round-15 advice): the metadata table was NEVER
    // rewritten — the original register rows are still on disk, the
    // pruned version is hidden by an appended tombstone row, and a
    // version number can never be re-claimed past a tombstone
    val raw = spark.read.parquet(s"$root/_registry")
    assert(raw.filter($"name" === "ann" && $"version" === 1L &&
      $"metric" === ModelRegistry.Tombstone).count() == 1L)
    assert(raw.filter($"name" === "ann" && $"version" === 1L &&
      $"metric" =!= ModelRegistry.Tombstone).count() >= 1L) // original row intact
    assert(ModelRegistry.list(spark, root)
      .filter($"name" === "ann" && $"version" === 1L).count() == 0L)
    assert(ModelRegistry.registerIvf(spark, root, "ann", idx) == 3L)
    // hand-plant the crash residue gc exists for: an artifact dir with no
    // metadata row (prune died between tombstone append and dir delete)
    val orphan = new java.io.File(s"$root/ann/v9/ivf_meta")
    orphan.mkdirs()
    assert(ModelRegistry.gc(spark, root) == Seq(s"$root/ann/v9"))
    assert(!new java.io.File(s"$root/ann/v9").exists())
    // live artifacts survived the sweep and still load
    assert(ModelRegistry.loadIvf(spark, root, "ann").assigned.count() == 24L)
    assert(ModelRegistry.gc(spark, root).isEmpty)
    // non-registry layout (no vN dirs) is left alone
    new java.io.File(s"$root/ann/not_a_version").mkdirs()
    assert(ModelRegistry.gc(spark, root).isEmpty)
    assert(new java.io.File(s"$root/ann/not_a_version").exists())
  }

  test("gc refuses to sweep when the metadata table is empty but version " +
    "dirs exist (round-16 advice: lost-metadata total-loss footgun)") {
    val root = Files.createTempDirectory("graft_registry_gc2").toString
    val vecs = (0 until 24)
      .map(i => (i.toLong, Array.fill(4)(((i * 7 + 3) % 19) / 10.0f - 0.9f)))
      .toDF("vec_id", "embedding")
    val idx = graft.operators.Ivf.build(vecs, "vec_id", "embedding", nLists = 2)
    ModelRegistry.registerIvf(spark, root, "ann", idx)
    // simulate the metadata table being lost (or gc pointed at a wrong
    // root that happens to contain version-shaped directories)
    val meta = new org.apache.hadoop.fs.Path(s"$root/_registry")
    meta.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(meta, true)
    val e = intercept[IllegalStateException] { ModelRegistry.gc(spark, root) }
    assert(e.getMessage.contains("refusing"))
    assert(new java.io.File(s"$root/ann/v1").exists()) // artifact survived
    // the explicit force flag is the caller's assertion — then it sweeps
    assert(ModelRegistry.gc(spark, root, force = true) == Seq(s"$root/ann/v1"))
    assert(!new java.io.File(s"$root/ann/v1").exists())
    // an empty root with NO version dirs stays a clean no-op either way
    assert(ModelRegistry.gc(spark, root).isEmpty)
  }

  // a small clustered vector corpus for the ANN lifecycle tests
  private lazy val vecCorpus = (0 until 80).map { i =>
    val c = i % 4
    val base = Array.tabulate(8)(d => if (d == c) 1.0f else 0.05f)
    (i.toLong, base.map(x => x + ((i * 7) % 13 - 6) / 120.0f))
  }.toDF("vec_id", "embedding")

  private def annHits(idx: LocalAnn.Index): Seq[(Long, Long, Long)] =
    (0L until 6L).flatMap { qid =>
      val v = vecCorpus.filter($"vec_id" === qid).collect()(0)
        .getAs[scala.collection.Seq[Float]](1).toArray
      LocalAnn.search(idx, qid, v, shortlist = idx.size, topK = 5)
        .map(h => (qid, h.neighborId, java.lang.Double.doubleToLongBits(h.sim)))
    }

  test("compact (round 20): masked search == compacted search; old version " +
    "pruned; mask empty; survivor-sized artifact; no-op without tombstones; " +
    "non-ANN families rejected") {
    val root = Files.createTempDirectory("graft_registry_cpt").toString
    val index = graft.operators.Ivf.build(vecCorpus, "vec_id", "embedding",
      nLists = 4)
    ModelRegistry.registerIvf(spark, root, "ivf", index)
    // no tombstones -> no-op, version untouched
    assert(ModelRegistry.compact(spark, root, "ivf") == 1L)
    assert(ModelRegistry.latestVersion(spark, root, "ivf") == 1L)
    ModelRegistry.deleteIds(spark, root, "ivf", Seq(7L, 11L, 13L))
    val masked = annHits(LocalAnn.load(spark, root, "ivf"))
    assert(ModelRegistry.compact(spark, root, "ivf") == 2L)
    val idx = LocalAnn.load(spark, root, "ivf")
    assert(annHits(idx) == masked,
      "compacted search must bit-equal the masked search")
    assert(idx.size == 77 && idx.deletedCount == 0)
    assert(ModelRegistry.loadDeletedIds(spark, root, "ivf").isEmpty)
    // old version pruned; provenance metric rides the new one
    val meta = ModelRegistry.list(spark, root)
    assert(meta.select("version").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    assert(meta.filter($"metric" === "compacted_from" && $"value" === 1.0)
      .count() == 1)
    // non-ANN family: no tombstone mask to compact
    val m = FraudModel.gbtPipeline(cols, "is_fraud", maxIter = 3).fit(data)
    ModelRegistry.register(spark, root, "gbt", m)
    ModelRegistry.deleteIds(spark, root, "gbt", Seq(1L)) // a stray mask
    intercept[IllegalArgumentException] {
      ModelRegistry.compact(spark, root, "gbt")
    }
  }

  test("compact (round 20): hnsw rebuild carries attr columns; ambiguous " +
    "codes-table id columns fail loudly unless idCol is passed; " +
    "carryDeletedIds bridges a refresh version") {
    val root = Files.createTempDirectory("graft_registry_cpt2").toString
    // hnsw with an attr column: compaction must carry survivors' attrs
    val g = graft.operators.Hnsw.fromDataFrame(vecCorpus, "vec_id",
      "embedding", m = 4, efConstruction = 16)
    ModelRegistry.registerHnsw(spark, root, "hnsw", g,
      attrs = Seq("label" -> Array.tabulate(80)(i => (i % 3).toLong)))
    ModelRegistry.deleteIds(spark, root, "hnsw", Seq(9L, 10L))
    val maskedFiltered = {
      val idx = LocalAnn.load(spark, root, "hnsw", attrCols = Seq("label"))
      LocalAnn.search(idx, 0L, Array.tabulate(8)(d => if (d == 0) 1.0f else 0.05f),
        shortlist = idx.size, topK = 5, allow = Map("label" -> Set(0L)))
    }
    ModelRegistry.compact(spark, root, "hnsw")
    val idx2 = LocalAnn.load(spark, root, "hnsw", attrCols = Seq("label"))
    assert(idx2.size == 78 && idx2.attrs("label").length == 78)
    // attrs stay id-aligned: label of id i is i % 3 for every survivor
    assert(idx2.ids.zip(idx2.attrs("label")).forall { case (id, l) => l == id % 3 })
    assert(LocalAnn.search(idx2, 0L,
      Array.tabulate(8)(d => if (d == 0) 1.0f else 0.05f),
      shortlist = idx2.size, topK = 5,
      allow = Map("label" -> Set(0L))) == maskedFiltered)
    // pq codes table with a SECOND long column: auto-detect must refuse
    val cb = graft.operators.Pq.train(vecCorpus, "vec_id", "embedding",
      m = 2, k = 8)
    val enc = graft.operators.Pq.encode(
        vecCorpus.select("vec_id", "embedding"), "embedding", cb)
      .withColumn("label", $"vec_id" % 3)
    ModelRegistry.registerPq(spark, root, "pq", cb, Some(enc))
    ModelRegistry.deleteIds(spark, root, "pq", Seq(3L))
    intercept[IllegalArgumentException] {
      ModelRegistry.compact(spark, root, "pq")
    }
    assert(ModelRegistry.compact(spark, root, "pq",
      idCol = Some("vec_id")) == 2L)
    assert(ModelRegistry.loadPqCodes(spark, root, "pq").count() == 79)
    // carryDeletedIds: a refresh version starts mask-less; the carry
    // brings the takedown forward
    ModelRegistry.registerHnsw(spark, root, "ref", g)
    ModelRegistry.deleteIds(spark, root, "ref", Seq(5L))
    ModelRegistry.registerHnsw(spark, root, "ref",
      graft.operators.Hnsw.append(g, Seq((200L, Array.fill(8)(0.3f)))))
    assert(ModelRegistry.loadDeletedIds(spark, root, "ref").isEmpty)
    ModelRegistry.carryDeletedIds(spark, root, "ref", fromVersion = 1L)
    assert(ModelRegistry.loadDeletedIds(spark, root, "ref") == Set(5L))
  }

  test("all three model families register, report their kind, and reload bit-equal") {
    val root = Files.createTempDirectory("graft_registry_k").toString
    // LeafBoost: tiny deterministic trainer over the synthetic frame
    val lb = graft.ml.LeafBoost.train(
      data.withColumn("label", col("is_fraud").cast("double"))
        .withColumn("weight", lit(1.0)),
      None, "transaction_id", cols, "label", "weight",
      graft.ml.LeafBoost.Params(numTrees = 4, numLeaves = 6))
    assert(ModelRegistry.registerLeafBoost(spark, root, "lb", lb,
      Map("auc" -> 0.9)) == 1L)
    assert(ModelRegistry.kindOf(spark, root, "lb") == "leafboost")
    val lb2 = ModelRegistry.loadLeafBoost(spark, root, "lb")
    // structural equality + bit-equal scores on every row
    assert(lb2.trees == lb.trees && lb2.features == lb.features &&
      lb2.bestRound == lb.bestRound && lb2.valLoss == lb.valLoss &&
      lb2.catDicts == lb.catDicts)
    assert(lb2.edges.length == lb.edges.length &&
      lb2.edges.zip(lb.edges).forall { case (a, b) => a.sameElements(b) })
    val before = graft.ml.LeafBoost.score(data, cols, lb)
      .select("transaction_id", "p_fraud").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val after = graft.ml.LeafBoost.score(data, cols, lb2)
      .select("transaction_id", "p_fraud").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(before == after) // exact double equality, keyed by id
    // BiLstm: tiny trained net, reload must forward bit-equal
    val seqs = (0 until 40).map { i =>
      val v = if (i % 2 == 0) 1.0 else -1.0
      (Array.tabulate(5)(t => Array(v * t, 1.0 - v)), (i % 2).toDouble, 1.0)
    }.toIndexedSeq
    val net = graft.ml.BiLstm.train(seqs, dim = 2, hidden = 3, attDim = 2,
      epochs = 5)
    assert(ModelRegistry.registerBiLstm(spark, root, "net", net) == 1L)
    assert(ModelRegistry.kindOf(spark, root, "net") == "bilstm")
    val net2 = ModelRegistry.loadBiLstm(spark, root, "net")
    assert(net2.dim == net.dim && net2.hidden == net.hidden &&
      net2.attDim == net.attDim && net2.params.sameElements(net.params))
    seqs.foreach { case (s, _, _) =>
      assert(net2.predict(s) == net.predict(s)) // exact
    }
    // PipelineModel keeps its kind
    val pm = FraudModel.gbtPipeline(cols, "is_fraud", maxIter = 3).fit(data)
    ModelRegistry.register(spark, root, "gbt", pm)
    assert(ModelRegistry.kindOf(spark, root, "gbt") == "pipeline")
    // OPQ rotation (+ companion codebooks under one artifact): kind
    // resolves to "opq" even though pq_codebooks rides along, and the
    // reloaded rotation is bit-identical (OpqSpec pins the values; here
    // the registry path + version resolution)
    val vecs = (0 until 64)
      .map(i => (i.toLong, Array.tabulate(4)(d =>
        (((i * 7 + d * 3) % 19) / 10.0f - 0.9f))))
      .toDF("vec_id", "embedding")
    val rot = graft.operators.Opq.trainRotation(vecs, "embedding", dim = 4, m = 2)
    val er = graft.operators.Opq.rotate(vecs, "vec_id", "embedding", rot)
    val cb = graft.operators.Pq.train(er, "vec_id", "embedding", m = 2, k = 4)
    assert(ModelRegistry.registerOpq(spark, root, "opq", rot, Some(cb)) == 1L)
    assert(ModelRegistry.kindOf(spark, root, "opq") == "opq")
    val rot2 = ModelRegistry.loadOpq(spark, root, "opq")
    assert(rot2.perm.toSeq == rot.perm.toSeq)
    assert(rot2.rows.map(_.toSeq).toSeq == rot.rows.map(_.toSeq).toSeq)
    val cb2 = ModelRegistry.loadPq(spark, root, "opq")
    assert(cb2.centers.map(_.map(_.toSeq).toSeq).toSeq ==
      cb.centers.map(_.map(_.toSeq).toSeq).toSeq)
    // one metadata table lists all four families
    assert(ModelRegistry.list(spark, root).select("name").distinct().count() == 4)
  }
}
