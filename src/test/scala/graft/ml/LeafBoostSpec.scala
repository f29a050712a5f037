package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LightGBM-distinct semantics, verified: leaf-wise (best-first) growth
  * produces the unbalanced trees depth-wise growth cannot; training is
  * bit-deterministic across partition layouts (integer-histogram
  * doctrine); early stopping is round-exact and truncates to the best
  * round; scoring is distributed and matches the driver-side forward. */
class LeafBoostSpec extends SparkSpec {
  import spark.implicits._

  private def mkDf(rows: Seq[(Long, Double, Double, Double)]) =
    rows.toDF("id", "x1", "x2", "label").withColumn("weight", lit(1.0))

  private def depthOf(t: LeafBoost.Tree): Int = {
    def go(i: Int): Int =
      if (t.nodes(i).isLeaf) 1
      else 1 + math.max(go(t.nodes(i).left), go(t.nodes(i).right))
    go(0)
  }

  test("binOf: count of edges <= v; non-finite parks in bin 0") {
    val edges = Array(1.0, 2.0, 5.0)
    assert(LeafBoost.binOf(0.5, edges) == 0)
    assert(LeafBoost.binOf(1.0, edges) == 1)
    assert(LeafBoost.binOf(4.9, edges) == 2)
    assert(LeafBoost.binOf(99.0, edges) == 3)
    assert(LeafBoost.binOf(Double.NaN, edges) == 0)
    assert(LeafBoost.binOf(Double.PositiveInfinity, edges) == 0)
  }

  test("learns a separable signal and leaf-wise growth goes DEEP where the loss is") {
    // label = 1 only in a narrow x1 slice — after the first split, all
    // remaining gain is inside ONE branch, so best-first growth chains
    // down that branch (depth > log2(leaves)); a depth-wise grower at 4
    // leaves would stop at depth 2
    val rnd = new scala.util.Random(11)
    val rows = (0 until 2000).map { i =>
      val x1 = rnd.nextDouble() * 100
      val x2 = rnd.nextDouble()
      val y = if (x1 > 90 && x1 <= 95) 1.0 else 0.0
      (i.toLong, x1, x2, y)
    }
    val df = mkDf(rows)
    val m = LeafBoost.train(df, None, "id", Seq("x1", "x2"), "label", "weight",
      LeafBoost.Params(numTrees = 5, numLeaves = 4, learningRate = 0.3))
    assert(m.trees.nonEmpty)
    val t0 = m.trees.head
    assert(t0.numLeaves <= 4)
    assert(depthOf(t0) >= 4, s"expected an unbalanced chain, depth=${depthOf(t0)}")
    // held-out separation: pairwise ranking AUC (bin-edge quantization
    // blurs the slice boundary, so a min/max rank assert is too strict)
    val scored = LeafBoost.score(df, Seq("x1", "x2"), m).collect()
    val pos = scored.filter(_.getDouble(3) == 1.0).map(_.getDouble(5))
    val neg = scored.filter(_.getDouble(3) == 0.0).map(_.getDouble(5))
    val auc = pos.map(p => neg.count(n => n < p) + 0.5 * neg.count(n => n == p)).sum /
      (pos.length.toDouble * neg.length)
    assert(auc >= 0.95, s"ranking AUC $auc")
    // importance: x1 carries the signal
    assert(m.featureImportance.head._1 == "x1")
  }

  test("training is bit-identical across partition layouts AND local vs distributed") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 1200).map { i =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val y = if (x1 + 0.5 * x2 + 0.3 * rnd.nextGaussian() > 0) 1.0 else 0.0
      (i.toLong, x1, x2, y)
    }
    // localThreshold = 0 forces the DISTRIBUTED branch (map-side partial
    // histograms); the default routes this driver-sized frame LOCAL.
    // Long sums are associative, so all four runs must agree bit-for-bit
    // — with early stopping on, so the stop round is covered too.
    val valRows = rows.take(300)
    val dist = LeafBoost.Params(numTrees = 6, numLeaves = 8,
      earlyStoppingRounds = 3, localThreshold = 0)
    val local = dist.copy(localThreshold = 100000)
    val a = LeafBoost.train(mkDf(rows).repartition(1), Some(mkDf(valRows)), "id",
      Seq("x1", "x2"), "label", "weight", dist)
    val b = LeafBoost.train(mkDf(rows).repartition(7, col("x2")), Some(mkDf(valRows)), "id",
      Seq("x1", "x2"), "label", "weight", dist)
    val c = LeafBoost.train(mkDf(rows), Some(mkDf(valRows)), "id",
      Seq("x1", "x2"), "label", "weight", local)
    assert(a.trees == b.trees,
      "histograms are long sums — the trained structure must not depend on partitioning")
    assert(a.trees == c.trees && a.bestRound == c.bestRound && a.valLoss == c.valLoss,
      "driver-local and distributed branches must produce the identical model")
  }

  test("row/feature subsampling is deterministic across layouts, changes the model, and stays seed-stable") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 1500).map { i =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val y = if (x1 + 0.5 * x2 + 0.3 * rnd.nextGaussian() > 0) 1.0 else 0.0
      (i.toLong, x1, x2, y)
    }
    val sub = LeafBoost.Params(numTrees = 6, numLeaves = 8,
      baggingFraction = 0.7, baggingFreq = 1, featureFraction = 0.5,
      localThreshold = 0)
    val a = LeafBoost.train(mkDf(rows).repartition(1), None, "id",
      Seq("x1", "x2"), "label", "weight", sub)
    val b = LeafBoost.train(mkDf(rows).repartition(7, col("x2")), None, "id",
      Seq("x1", "x2"), "label", "weight", sub)
    val c = LeafBoost.train(mkDf(rows), None, "id",
      Seq("x1", "x2"), "label", "weight", sub.copy(localThreshold = 100000))
    // the bag is a pure function of (id hash, round, seed) — identical
    // model at any layout AND local vs distributed
    assert(a.trees == b.trees, "subsampled training must be layout-independent")
    assert(a.trees == c.trees, "subsampled local ≡ distributed")
    // subsampling must actually subsample: structure differs from full
    val full = LeafBoost.train(mkDf(rows), None, "id",
      Seq("x1", "x2"), "label", "weight",
      sub.copy(baggingFraction = 1.0, baggingFreq = 0, featureFraction = 1.0))
    assert(a.trees != full.trees, "bagged model should differ from full-data model")
    // a different seed draws a different bag
    val otherSeed = LeafBoost.train(mkDf(rows), None, "id",
      Seq("x1", "x2"), "label", "weight", sub.copy(seed = 99L))
    assert(a.trees != otherSeed.trees, "seed must select the bag")
    // feature_fraction = tiny forces single-feature trees
    val oneFeat = LeafBoost.train(mkDf(rows), None, "id",
      Seq("x1", "x2"), "label", "weight",
      sub.copy(featureFraction = 1e-9, baggingFraction = 1.0, baggingFreq = 0))
    val usedPerTree = oneFeat.trees.map(_.nodes.filter(!_.isLeaf).map(_.feature).toSet)
    assert(usedPerTree.forall(_.size <= 1),
      s"featureFraction→0 must leave exactly one allowed feature per tree, got $usedPerTree")
  }

  test("trainMany over one shared prep == separate train calls, bit-for-bit") {
    val rnd = new scala.util.Random(29)
    val rows = (0 until 900).map { i =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      ((i.toLong, x1, x2, if (x1 - 0.3 * x2 > 0) 1.0 else 0.0))
    }
    val df = mkDf(rows)
    val p1 = LeafBoost.Params(numTrees = 4, numLeaves = 6)
    val p2 = p1.copy(growth = "depthwise", maxDepth = 3)
    val sep1 = LeafBoost.train(df, None, "id", Seq("x1", "x2"), "label", "weight", p1)
    val sep2 = LeafBoost.train(df, None, "id", Seq("x1", "x2"), "label", "weight", p2)
    val Seq(m1, m2) = LeafBoost.trainMany(df, None, "id", Seq("x1", "x2"),
      "label", "weight", Seq(p1, p2))
    assert(m1.trees == sep1.trees && m2.trees == sep2.trees)
    // prep-shape knobs must agree across variants
    intercept[IllegalArgumentException] {
      LeafBoost.trainMany(df, None, "id", Seq("x1", "x2"), "label", "weight",
        Seq(p1, p1.copy(bins = 16)))
    }
  }

  test("bag membership draw is uniform-ish and respects the fraction") {
    val n = 20000
    val hits = (0 until n).count(i => LeafBoost.inBag(
      graft.ml.LeafBoost.hashDraw(i.toLong, 0L, 1L).hashCode.toLong, 0,
      LeafBoost.Params(baggingFraction = 0.3, baggingFreq = 1)))
    // crude but sufficient: binomial(20000, 0.3) is within ±4σ ≈ ±260
    assert(math.abs(hits - 6000) < 500, s"bag hit rate off: $hits/20000 at p=0.3")
  }

  test("early stopping is round-exact: stops after K non-improving rounds, truncates to best") {
    val rnd = new scala.util.Random(3)
    val train = (0 until 800).map { i =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      (i.toLong, x1, x2, if (x1 > 0) 1.0 else 0.0)
    }
    // validation labels INVERTED: every round of fitting train makes val
    // loss strictly worse, so best is round 1 and stopping must fire at
    // exactly 1 + earlyStoppingRounds rounds
    val valRows = train.take(200).map { case (i, x1, x2, y) => (i, x1, x2, 1.0 - y) }
    val p = LeafBoost.Params(numTrees = 30, numLeaves = 8,
      earlyStoppingRounds = 3)
    val m = LeafBoost.train(mkDf(train), Some(mkDf(valRows)), "id",
      Seq("x1", "x2"), "label", "weight", p)
    assert(m.valLoss.length == 1 + 3,
      s"expected exactly bestRound+K rounds trained, got ${m.valLoss.length}")
    assert(m.bestRound == 1 && m.trees.length == 1,
      s"model must truncate to the best round (got bestRound=${m.bestRound}, trees=${m.trees.length})")
    assert(m.valLoss.head == m.valLoss.min)
  }

  test("depthwise growth (XGBoost hist) respects maxDepth and stays level-balanced") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 2000).map { i =>
      val x1 = rnd.nextDouble() * 100
      val x2 = rnd.nextDouble()
      (i.toLong, x1, x2, if (x1 > 90 && x1 <= 95) 1.0 else 0.0)
    }
    val df = mkDf(rows)
    val m = LeafBoost.train(df, None, "id", Seq("x1", "x2"), "label", "weight",
      LeafBoost.Params(numTrees = 3, numLeaves = 64, learningRate = 0.3,
        growth = "depthwise", maxDepth = 3))
    m.trees.foreach { t =>
      assert(depthOf(t) <= 4, s"maxDepth=3 must cap the tree at 4 levels, got ${depthOf(t)}")
      assert(t.numLeaves <= 8)
    }
    // same data, same budget by leaves: leafwise digs deeper than the
    // depthwise cap allows — the growth ORDER is the observable semantic
    val lw = LeafBoost.train(df, None, "id", Seq("x1", "x2"), "label", "weight",
      LeafBoost.Params(numTrees = 1, numLeaves = 8, learningRate = 0.3))
    assert(depthOf(lw.trees.head) > 4,
      s"leafwise at 8 leaves should chain past depth 4 on slice data, got ${depthOf(lw.trees.head)}")
  }

  test("categorical subset split isolates NON-CONTIGUOUS hot categories in one node") {
    // positives iff cat ∈ {b, g} — under the sorted dictionary codes
    // (a=0..h=7) that subset is not an interval, so an ordered
    // threshold split cannot isolate it; LightGBM's G/H-sorted subset
    // scan must pick exactly {b, g} at the root
    val rnd = new scala.util.Random(17)
    val cats = "abcdefgh".map(_.toString)
    val rows = (0 until 1600).map { i =>
      val c = cats(rnd.nextInt(cats.length))
      val y = if (c == "b" || c == "g") 1.0 else 0.0
      (i.toLong, rnd.nextGaussian(), c, y)
    }
    val df = rows.toDF("id", "x1", "cat", "label").withColumn("weight", lit(1.0))
    val m = LeafBoost.train(df, None, "id", Seq("x1"), "label", "weight",
      LeafBoost.Params(numTrees = 3, numLeaves = 4, learningRate = 0.5),
      catCols = Seq("cat"))
    val root = m.trees.head.nodes(0)
    assert(!root.isLeaf && root.isCat && root.feature == 1,
      s"root must split the categorical feature: $root")
    val dict = m.catDicts(1)
    val leftSet = (0 until 64).filter(k => ((root.cats >>> k) & 1L) == 1L).toSet
    val hot = Set(dict("b"), dict("g"))
    assert(leftSet == hot || leftSet == dict.values.toSet.diff(hot) + dict.size ||
        leftSet == dict.values.toSet.diff(hot),
      s"subset must be exactly the hot categories or their complement: $leftSet vs $hot")
    // perfect separation on scored rows
    val scored = LeafBoost.score(df, Seq("x1", "cat"), m).collect()
    val pIdx = scored.head.length - 1 // appended p_fraud column
    assert(scored.forall { r =>
      (r.getDouble(pIdx) >= 0.5) == (r.getDouble(3) >= 0.5)
    }, "categorical model must classify the pure-categorical signal perfectly")
    // unseen category at scoring time parks in the reserved bin, no throw
    val unseen = Seq((9999L, 0.0, "zzz", 0.0)).toDF("id", "x1", "cat", "label")
    assert(LeafBoost.score(unseen, Seq("x1", "cat"), m).collect().length == 1)
  }

  test("integer-typed feature columns train and score without casts") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 400).map { i =>
      val x = rnd.nextInt(100)
      (i.toLong, x, if (x > 60) 1.0 else 0.0)
    }
    val df = rows.toDF("id", "xi", "label").withColumn("weight", lit(1.0))
    val m = LeafBoost.train(df, None, "id", Seq("xi"), "label", "weight",
      LeafBoost.Params(numTrees = 3, numLeaves = 4))
    val scored = LeafBoost.score(df, Seq("xi"), m).collect()
    val pIdx = scored.head.length - 1
    val acc = scored.count(r => (r.getDouble(pIdx) >= 0.5) == (r.getDouble(2) >= 0.5))
    assert(acc >= 380, s"int-feature accuracy $acc/400")
  }

  test("null and all-NaN feature columns park instead of crashing the trainer (review round 11)") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 300).map { i =>
      val x = rnd.nextGaussian()
      // x2: null on a third of rows; x3: NaN everywhere (degenerate 0/0-style column)
      (i.toLong, x, if (i % 3 == 0) None else Some(x * 2), Double.NaN,
        if (x > 0) 1.0 else 0.0)
    }
    val df = rows.toDF("id", "x1", "x2", "x3", "label").withColumn("weight", lit(1.0))
    val m = LeafBoost.train(df, None, "id", Seq("x1", "x2", "x3"), "label", "weight",
      LeafBoost.Params(numTrees = 3, numLeaves = 4))
    assert(m.edges(2).isEmpty, "an all-NaN feature must yield zero edges (never splits)")
    assert(m.trees.nonEmpty && m.featureImportance.head._1 != "x3")
    assert(LeafBoost.score(df, Seq("x1", "x2", "x3"), m).collect().length == 300)
  }

  test("fold checkpoints free their blocks and never unpersist foreign RDDs") {
    // 34 trees at FoldEvery=16 crosses TWO margin folds on both the
    // train and val chains, so the second fold must drop the first
    // fold's checkpoint blocks. The round-13 advice fix scopes that
    // drop to the dataset's own RDD lineage — this pins both halves of
    // the contract: (1) no checkpoint block outlives training, (2) an
    // RDD persisted by someone else on the same context survives it.
    val sc = spark.sparkContext
    val foreign = sc.parallelize(1 to 10, 2).persist()
    foreign.count()
    val before = sc.getPersistentRDDs.keySet
    val rnd = new scala.util.Random(11)
    val rows = (0 until 1200).map { i =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      (i.toLong, x1, x2, if (x1 + 0.5 * x2 + 0.3 * rnd.nextGaussian() > 0) 1.0 else 0.0)
    }
    val p = LeafBoost.Params(numTrees = 34, numLeaves = 4,
      earlyStoppingRounds = 40, localThreshold = 0)
    val m = LeafBoost.train(mkDf(rows), Some(mkDf(rows.take(300))), "id",
      Seq("x1", "x2"), "label", "weight", p)
    assert(m.trees.length == 34)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"persisted RDDs leaked by training: $leaked")
    assert(sc.getPersistentRDDs.contains(foreign.id),
      "foreign persisted RDD must survive training")
    foreign.unpersist()
  }

  test("no-early-stop run keeps all trees; valLoss improves on aligned validation") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 600).map { i =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      (i.toLong, x1, x2, if (x1 - x2 > 0) 1.0 else 0.0)
    }
    val p = LeafBoost.Params(numTrees = 10, numLeaves = 8, earlyStoppingRounds = 5)
    val m = LeafBoost.train(mkDf(rows), Some(mkDf(rows.take(150))), "id",
      Seq("x1", "x2"), "label", "weight", p)
    assert(m.trees.length == m.bestRound)
    assert(m.valLoss.last <= m.valLoss.head,
      "aligned validation loss must not degrade from round 1 to the kept round")
  }
}
