package graft.eval

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  // (label, score): 3 pos, 3 neg with one tie across classes
  private lazy val scored = Seq(
    (1, 0.9), (1, 0.8), (1, 0.4), (0, 0.4), (0, 0.3), (0, 0.1)
  ).toDF("label", "score")

  test("confusion + point metrics + cost at τ=0.5, one pass") {
    val r = Metrics.confusionAt(scored, $"label", $"score", 0.5).collect()(0)
    assert(r.getAs[Long]("tp") == 2 && r.getAs[Long]("fp") == 0)
    assert(r.getAs[Long]("fn") == 1 && r.getAs[Long]("tn") == 3)
    assert(r.getAs[Double]("precision") == 1.0)
    assert(math.abs(r.getAs[Double]("recall") - 2.0 / 3) < 1e-12)
    assert(r.getAs[Double]("cost") == 1000.0) // 1 fn * 1000 + 0 fp * 10
  }

  test("ROC-AUC via rank-sum matches hand-computed value with ties") {
    // ranks asc: 0.1->1, 0.3->2, 0.4 tie -> avg 3.5, 0.8->5, 0.9->6
    // R_pos = 3.5+5+6 = 14.5; AUC = (14.5 - 3*4/2) / (3*3) = 8.5/9
    val auc = Metrics.rocAuc(scored, $"label", $"score").collect()(0).getDouble(0)
    assert(math.abs(auc - 8.5 / 9.0) < 1e-12)
  }

  test("equi-depth bucketing bounds buckets under adversarially clustered scores") {
    // 4000 distinct scores saturated into [0.999, 1.0] plus one outlier
    // at 0.0: equal-width puts ~everything in the top bucket; equi-depth
    // must spread them so no bucket exceeds ~2/nBuckets of the rows
    val n = 4000
    val clustered = spark.range(n)
      .select((lit(0.999) + col("id") * lit(0.001 / n)).as("s"),
        (col("id") % 2).cast("int").as("y"))
      .unionByName(Seq((0.0, 1)).toDF("s", "y"))
    val nBuckets = 64
    val byScore = clustered.groupBy(col("s").as("s"))
      .agg(count(lit(1)).as("cnt"), sum(col("y").cast("long")).as("pos"))
    def maxBucketFrac(equiDepth: Boolean): Double =
      Metrics.bucketAssign(byScore, "s", descending = false, nBuckets, equiDepth)
        .groupBy("__b").count().agg(max("count")).first().getLong(0)
        .toDouble / (n + 1)
    // equal-width degenerates (one bucket holds ~everything)...
    assert(maxBucketFrac(equiDepth = false) > 0.9)
    // ...equi-depth bounds every bucket near its fair share
    assert(maxBucketFrac(equiDepth = true) <= 2.0 / nBuckets,
      s"max equi-depth bucket fraction ${maxBucketFrac(equiDepth = true)}")
    // and the cumulative sums stay exact under both bucketings
    for (ed <- Seq(true, false)) {
      val cums = Metrics.bucketedCumSums(byScore, "s", descending = false,
          Seq("cnt"), nBuckets, equiDepth = ed)
        .orderBy("s").select("cum_cnt").collect().map(_.getLong(0))
      assert(cums.toSeq == (1L to (n + 1)).toSeq, s"equiDepth=$ed")
    }
  }

  test("perfect separation gives AUC 1.0, inverted gives 0.0") {
    val perfect = Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)).toDF("label", "score")
    assert(Metrics.rocAuc(perfect, $"label", $"score").collect()(0).getDouble(0) == 1.0)
    val inverted = perfect.withColumn("score", lit(1.0) - $"score")
    assert(Metrics.rocAuc(inverted, $"label", $"score").collect()(0).getDouble(0) == 0.0)
  }

  test("PR curve: precision/recall per distinct threshold descending") {
    val pr = Metrics.prCurve(scored, $"label", $"score")
      .orderBy(desc("threshold")).collect()
    // thresholds: 0.9, 0.8, 0.4, 0.3, 0.1
    assert(pr.length == 5)
    assert(pr(0).getAs[Double]("precision") == 1.0 &&
      math.abs(pr(0).getAs[Double]("recall") - 1.0 / 3) < 1e-12)
    // at 0.4: tp=3 (all pos), fp=1 -> precision 0.75, recall 1.0
    assert(math.abs(pr(2).getAs[Double]("precision") - 0.75) < 1e-12)
    assert(pr(2).getAs[Double]("recall") == 1.0)
  }

  test("best F1 threshold picked from the curve") {
    val r = Metrics.bestF1Threshold(scored, $"label", $"score").collect()(0)
    // f1 at 0.4: p=.75 r=1 -> 6/7 ≈ .857 — the max
    assert(r.getAs[Double]("threshold") == 0.4)
    assert(math.abs(r.getAs[Double]("f1") - 6.0 / 7) < 1e-12)
  }

  test("min-cost threshold: fn*1000 + fp*10 minimized over the curve") {
    // thresholds desc: 0.9(FN2)→2000, 0.8(FN1)→1000, 0.4(FP1)→10,
    // 0.3(FP2)→20, 0.1(FP3)→30
    val r = Metrics.minCostThreshold(scored, $"label", $"score").collect()(0)
    assert(r.getAs[Double]("threshold") == 0.4)
    assert(r.getAs[Double]("cost") == 10.0)
  }

  test("recall-floor threshold: max precision subject to recall >= floor") {
    // recall >= 0.9 first at s=0.4 (recall 1, prec 3/4); lower s only
    // dilutes precision
    val r = Metrics.recallFloorThreshold(scored, $"label", $"score", 0.9).collect()(0)
    assert(r.getAs[Double]("threshold") == 0.4)
    assert(r.getAs[Double]("precision") == 0.75)
    assert(r.getAs[Double]("recall") == 1.0)
  }

  test("bucketed prefix sums: degenerate single distinct score") {
    val one = Seq((1, 0.5), (0, 0.5), (1, 0.5)).toDF("label", "score")
    val curve = Metrics.prCurve(one, $"label", $"score").collect()
    assert(curve.length == 1)
    assert(math.abs(curve(0).getAs[Double]("precision") - 2.0 / 3) < 1e-12)
    assert(curve(0).getAs[Double]("recall") == 1.0)
  }

  test("bucketed prefix sums: negative scores order correctly") {
    // same ranking as `scored` shifted by -1: identical AUC
    val neg = scored.withColumn("score", $"score" - lit(1.0))
    val auc = Metrics.rocAuc(neg, $"label", $"score").collect()(0).getDouble(0)
    assert(math.abs(auc - 8.5 / 9.0) < 1e-12)
    val best = Metrics.bestF1Threshold(neg, $"label", $"score").collect()(0)
    assert(math.abs(best.getAs[Double]("threshold") - -0.6) < 1e-12)
  }

  test("threshold grid is ANSI-safe when a cell has no predictions") {
    val g = Metrics.thresholdGrid(scored, $"label", $"score", Seq(0.05, 0.95))
      .orderBy("tau").collect()
    assert(g(0).getAs[Double]("recall") == 1.0)  // everything predicted pos
    assert(g(1).isNullAt(1) || g(1).getAs[Double]("precision") == 0.0) // no preds ≥ .95
  }

  test("psi: zero for proportional populations, large for a shifted one, spine totals") {
    // two populations with IDENTICAL bin proportions (counts 2:1) —
    // smoothing preserves p_ref == p_cur only when totals make
    // (n+1)/(N+B) equal, so use equal totals: same distribution twice
    val same = spark.range(1000).select(
      (($"id" % 10).cast("double") / 10.0 + 0.05).as("score"),
      ($"id" >= 500).as("cur"))  // first/second half: same bin mix
    val p0 = Metrics.psi(same, $"score", $"cur").collect()
    assert(p0.length == 10)
    assert(math.abs(p0.head.getAs[Double]("psi")) < 1e-12, p0.head.toString)

    // current population shifted wholesale into the top bins
    val shifted = spark.range(1000).select(
      when($"id" < 500, ($"id" % 5).cast("double") / 10.0 + 0.05)
        .otherwise(($"id" % 5).cast("double") / 10.0 + 0.55).as("score"),
      ($"id" >= 500).as("cur"))
    val p1 = Metrics.psi(shifted, $"score", $"cur").collect()
    assert(p1.head.getAs[Double]("psi") > 0.25, p1.head.toString) // retrain territory

    // empty bins come back through the spine with zero counts, and the
    // per-bin counts total the populations
    assert(p1.map(_.getAs[Long]("n_ref")).sum == 500)
    assert(p1.map(_.getAs[Long]("n_cur")).sum == 500)
    assert(p1.count(r => r.getAs[Long]("n_ref") == 0 && r.getAs[Long]("n_cur") > 0) > 0)
    // clamp: out-of-range scores land in the edge bins, never a new bin;
    // NULL and NaN scores are excluded from both populations (the
    // documented cross-engine contract — DuckDB drops them too)
    val edge = Seq(
      (Some(1.7), false), (Some(-0.3), true),
      (None: Option[Double], false), (Some(Double.NaN), true))
      .toDF("score", "cur")
    val pe = Metrics.psi(edge, $"score", $"cur").collect()
    assert(pe.length == 10)
    assert(pe.find(_.getAs[Long]("bin") == 9).get.getAs[Long]("n_ref") == 1)
    assert(pe.find(_.getAs[Long]("bin") == 0).get.getAs[Long]("n_cur") == 1)
    assert(pe.map(_.getAs[Long]("n_ref")).sum == 1) // null dropped
    assert(pe.map(_.getAs[Long]("n_cur")).sum == 1) // NaN dropped
  }

  test("calibration: perfectly calibrated bins give ECE 0, known Brier; null/NaN excluded") {
    // 100 rows at score 0.25 with 25 positives, 100 at 0.75 with 75:
    // mean_score == frac_pos in both occupied bins -> ECE exactly 0.
    // Brier = (25*(.75)^2 + 75*(.25)^2 + 75*(.25)^2 + 25*(.75)^2)/200
    val rows = (0 until 100).map(i => (0.25, if (i < 25) 1 else 0)) ++
      (0 until 100).map(i => (0.75, if (i < 75) 1 else 0))
    val out = Metrics.calibration(rows.toDF("score", "label"),
      $"label", $"score").collect()
    assert(out.length == 10)
    val b2 = out.find(_.getAs[Long]("bin") == 2).get
    assert(b2.getAs[Long]("n") == 100)
    assert(b2.getAs[Double]("mean_score") == 0.25)
    assert(b2.getAs[Double]("frac_pos") == 0.25)
    assert(out.head.getAs[Double]("ece") == 0.0)
    val brier = (25 * 0.5625 + 150 * 0.0625 + 25 * 0.5625) / 200.0
    assert(math.abs(out.head.getAs[Double]("brier") - brier) < 1e-12)
    // empty bins emit n=0 with null means (spine-total), and null/NaN
    // scores are excluded by the explicit guard
    assert(out.count(_.getAs[Long]("n") == 0) == 8)
    // null/NaN scores AND null labels are all excluded — an unlabeled
    // row would otherwise inflate every denominator (ECE reads
    // "calibrated", Brier halves) while feeding no numerator
    val edge = Seq((Some(0.5), Some(1)), (None: Option[Double], Some(1)),
      (Some(Double.NaN), Some(0)), (Some(0.5), None: Option[Int]))
      .toDF("score", "label")
    val oe = Metrics.calibration(edge, $"label", $"score").collect()
    assert(oe.map(_.getAs[Long]("n")).sum == 1)
  }
}
