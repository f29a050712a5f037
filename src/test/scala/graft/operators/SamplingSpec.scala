package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = spark.range(20000L).toDF("id")

  test("rate is close to the requested fraction and independent across salts") {
    val n = ids.count().toDouble
    val f = 0.1
    val kept = Sampling.sample(ids, $"id", f).count()
    assert(math.abs(kept / n - f) < 0.01, s"rate ${kept / n}")
    // different salts select (nearly) independent subsets
    val both = Sampling.sample(Sampling.sample(ids, $"id", f, "a"), $"id", f, "b").count()
    assert(math.abs(both / n - f * f) < 0.005, s"nested rate ${both / n}")
  }

  test("membership is a pure key function: partition-layout independent") {
    val a = Sampling.sample(ids, $"id", 0.07).collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(ids.repartition(17, $"id" % 3), $"id", 0.07)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("stratified: per-stratum rates honored, unlisted strata drop") {
    val df = ids.withColumn("g",
      when($"id" % 3 === 0, "x").when($"id" % 3 === 1, "y").otherwise("z"))
    val out = Sampling.stratified(df, $"g", $"id", Map("x" -> 0.3, "y" -> 0.05))
    val rates = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / (20000.0 / 3)).toMap
    assert(math.abs(rates("x") - 0.3) < 0.03)
    assert(math.abs(rates("y") - 0.05) < 0.02)
    assert(!rates.contains("z"))
  }

  test("samples NEST as the fraction grows (same salt)") {
    // the hex threshold is monotone in fraction, so a 5% carve-out is a
    // strict subset of the 20% one — growing a sample never reshuffles
    // previously selected rows (the property that makes incremental
    // training-data expansion reproducible)
    val s5 = Sampling.sample(ids, $"id", 0.05).collect().map(_.getLong(0)).toSet
    val s20 = Sampling.sample(ids, $"id", 0.20).collect().map(_.getLong(0)).toSet
    assert(s5.subsetOf(s20) && s5.nonEmpty && s20.size > s5.size)
  }

  test("degenerate fractions: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.sample(ids, $"id", 0.0).count() == 0)
    assert(Sampling.sample(ids, $"id", 1.0).count() == 20000)
  }

  test("weightedKeep: per-row rate tracks the weight, clamps, and is layout-independent") {
    // weight 0.25 for even ids, 0.75 for odd — observed rates must track
    val w = when($"id" % 2 === 0, 0.25).otherwise(0.75)
    val kept = Sampling.weightedSample(ids, $"id", w)
    val evenRate = kept.filter($"id" % 2 === 0).count() / 10000.0
    val oddRate = kept.filter($"id" % 2 === 1).count() / 10000.0
    assert(math.abs(evenRate - 0.25) < 0.02, s"even rate $evenRate")
    assert(math.abs(oddRate - 0.75) < 0.02, s"odd rate $oddRate")
    // clamping: weight >= 1 keeps everything, <= 0 keeps nothing
    assert(Sampling.weightedSample(ids, $"id", lit(3.0)).count() == 20000)
    assert(Sampling.weightedSample(ids, $"id", lit(-1.0)).count() == 0)
    // pure key+weight function: survives repartitioning
    val a = kept.collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(ids.repartition(17, $"id" % 3), $"id", w)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // degenerate-fraction consistency with the unweighted path: a
    // constant weight selects the same rows as sample() at that fraction
    // only in distribution, but must at least match its rate closely
    val c = Sampling.weightedSample(ids, $"id", lit(0.1)).count() / 20000.0
    assert(math.abs(c - 0.1) < 0.01, s"const-weight rate $c")
  }

  test("temperature rates: identity is flat, sqrt up-weights small sources, budget holds") {
    // three sources, 9:3:1 natural shares — chosen so no sqrt rate
    // clamps at 1 (tiny's rate is ~0.906 at budget 0.4), keeping the
    // kept-mass identity exact
    val docs = spark.range(26000L).select($"id",
      when($"id" % 13 === 0, "tiny").when($"id" % 13 < 4, "mid")
        .otherwise("big").as("src"))
    val counts = docs.groupBy("src").agg(count(lit(1)).as("n"))

    // α=1 (identity weight): p_i = share_i, so every source's rate is
    // exactly the budget fraction (nano-unit rounding ≤ 1e-9 of drift)
    val flat = Sampling.temperatureRates(counts, "src", "n", 0.4, identity)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    flat.values.foreach(r => assert(math.abs(r - 0.4) < 1e-6, flat.toString))

    // α=0.5: per-doc keep rate strictly increases as sources shrink
    val temp = Sampling.temperatureRates(counts, "src", "n", 0.4, sqrt)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(temp("tiny") > temp("mid") && temp("mid") > temp("big"), temp.toString)
    temp.values.foreach(r => assert(r >= 0.0 && r <= 1.0))

    // expected kept mass ≈ budget·N when nothing clamps at 1
    val n = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = n.map { case (s, c) => temp(s) * c }.sum
    assert(math.abs(expected / 26000.0 - 0.4) < 1e-6, expected.toString)
    // and the realized sample is close to it
    val kept = docs.join(
        Sampling.temperatureRates(counts, "src", "n", 0.4, sqrt), Seq("src"))
      .filter(Sampling.weightedKeep($"id", $"rate", "t")).count()
    assert(math.abs(kept / 26000.0 - 0.4) < 0.02, s"kept $kept")
  }

  test("salt/key boundary pairs hash independently (delimited), empty salt hashes bare key") {
    // bare concatenation would collide (salt "a1", key "2") with
    // (salt "a", key "12") — both md5("a12") — coupling numeric-suffixed
    // fold salts over numeric keys; the ':' delimiter keeps them apart
    val r = spark.range(1).select(
      Sampling.memberHash(lit("2"), "a1").as("h1"),
      Sampling.memberHash(lit("12"), "a").as("h2"),
      Sampling.memberHash(lit("7"), "").as("bare"),
      md5(lit("7")).as("expected")).first()
    assert(r.getString(0) != r.getString(1))
    assert(r.getString(2) == r.getString(3))
  }

  test("foldOf: pure key function — layout-independent, in range, roughly balanced") {
    val n = 20000L
    val base = spark.range(n).select($"id", Sampling.foldOf($"id", 5).as("fold"))
    // every fold in [0, 5), all rows assigned
    assert(base.filter($"fold" < 0 || $"fold" >= 5).isEmpty)
    // identical assignment after an adversarial relayout
    val relaid = spark.range(n).repartition(17, $"id" % 3)
      .select($"id", Sampling.foldOf($"id", 5).as("fold2"))
    assert(base.join(relaid, "id").filter($"fold" =!= $"fold2").isEmpty)
    // md5-uniform: each fold holds ~1/5 within 5% relative
    val counts = base.groupBy("fold").count().collect()
      .map(r => r.getAs[Long]("fold") -> r.getAs[Long]("count")).toMap
    assert(counts.size == 5)
    counts.values.foreach(c => assert(math.abs(c - n / 5.0) < n * 0.05 / 5, counts))
    // distinct salts give independent splits (a fold-0 row under one
    // salt is not preferentially fold 0 under another)
    val cross = spark.range(n).select(
        Sampling.foldOf($"id", 5).as("a"), Sampling.foldOf($"id", 5, "fold2").as("b"))
      .filter($"a" === 0 && $"b" === 0).count()
    assert(math.abs(cross - n / 25.0) < n * 0.2 / 25, cross)
  }

  test("idDraws: k rows per anchor, ids in range, deterministic, ~uniform over the id space") {
    val anchors = spark.range(500).select($"id".as("a"))
    val draws = Sampling.idDraws(anchors, $"a", k = 4, n = 100L)
    assert(draws.count() == 2000)
    assert(draws.filter($"cand_id" < 0 || $"cand_id" >= 100).isEmpty)
    assert(draws.groupBy("anchor").count().filter($"count" =!= 4).isEmpty)
    // repartition changes nothing (pure key function)
    val again = Sampling.idDraws(anchors.repartition(7), $"a", k = 4, n = 100L)
      .withColumnRenamed("cand_id", "cand2")
    assert(draws.join(again, Seq("anchor", "sample_idx"))
      .filter($"cand_id" =!= $"cand2").isEmpty)
    // coarse uniformity: each of the 100 ids drawn ~20 times over 2000
    // draws; chi-square-ish loose bound (no id absent or 3x-hot)
    val counts = draws.groupBy("cand_id").count().collect().map(_.getLong(1))
    assert(counts.length == 100, s"only ${counts.length} distinct ids drawn")
    assert(counts.min >= 5 && counts.max <= 60, s"min ${counts.min} max ${counts.max}")
  }
}
