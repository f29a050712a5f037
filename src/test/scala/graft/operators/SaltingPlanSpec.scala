package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

class SaltingPlanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = (1 to 2000).map(i =>
    (i.toLong, if (i <= 1800) "hot" else s"k${i % 20}", i.toDouble))
    .toDF("id", "key", "value")

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("value").as("total"),
        min("value").as("min_value"), max("value").as("max_value"))
      .withColumn("avg_value", $"total" / $"n")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val salted = Salting.saltedAgg(skewed, "key", "id", "value")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "tag")
    val plain = skewed.join(dim, Seq("key")).agg(count(lit(1)), sum($"value")).first()
    val salted = Salting.saltedJoin(skewed, dim, "key", "id")
      .agg(count(lit(1)), sum($"value")).first()
    assert(salted == plain)
  }

  // -- plan-shape regression guards (SURVEY.md §4 checklist) ---------------

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("q02: filters are pushed into the parquet scan") {
    val p = planOf("q02_filter_project")
    // (plan strings elide long filter lists, so match the stable prefix)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity), GreaterThanOrEqual(l_shipdate"), p)
  }

  test("q11: all three dims join as broadcast hash joins") {
    val p = planOf("q11_join_multiway")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
  }

  test("q03: top-k runs as TakeOrderedAndProject, not a global sort") {
    val p = planOf("q03_topk_users")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q20: all cumulative window features share ONE hash exchange") {
    val p = planOf("q20_cum_features")
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("entry(): cumulative + lag window families share one exchange") {
    val p = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q90: the entire 28-col feature matrix runs off ONE hash exchange") {
    val p = planOf("q90_full_features")
    // hashpartitioning(user_id) satisfies the (user_id, event_type)
    // window's clustering too — every window family shares the exchange
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q13: target encoding applies as a broadcast join (no fact shuffle)") {
    val p = planOf("q13_target_encoding")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("AQE splits the hot partition of a skewed sort-merge join (skew=true)") {
    // manual salting above is the deterministic fix; this demonstrates the
    // runtime alternative — AQE detecting and splitting the hot partition.
    // Thresholds are shrunk so the ~90%-one-key join qualifies at test size.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // payload must be incompressible and id-derived: a constant pad is
      // (a) constant-folded out of the shuffle and (b) lz4-compressed to
      // nothing, so the hot partition's shuffle bytes never cross the
      // skew threshold
      def pad(c: org.apache.spark.sql.Column) = concat(
        md5(c.cast("string")), md5((c + 1).cast("string")),
        md5((c + 2).cast("string")), md5((c + 3).cast("string")))
      val left = spark.range(40000L).select(
        when($"id" < 36000L, 0L).otherwise($"id").as("k"), pad($"id").as("p1"))
      val right = spark.range(2000L).select(($"id" % 200L).as("k"), pad($"id").as("p2"))
      val joined = left.join(right, "k")
      // collect() executes joined's OWN QueryExecution (count() would
      // build a different one, leaving this plan un-finalized)
      assert(joined.collect().nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
