package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketing for co-located joins (SURVEY.md §4 / builder checklist):
  * two tables bucketed on the join key by the same bucket count join
  * WITHOUT a shuffle — the scale pattern for repeated fact-fact joins.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join with zero exchanges") {
    val a = (1 to 1000).map(i => (i.toLong % 100, i.toDouble)).toDF("k", "x")
    val b = (1 to 500).map(i => (i.toLong % 100, s"v$i")).toDF("k", "v")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_b")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      // disable broadcast so the join must pick SMJ — bucketing should
      // satisfy its distribution requirement with no Exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
