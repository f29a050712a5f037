package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints formatted physical plans for representative
  * queries so shuffle count, pushdown, broadcast choice, and codegen
  * spans can be inspected (SURVEY.md §4 checklist). */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSet
      else Set("q02_filter_project", "q20_cum_features", "q11_join_multiway",
        "q13_target_encoding", "q03_topk_users")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => names.contains(q._1))
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        fn(spark, dir).explain("formatted")
      }
    spark.stop()
  }
}
