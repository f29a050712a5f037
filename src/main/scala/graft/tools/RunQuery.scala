package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc query runner for local iteration:
  * `runMain graft.tools.RunQuery q70 [sfDir]` executes the named
  * query/queries and prints up to 20 result rows.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val prefix = args.headOption.getOrElse("q01")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.filter(_._1.startsWith(prefix)).foreach { case (n, fn) =>
      println(s"=== $n ===")
      fn(spark, sfDir).show(20, false)
    }
    spark.stop()
  }
}
