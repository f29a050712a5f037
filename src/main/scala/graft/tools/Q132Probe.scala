package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: invoke q132/q135 twice and time each phase to verify the
  * weights memo hits on the second invocation. */
object Q132Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q132_bilstm", "q135_bilstm_dist"); i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"$q rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
