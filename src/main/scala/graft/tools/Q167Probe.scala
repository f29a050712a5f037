package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Embeddings, Opq, Pq}

/** Timing decomposition of q167's stages (round-17 perf triage). */
object Q167Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q167-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val path = "/tmp/q167_probe_corpus"
    t("generate+write") {
      graft.sources.SyntheticData.clusteredEmbeddings(spark, 60000L, k = 8, dim = 64)
        .select("vec_id", "embedding")
        .write.mode("overwrite").parquet(path)
    }
    for (rep <- 1 to 2) {
      val e = spark.read.parquet(path)
      val q = e.filter(col("vec_id") < 20)
      def hitsOf(rot: Option[Opq.Rotation], mark: String) = {
        val (er, qr) = rot match {
          case Some(r) => (Opq.rotate(e, "vec_id", "embedding", r),
            Opq.rotate(q, "vec_id", "embedding", r))
          case None => (e, q)
        }
        val cb = t(s"rep$rep $mark train") {
          Pq.train(er, "vec_id", "embedding", m = 8, k = 64) }
        val enc = Pq.encode(er.select("vec_id", "embedding"), "embedding", cb)
        t(s"rep$rep $mark search") {
          Pq.searchReranked(enc, "vec_id", "embedding", cb,
            qr, "vec_id", "embedding", shortlist = 50, topK = 5,
            dropSelf = true)
            .select(col("query_id"), col("neighbor_id"), lit(1).as(mark))
            .count()
        }
      }
      hitsOf(None, "raw")
      val rotP = t(s"rep$rep trainRotation(P)") {
        Opq.trainRotation(e, "embedding", dim = 64, m = 8) }
      hitsOf(Some(rotP), "p")
      val (rotNP, _) = t(s"rep$rep trainRotationNP") {
        Opq.trainRotationNP(e, "vec_id", "embedding", dim = 64, m = 8,
          k = 64, iters = 8) }
      hitsOf(Some(rotNP), "np")
      t(s"rep$rep exact") {
        Embeddings.cosineTopK(q, e, "vec_id", "vec_id", "embedding", k = 5)
          .count()
      }
    }
    spark.stop()
  }
}
