package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Embeddings, Ivf, Sq}
import graft.sources.Tables

/** Round-17 scale probe for the SQ8 tier: train/encode/search timings
  * and tight-shortlist recall at the given corpus (meant for the sf5
  * replica's ~2.5 M vectors, where the q170/q172/q173 gates — which
  * bound their corpus to 50 K for driver-safe serving collects — no
  * longer exercise scale). Also times the IVF,SQ8 composition at the
  * same budgets. Not part of the driver battery. */
object SqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf5")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding").cache()
    val n = e.count()
    val q = e.filter(col("vec_id") >= 0 && col("vec_id") < 20)

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sq-probe] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val exact = timed(s"exact top-5 ($n rows)") {
      val x = Embeddings.cosineTopK(q, e, "vec_id", "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id").cache()
      x.count(); x
    }
    val nExact = exact.count()
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double =
      exact.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / nExact

    val qz = timed("Sq.train")(Sq.train(e, "embedding", dim = 64))
    val enc = timed("Sq.encode (materialize)") {
      val c = Sq.encode(e, "embedding", qz).cache()
      c.count(); c
    }
    for (shortlist <- Seq(20, 100)) {
      // round-18 (r17 verdict #5 pricing): window-rank shortlist vs the
      // BoundedTopK AGGREGATE (partial combine bounds the shuffle at
      // shortlist·partitions·queries instead of n_corpus·n_queries
      // rows). Measured 4.3-4.5× at 15 M → the aggregate is now the
      // default; the window arm stays measured here.
      var rec = 0.0
      timed(s"Sq.searchReranked WINDOW-shortlist=$shortlist + recall") {
        rec = recallOf(Sq.searchReranked(enc, "vec_id", "embedding", qz,
          q, "vec_id", "embedding", shortlist, topK = 5, dropSelf = true,
          shortlistViaAgg = false))
      }
      println(f"[sq-probe] flat SQ8 WINDOW shortlist=$shortlist recall@5=$rec%.3f")
      var recA = 0.0
      timed(s"Sq.searchReranked AGG-shortlist=$shortlist + recall") {
        recA = recallOf(Sq.searchReranked(enc, "vec_id", "embedding", qz,
          q, "vec_id", "embedding", shortlist, topK = 5, dropSelf = true))
      }
      println(f"[sq-probe] flat SQ8 AGG shortlist=$shortlist recall@5=$recA%.3f")
    }

    val index = timed("Ivf.build nLists=64")(
      Ivf.build(e, "vec_id", "embedding", nLists = 64))
    val encI = timed("Sq.encode(assigned) (materialize)") {
      val c = Sq.encode(index.assigned, index.vecCol, qz).cache()
      c.count(); c
    }
    for (nProbe <- Seq(8, 16); viaAgg <- Seq(false, true)) {
      val arm = if (viaAgg) "AGG" else "WINDOW"
      var rec = 0.0
      timed(s"Sq.ivfSearchReranked $arm nProbe=$nProbe shortlist=100 + recall") {
        rec = recallOf(Sq.ivfSearchReranked(index, qz, encI, q, "vec_id",
          "embedding", nProbe, shortlist = 100, topK = 5, dropSelf = true,
          shortlistViaAgg = viaAgg))
      }
      println(f"[sq-probe] IVF,SQ8 $arm nProbe=$nProbe recall@5=$rec%.3f")
    }
    spark.stop()
  }
}
