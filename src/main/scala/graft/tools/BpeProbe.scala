package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.operators.Bpe
import graft.sources.Tables

/** Dev-only evidence probe for BATCHED distributed BPE training
  * (round-10, verdict #3): the serial branch ran ONE Spark job per
  * merge, so a real 32K–50K-merge vocabulary would pay that many job
  * barriers. The batched branch applies every prefix of the total-
  * ordered pair list that provably replays identically (Bpe.selectBatch
  * — parity proven in BpeSpec), so each pair-count job can retire
  * several merges.
  *
  * Reports, for B merges on the sf-dir documents word histogram forced
  * through the distributed branch: wall seconds, Spark job count, and
  * merges/round for batchSize ∈ {1, 16}. The ratio is corpus-dependent
  * (early English merges share sides heavily; the long tail shares
  * less), which is why this is a measured number in BASELINE.md and not
  * a claimed constant.
  *
  * Usage: runMain graft.tools.BpeProbe [sfDir] [numMerges]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val merges = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.increment()
    })

    val docs = Tables.documents(spark, sfDir)
    var serial: Seq[Bpe.Merge] = null
    for (batch <- Seq(1, 16)) {
      jobs.reset()
      val t0 = System.nanoTime()
      val out = Bpe.train(docs, "text", numMerges = merges,
        localThreshold = 0L, batchSize = batch)
      val sec = (System.nanoTime() - t0) / 1e9
      if (batch == 1) serial = out
      else require(out == serial, "batched != serial — parity broken")
      println(f"BPEPROBE batch=$batch%2d merges=${out.length}%d " +
        f"jobs=${jobs.sum()}%d wall=$sec%.1f s")
    }
    spark.stop()
  }
}
