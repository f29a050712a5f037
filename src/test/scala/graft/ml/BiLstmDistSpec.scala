package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed parameter-averaged BiLSTM training: layout-independent
  * by construction (hash routing + in-partition sort + pid-ordered
  * average), degenerates to the driver loop at parts=1, and holds the
  * same accuracy bar as driver training on the spike task. */
class BiLstmDistSpec extends SparkSpec {
  import spark.implicits._

  private def spikeData(n: Int, seedOffset: Int): Seq[(Long, Seq[Seq[Double]], Double, Double)] = {
    val rnd = new scala.util.Random(3 + seedOffset)
    val T = 6
    (0 until n).map { i =>
      val label = i % 2
      val s = Array.fill(T, 1)(rnd.nextGaussian() * 0.3)
      if (label == 1) s(rnd.nextInt(T))(0) = 3.0 + rnd.nextDouble()
      (i.toLong, s.map(_.toSeq).toSeq, label.toDouble, 1.0)
    }
  }

  test("parts=1, rounds=1 equals driver trainBatched on the id-sorted stream") {
    val data = spikeData(60, 0)
    val df = data.toDF("id", "seq", "label", "weight")
    val dist = BiLstm.trainDistributed(df, "seq", "label", "weight", "id",
      dim = 1, hidden = 4, attDim = 3, parts = 1, rounds = 1,
      localEpochs = 8, lr = 0.05, batchSize = 16, seed = 9L)
    val sortedLocal = data.sortBy(_._1).map { case (_, s, y, w) =>
      (s.map(_.toArray).toArray, y, w)
    }.toIndexedSeq
    val driver = BiLstm.trainBatched(() => sortedLocal.iterator, 1, 4, 3,
      epochs = 8, lr = 0.05, seed = 9L, batchSize = 16)
    assert(dist.params.sameElements(driver.params),
      "one shard, one round must reproduce the driver loop bit-for-bit")
  }

  test("result is bit-identical across input layouts (hash routing fixes the shards)") {
    val df = spikeData(120, 1).toDF("id", "seq", "label", "weight")
    def run(d: org.apache.spark.sql.DataFrame) =
      BiLstm.trainDistributed(d, "seq", "label", "weight", "id",
        dim = 1, hidden = 4, attDim = 3, parts = 4, rounds = 2,
        localEpochs = 4, lr = 0.05, batchSize = 16, seed = 9L)
    val a = run(df.repartition(1))
    val b = run(df.repartition(13, col("label")).sortWithinPartitions(desc("id")))
    assert(a.params.sameElements(b.params),
      "shards are pure functions of the data — input layout must not matter")
  }

  test("parameter averaging learns the spike task to the driver-training bar") {
    val train = spikeData(240, 2)
    val test = spikeData(80, 3)
    val m = BiLstm.trainDistributed(train.toDF("id", "seq", "label", "weight"),
      "seq", "label", "weight", "id", dim = 1, hidden = 6, attDim = 4,
      parts = 4, rounds = 10, localEpochs = 12, lr = 0.05, batchSize = 16,
      seed = 5L)
    val acc = test.count { case (_, s, y, _) =>
      (BiLstm.forwardProb(m, s.map(_.toArray).toArray) >= 0.5) == (y >= 0.5)
    }.toDouble / test.size
    assert(acc >= 0.9, s"parameter-averaged accuracy $acc")
  }
}
