package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** The hand-derived BPTT gradient is PROVEN against central-difference
  * numeric differentiation — every parameter of every block (both LSTM
  * directions, attention, readout) on random sequences. A wrong sign or
  * a missed term anywhere in the backward pass fails here at 1e-4
  * relative tolerance. */
class BiLstmSpec extends AnyFunSuite {

  private def numericGrad(m: BiLstmModel, data: Seq[(Array[Array[Double]], Double, Double)],
                          j: Int, eps: Double = 1e-6): Double = {
    def lossAt(delta: Double): Double = {
      val p2 = m.params.clone(); p2(j) += delta
      val m2 = new BiLstmModel(m.dim, m.hidden, m.attDim, p2)
      data.map { case (s, y, w) =>
        val p = BiLstm.forwardProb(m2, s)
        -w * (y * math.log(p + 1e-12) + (1 - y) * math.log(1 - p + 1e-12))
      }.sum
    }
    (lossAt(eps) - lossAt(-eps)) / (2 * eps)
  }

  test("analytic BPTT gradient == numeric gradient, every parameter") {
    val rnd = new scala.util.Random(7)
    val dim = 2; val h = 3; val a = 2; val T = 4
    val m = BiLstm.init(dim, h, a, seed = 11L)
    val data = Seq.tabulate(3) { i =>
      (Array.fill(T, dim)(rnd.nextGaussian()), (i % 2).toDouble, 1.0 + 0.5 * i)
    }
    val grad = new Array[Double](m.params.length)
    data.foreach { case (s, y, w) => BiLstm.gradOne(m, s, y, w, grad) }
    var worst = 0.0; var worstJ = -1
    var j = 0
    while (j < m.params.length) {
      val num = numericGrad(m, data, j)
      val rel = math.abs(grad(j) - num) / math.max(1e-6, math.max(math.abs(num), math.abs(grad(j))))
      if (rel > worst) { worst = rel; worstJ = j }
      j += 1
    }
    assert(worst < 1e-4, s"worst relative gradient error $worst at param $worstJ")
  }

  test("training separates an attention-demanding sequence task") {
    // label = 1 iff a spike appears ANYWHERE in the sequence — position
    // invariance is what attention buys over a last-step readout
    val rnd = new scala.util.Random(3)
    val T = 6
    def mk(label: Int): (Array[Array[Double]], Double, Double) = {
      val s = Array.fill(T, 1)(rnd.nextGaussian() * 0.3)
      if (label == 1) s(rnd.nextInt(T))(0) = 3.0 + rnd.nextDouble()
      (s, label.toDouble, 1.0)
    }
    val train = IndexedSeq.tabulate(120)(i => mk(i % 2))
    val test = IndexedSeq.tabulate(40)(i => mk(i % 2))
    val m = BiLstm.train(train, dim = 1, hidden = 6, attDim = 4,
      epochs = 120, lr = 0.05, seed = 5L)
    val acc = test.count { case (s, y, _) =>
      (BiLstm.forwardProb(m, s) >= 0.5) == (y >= 0.5)
    }.toDouble / test.size
    assert(acc >= 0.9, s"accuracy $acc")
  }

  test("training is deterministic for a fixed seed and input order") {
    val rnd = new scala.util.Random(9)
    val data = IndexedSeq.tabulate(20) { i =>
      (Array.fill(4, 1)(rnd.nextGaussian()), (i % 2).toDouble, 1.0)
    }
    val a = BiLstm.train(data, 1, 4, 3, epochs = 10, seed = 1L)
    val b = BiLstm.train(data, 1, 4, 3, epochs = 10, seed = 1L)
    assert(a.params.sameElements(b.params))
  }

  test("trainBatched at batchSize >= n is bit-identical to full-batch train") {
    val rnd = new scala.util.Random(13)
    val data = IndexedSeq.tabulate(24) { i =>
      (Array.fill(4, 1)(rnd.nextGaussian()), (i % 2).toDouble, 1.0 + 0.1 * (i % 3))
    }
    val full = BiLstm.train(data, 1, 4, 3, epochs = 12, seed = 2L)
    val streamed = BiLstm.trainBatched(() => data.iterator, 1, 4, 3,
      epochs = 12, lr = 0.05, seed = 2L, batchSize = data.length + 7)
    assert(full.params.sameElements(streamed.params),
      "one-batch-per-epoch streaming must reproduce the full-batch loop exactly")
  }

  test("trainBatched is deterministic per batch size and still learns at batch 16") {
    val rnd = new scala.util.Random(21)
    val T = 6
    def mk(label: Int): (Array[Array[Double]], Double, Double) = {
      val s = Array.fill(T, 1)(rnd.nextGaussian() * 0.3)
      if (label == 1) s(rnd.nextInt(T))(0) = 3.0 + rnd.nextDouble()
      (s, label.toDouble, 1.0)
    }
    val train = IndexedSeq.tabulate(120)(i => mk(i % 2))
    val test = IndexedSeq.tabulate(40)(i => mk(i % 2))
    def run() = BiLstm.trainBatched(() => train.iterator, 1, 6, 4,
      epochs = 40, lr = 0.05, seed = 5L, batchSize = 16)
    val (m1, m2) = (run(), run())
    assert(m1.params.sameElements(m2.params), "same batch size twice must agree")
    val acc = test.count { case (s, y, _) =>
      (BiLstm.forwardProb(m1, s) >= 0.5) == (y >= 0.5)
    }.toDouble / test.size
    assert(acc >= 0.9, s"minibatch accuracy $acc")
  }
}
