package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Misra–Gries guarantees, driven both as plain Scala (property sweep
  * over random streams and random merge trees) and through a Spark
  * typed aggregation (partition-layout independence of the flags). */
class FreqSketchAggSpec extends AnyFunSuite {

  private def check(agg: FreqSketchAgg, k: Int, stream: Seq[String],
                    summary: Map[String, Long]): Unit = {
    val n = stream.size
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n.toDouble / (k + 1)
    assert(summary.size <= k, s"summary exceeded k: ${summary.size} > $k")
    exact.foreach { case (x, t) =>
      val est = summary.getOrElse(x, 0L)
      assert(est <= t, s"overestimate for $x: $est > $t")
      assert(est >= t - bound, s"underestimate beyond N/(k+1) for $x: $est < $t - $bound")
      if (t > bound) assert(summary.contains(x), s"guaranteed-heavy $x missing")
    }
  }

  private def skewedStream(rnd: Random, n: Int): Seq[String] =
    Seq.fill(n) {
      val r = rnd.nextInt(100)
      if (r < 30) "hot_a" else if (r < 50) "hot_b"
      else s"cold_${rnd.nextInt(5000)}"
    }

  test("single-pass reduce: heavy items present, error within N/(k+1)") {
    val rnd = new Random(7)
    for (k <- Seq(2, 8, 64); trial <- 1 to 3) {
      val agg = new FreqSketchAgg(k)
      val stream = skewedStream(rnd, 2000 + trial * 517)
      val summary = stream.foldLeft(agg.zero)(agg.reduce)
      check(agg, k, stream, summary)
    }
  }

  test("arbitrary merge trees keep the guarantees (mergeable summaries)") {
    val rnd = new Random(11)
    val k = 8
    val agg = new FreqSketchAgg(k)
    for (_ <- 1 to 5) {
      val stream = skewedStream(rnd, 4000)
      // random partitioning into 2-9 chunks, pairwise merged in random order
      val chunks = stream.grouped(stream.size / (2 + rnd.nextInt(8)) + 1).toSeq
      var summaries = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      while (summaries.size > 1) {
        val i = rnd.nextInt(summaries.size - 1)
        summaries = summaries.patch(i, Seq(agg.merge(summaries(i), summaries(i + 1))), 2)
      }
      check(agg, k, stream, summaries.head)
    }
  }

  test("exact below k distinct; empty stream yields empty summary") {
    val agg = new FreqSketchAgg(16)
    val stream = Seq("a", "b", "a", "c", "a", "b")
    val summary = stream.foldLeft(agg.zero)(agg.reduce)
    assert(summary == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(agg.finish(agg.zero).isEmpty)
  }

  test("through Spark: flags identical at 1 and 7 partitions") {
    val spark = SparkSpec.session
    import spark.implicits._
    val rnd = new Random(13)
    val stream = skewedStream(rnd, 3000)
    val k = 8
    val agg = new FreqSketchAgg(k)
    val bound = stream.size.toDouble / (k + 1)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7)) {
      val summary = spark.createDataset(stream).repartition(parts)
        .select(agg.toColumn.name("s")).as[Map[String, Long]].head()
      check(agg, k, stream, summary)
      // the deterministic surface: which guaranteed-heavy keys are found
      val heavy = exact.filter(_._2 > bound).keySet
      assert(heavy.subsetOf(summary.keySet))
      assert(heavy == Set("hot_a", "hot_b"))
    }
  }
}
