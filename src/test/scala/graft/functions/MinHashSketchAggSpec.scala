package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

class MinHashSketchAggSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator sketch equals the column-form signature over the same shingle hashes") {
    // one MinHash contract: the typed Aggregator and
    // Dedup.minHashFromShingles must produce the identical signature for
    // the same (k, seed) over the same hash multiset
    val docs = Seq((1L, "a b c d e f g"), (2L, "c d e f g h i"))
      .toDF("doc_id", "text")
    val hashes = docs
      .select(Dedup.tokenHashesMod(col("text")).as("th"))
      .select(Dedup.shingleCombine(col("th"), 3).as("sh"))
      .select(explode(col("sh")).as("h"))
    val viaAgg = hashes.as[Long]
      .select(new MinHashSketchAgg(32, 42L).toColumn).head()
    val viaColumn = hashes.agg(collect_list(col("h")).as("all"))
      .select(Dedup.minHashFromShingles(col("all"), 32, 42L)).head()
      .getSeq[Long](0).toArray
    assert(viaAgg.toSeq == viaColumn.toSeq)
  }

  test("merge is elementwise min: sketch(A union B) == merge(sketch(A), sketch(B))") {
    val a = spark.range(0L, 3000L).map(_ % 2147483647L)
    val b = spark.range(2000L, 5000L).map(_ % 2147483647L)
    val agg = new MinHashSketchAgg(64, 7L)
    val skA = a.select(agg.toColumn).head()
    val skB = b.select(agg.toColumn).head()
    val skU = a.union(b).select(agg.toColumn).head()
    assert(skU.toSeq == skA.zip(skB).map { case (x, y) => math.min(x, y) }.toSeq)
  }

  test("estimate tracks the true Jaccard within sampling error") {
    // sets 0..999 and 500..1499: J = 500/1500 = 1/3; k=256 -> sd ~ 0.03
    val agg = new MinHashSketchAgg(256, 42L)
    val skA = spark.range(0L, 1000L).as[Long].select(agg.toColumn).head()
    val skB = spark.range(500L, 1500L).as[Long].select(agg.toColumn).head()
    val est = MinHashSketchAgg.estimate(skA, skB)
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"est $est")
    // identical corpora estimate 1.0 exactly; disjoint ones near 0
    assert(MinHashSketchAgg.estimate(skA, skA) == 1.0)
    val skC = spark.range(100000L, 101000L).as[Long].select(agg.toColumn).head()
    assert(MinHashSketchAgg.estimate(skA, skC) < 0.1)
  }

  test("partition-layout independence: repartitioned input yields the same sketch") {
    val agg = new MinHashSketchAgg(64, 42L)
    val base = spark.range(0L, 10000L).as[Long]
    val s1 = base.select(agg.toColumn).head()
    val s2 = base.repartition(17).as[Long].select(agg.toColumn).head()
    assert(s1.toSeq == s2.toSeq)
  }
}
