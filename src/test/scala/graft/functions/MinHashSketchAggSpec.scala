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

  test("raw (unreduced, negative) hashes: Aggregator and column form still agree") {
    // the out-of-contract input both forms must now survive identically:
    // raw xxhash64 output spans the full signed 64-bit range; both sides
    // defensively reduce mod P before the affine step, so the ONE-
    // contract equivalence holds for raw hashes too, not just
    // tokenHashesMod output
    val raw = Seq(Long.MinValue, -1L, 0L, Long.MaxValue,
      -987654321098765L, 1234567890123456789L)
    val viaAgg = raw.toDS()
      .select(new MinHashSketchAgg(32, 42L).toColumn).head()
    val viaColumn = Seq(raw).toDF("all")
      .select(Dedup.minHashFromShingles(col("all"), 32, 42L)).head()
      .getSeq[Long](0).toArray
    assert(viaAgg.toSeq == viaColumn.toSeq)
    // and the reduced-equivalent input yields the same signature
    val reduced = raw.map(h => java.lang.Math.floorMod(h, Dedup.MersenneP))
    val viaReduced = reduced.toDS()
      .select(new MinHashSketchAgg(32, 42L).toColumn).head()
    assert(viaAgg.toSeq == viaReduced.toSeq)
  }

  test("Tagged(side) equals the unfiltered aggregator over the side's hash stream") {
    // tagged rows: (in_a, in_b, h) — side 0 folds rows with in_a=1,
    // side 1 folds rows with in_b=1; each must equal MinHashSketchAgg
    // over the equivalent pre-filtered stream
    val rows: Seq[(Int, Int, Long)] = (0L until 2000L).map { h =>
      ((h % 2).toInt, (h % 3 == 0, h % 2 == 1) match {
        case (true, _) => 1; case (_, true) => 1; case _ => 0
      }, h * 2654435761L % Dedup.MersenneP)
    }
    val ds = rows.toDS()
    for (side <- Seq(0, 1)) {
      val tagged = ds.select(
        new MinHashSketchAgg.Tagged(64, 42L, side).toColumn).head()
      val filtered = ds
        .filter(t => (if (side == 0) t._1 else t._2) == 1).map(_._3)
        .select(new MinHashSketchAgg(64, 42L).toColumn).head()
      assert(tagged.toSeq == filtered.toSeq, s"side $side")
    }
  }

  test("TaggedSum picks reproduce filtered count semantics, including empty input") {
    val rows: Seq[(Int, Int, Long)] = Seq((1, 0, 10L), (0, 1, 20L),
      (1, 1, 30L), (0, 0, 40L), (1, 0, 50L))
    val ds = rows.toDS()
    def sumOf(pick: ((Int, Int, Long)) => Long): Long =
      ds.select(new MinHashSketchAgg.TaggedSum(pick).toColumn).head()
    assert(sumOf(t => t._1.toLong) == 3L)              // |A| membership count
    assert(sumOf(t => t._2.toLong) == 2L)              // |B|
    assert(sumOf(t => (t._1 & t._2).toLong) == 1L)     // |A ∩ B|
    // empty input: zero, not null/NaN (q97's empty-corpus path)
    val empty = spark.emptyDataset[(Int, Int, Long)]
    assert(empty.select(new MinHashSketchAgg.TaggedSum(_._1.toLong).toColumn)
      .head() == 0L)
    // Tagged over empty input yields the zero sketch (all-P sentinel)
    val zeroSk = empty.select(
      new MinHashSketchAgg.Tagged(16, 42L, 0).toColumn).head()
    assert(zeroSk.toSeq == Seq.fill(16)(Dedup.MersenneP))
  }
}
