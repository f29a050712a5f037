package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(left: org.apache.spark.sql.DataFrame,
                    right: org.apache.spark.sql.DataFrame,
                    lo: Long, hi: Long) =
    left.join(right, Seq("k"))
      .filter(col("rts") >= col("lts") + lo && col("rts") <= col("lts") + hi)

  test("banded interval join equals the naive equi-join + range filter") {
    // keys with dense, sparse, and empty right sides; ts values straddle
    // bucket boundaries on purpose (w = hi - lo = 100)
    val left = (1 to 200).map(i => (i % 7, i.toLong * 37, i))
      .toDF("k", "lts", "lid")
    val right = (1 to 300).map(j => (j % 5, j.toLong * 23, j))
      .toDF("k", "rts", "rid")
    for ((lo, hi) <- Seq((0L, 100L), (1L, 101L), (-50L, 50L), (-100L, -1L))) {
      val banded = RangeJoin.bandedIntervalJoin(left, right, "k", "lts", "rts", lo, hi)
        .select("lid", "rid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val expected = naive(left, right, lo, hi)
        .select("lid", "rid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(banded == expected, s"mismatch at lo=$lo hi=$hi")
      assert(expected.nonEmpty, s"vacuous case at lo=$lo hi=$hi") // the test must test something
    }
  }

  test("banded interval join emits no duplicate pairs") {
    val left = (1 to 50).map(i => (1, i.toLong * 10, i)).toDF("k", "lts", "lid")
    val right = (1 to 50).map(j => (1, j.toLong * 10, j)).toDF("k", "rts", "rid")
    val out = RangeJoin.bandedIntervalJoin(left, right, "k", "lts", "rts", 0L, 100L)
      .select("lid", "rid").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.length == out.toSet.size) // left bucket list is distinct by construction
  }
}
