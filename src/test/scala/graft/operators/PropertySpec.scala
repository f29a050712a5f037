package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec
import graft.serve.RiskScore
import graft.queries.Util.addCols

/** Property-based invariants (SURVEY.md §5.3) over generated event sets:
  * cumulative-max monotonicity, first-flag totals, split partitioning,
  * blend bounds, sequence counts. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val C = BehaviorWindows.Cols()

  /** Deterministic ScalaCheck sampling (no scalatest bridge in the
    * offline cache): evaluate the generator at n fixed seeds. */
  private def forAll[A](gen: Gen[A], n: Int = 5)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      val a = gen.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(1234L + 7919L * i)).get
      f(a)
    }

  private val eventsGen: Gen[Seq[(Long, Timestamp, Long, Double)]] = for {
    n <- Gen.choose(20, 120)
    rows <- Gen.sequence[Seq[(Long, Timestamp, Long, Double)], (Long, Timestamp, Long, Double)](
      (0 until n).map { i =>
        for {
          user <- Gen.choose(0L, 6L)
          offSec <- Gen.choose(0L, 500000L)
          value <- Gen.choose(1, 100000).map(_ / 100.0)
        } yield (i.toLong, new Timestamp(1700000000000L + offSec * 1000L), user, value)
      })
  } yield rows

  test("cum_max is monotone non-decreasing per user; is_first sums to #users") {
    forAll(eventsGen) { rows =>
      val df = rows.toDF("event_id", "ts", "user_id", "value")
      val out = addCols(df, BehaviorWindows.cumulativeFeatures(C))
      val violations = out.select($"user_id", $"ts", $"event_id", $"cum_max")
        .withColumn("prev", lag($"cum_max", 1)
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"ts", $"event_id")))
        .filter($"prev".isNotNull && $"cum_max" < $"prev")
        .count()
      assert(violations == 0)
      val nUsers = df.select("user_id").distinct().count()
      val firstSum = out.agg(sum($"is_first")).first().getLong(0)
      assert(firstSum == nUsers)
    }
  }

  test("time split partitions every row exactly once with exact counts") {
    forAll(eventsGen) { rows =>
      val df = rows.toDF("event_id", "ts", "user_id", "value")
      val n = rows.size
      val counts = TimeSplit.assign(df, $"ts", $"event_id")
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.values.sum == n)
      assert(counts.getOrElse("train", 0L) == math.floor(0.7 * n).toLong)
    }
  }

  test("blended risk score stays in [0,1] for any model/heuristic inputs") {
    forAll(Gen.listOfN(30, for {
      m <- Gen.choose(-2.0, 3.0) // even out-of-range model scores
      h <- Gen.choose(0.0, 1.0)
    } yield (m, h))) { pairs =>
      val df = pairs.toDF("m", "h")
      val r = df.select(RiskScore.blend($"m", $"h").as("b"))
        .agg(min($"b"), max($"b")).first()
      assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0)
    }
  }

  test("sequence count per user = max(0, n_u - L + 1) for users with n_u >= minEvents") {
    forAll(eventsGen) { rows =>
      val df = rows.toDF("event_id", "ts", "user_id", "value")
      val perUser = rows.groupBy(_._3).view.mapValues(_.size).toMap
      val expected = perUser.values.filter(_ >= 5)
        .map(n => math.max(0, n - 3 + 1)).sum
      val got = Sequences.sliding(df, C, Seq("value"), len = 3, minEvents = 5).count()
      assert(got == expected)
    }
  }

  test("salted aggregation equals plain aggregation on arbitrary data") {
    forAll(eventsGen) { rows =>
      val df = rows.toDF("event_id", "ts", "user_id", "value")
      val plain = df.groupBy("user_id").agg(count(lit(1)), sum($"value"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val salted = Salting.saltedAgg(df, "user_id", "event_id", "value", nSalts = 4)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(salted.keySet == plain.keySet)
      salted.foreach { case (k, (n, s)) =>
        assert(n == plain(k)._1 && math.abs(s - plain(k)._2) < 1e-9)
      }
    }
  }
}
