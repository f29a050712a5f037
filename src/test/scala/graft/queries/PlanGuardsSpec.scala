package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

import graft.SparkSpec

/** Battery-wide physical-plan invariants (round-12 verdict #5: the
  * no-single-reducer guarantee was proven by Verify-log inspection —
  * `WindowExec: No Partition Defined` grep — once; a spec keeps it
  * true). Every registered SparkEntry query's plan must contain:
  *
  *  - ZERO unpartitioned WindowExec / WindowGroupLimitExec — the
  *    single-reducer shape that serializes the whole input through one
  *    task at 100 TB. Global ranks go through the bucketed construction
  *    (`Util.rankGate`) or the bounded local-relation rank
  *    (`GlobalRank.zipIndexed`).
  *  - ZERO CartesianProductExec — the repo's only cross joins are
  *    broadcast 1-row bound frames, which plan as
  *    BroadcastNestedLoopJoin (fine: n·1 rows map-side), never as the
  *    partition-pair materializing CartesianProduct.
  *
  * Plans are inspected at `queryExecution.executedPlan` WITHOUT
  * collecting the result — planning is enough to expose both shapes
  * (AQE re-plans exchanges at runtime but never introduces windows or
  * cartesian joins). Builder-side eager work (model training, HTTP
  * round trips, streaming runs) still executes; the walk flattens
  * through AQE wrappers, query stages, cached relations, and subquery
  * expressions so nothing hides behind a stage boundary.
  */
class PlanGuardsSpec extends SparkSpec {

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val expanded: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
      case _ => Seq.empty
    }
    p +: (p.children ++ expanded ++ p.subqueries).flatMap(walk)
  }

  // shared sf0.001 fixture (round-13 advice: the other specs' scale —
  // plan SHAPES are scale-independent, and the builder-side eager work
  // some queries do at construction is ~10× cheaper here), one test
  // PER QUERY so a single builder failure names its query instead of
  // masking the rest of the battery
  private val dir = "/root/testdata/sf0.001"

  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: zero unpartitioned windows, zero cartesian products") {
      val plan = fn(spark, dir).queryExecution.executedPlan
      val violations = walk(plan).collect {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          s"unpartitioned WindowExec (${w.windowExpression.mkString(", ")})"
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
          "unpartitioned WindowGroupLimitExec"
        case _: CartesianProductExec => "CartesianProductExec"
      }
      assert(violations.isEmpty,
        s"single-reducer / cartesian shapes in $name:\n${violations.mkString("\n")}")
    }
  }
}
