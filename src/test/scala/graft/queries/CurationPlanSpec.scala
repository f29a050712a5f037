package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, ResolvedHint}
import org.apache.spark.sql.execution.QueryExecution
import graft.{SparkEntry, SparkSpec}

/** Plan-shape guards for the curation tier's scale claims (round-7
  * verdict item 3: the q85/q93/q98 design rationale lived only in
  * comments — these asserts make it regression-proof).
  *
  * The scale story under guard: vocabulary grows with corpus size
  * (Heaps' law), so the tf→df vocabulary joins in q85/q93 must NOT
  * carry a forced broadcast hint — AQE broadcasts while the vocab fits
  * and falls back to a shuffle join when it doesn't. Only the 1-row
  * corpus-total frames are explicitly broadcast. q98's document-
  * frequency window must cost exactly one gram-keyed exchange.
  */
class CurationPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Execute the query's OWN QueryExecution so the AQE plan is final
    * (count() would build a different QueryExecution — see verify
    * notes), then return it for both logical and physical asserts. */
  private def executed(name: String): QueryExecution = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution
  }

  /** The equi-joins (non-cross, with a condition) of the analyzed plan
    * must carry no join hint; exactly one ResolvedHint total — the
    * 1-row corpus-scalar broadcast. */
  private def assertUnhintedVocabJoin(qe: QueryExecution): Unit = {
    val hints = qe.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.length == 1,
      s"expected exactly the 1-row scalar broadcast hint, got ${hints.length}")
    val equiJoins = qe.optimizedPlan.collect {
      case j: Join if j.condition.nonEmpty => j
    }
    assert(equiJoins.nonEmpty, "no equi-join found")
    equiJoins.foreach { j =>
      assert(j.hint == JoinHint.NONE,
        s"vocabulary join must be unhinted (AQE decides), got ${j.hint}")
    }
  }

  test("q85: vocab join is unhinted; AQE picks broadcast at toy scale") {
    val qe = executed("q85_tfidf")
    assertUnhintedVocabJoin(qe)
    // at sf0.001 the vocab is tiny — AQE must turn the unhinted join
    // into a broadcast hash join (the fallback-to-shuffle half of the
    // claim is exactly what a forced hint would destroy; absence of the
    // hint above is its guard)
    val plan = qe.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q93: vocab join is unhinted; AQE picks broadcast at toy scale") {
    val qe = executed("q93_unigram_logprob")
    assertUnhintedVocabJoin(qe)
    val plan = qe.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q98: document-frequency window costs exactly one gram-keyed exchange") {
    // AdaptiveSparkPlan.toString prints Final AND Initial plans — count
    // exchanges in the final section only
    val plan = executed("q98_novelty").executedPlan.toString
      .split("== Initial Plan ==")(0)
    // one exchange hashed on the gram column g (the window), one on
    // doc_id (the per-doc aggregate) — anything more means the gram
    // stream shuffled twice, which at 100 TB doubles the dominant cost
    val gramEx = "Exchange hashpartitioning\\(g#".r.findAllIn(plan).size
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(gramEx == 1, s"gram exchanges = $gramEx\n${plan.take(2000)}")
    assert(hashEx == 2, s"hash exchanges = $hashEx\n${plan.take(2000)}")
  }
}
