package graft

import org.apache.spark.sql.functions._

/** Physical-plan contracts for the round-5 event-analytics queries —
  * each scaladoc makes a specific scale claim (exchange counts, no
  * joins, broadcast sides); these pins keep the claims true.
  */
class EventAnalyticsPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf).queryExecution.executedPlan.toString

  private def countOf(pattern: String, p: String): Int = pattern.r.findAllIn(p).size

  test("t_funnel_stages: one user_id exchange feeds all three Window passes and the collapse") {
    val p = plan("t_funnel_stages")
    assert(!p.contains("Join"), s"funnel must not plan a join:\n$p")
    assert(countOf("Exchange hashpartitioning", p) == 1,
      s"funnel must shuffle exactly once on user_id:\n$p")
    assert(countOf("\\bWindow\\b", p) >= 3, s"three chained window minima expected:\n$p")
  }

  test("t_retention_cohorts: first-seen aggregate broadcasts onto the raw event scan") {
    val p = plan("t_retention_cohorts")
    assert(p.contains("BroadcastHashJoin"),
      s"the |users|-sized first-seen agg must broadcast, not sort-merge:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t_peak_concurrency: sweep-line is windows over one key exchange, no interval self-join") {
    val p = plan("t_peak_concurrency")
    assert(!p.contains("Join"), s"sweep-line must not plan an interval join:\n$p")
    // one exchange for the custkey windows, one for the final per-key
    // collapse at most — never a quadratic expansion
    assert(countOf("Exchange hashpartitioning", p) <= 2, p)
  }

  test("t_rolling_distinct_users: coverage expansion plans no self-join") {
    val p = plan("t_rolling_distinct_users")
    assert(!p.contains("Join"), s"rolling distinct must expand, not self-join:\n$p")
  }

  test("t_session_paths: sessionize + gather + path count stay join-free") {
    val p = plan("t_session_paths")
    assert(!p.contains("Join"), s"session paths must not plan a join:\n$p")
  }
}
