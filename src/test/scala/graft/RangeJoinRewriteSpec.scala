package graft

import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The optimizer-rule tier: a plain BETWEEN join (no equi-key) written
  * by a user must come out of GraftExtensions as a bucketed equi-join,
  * with identical results to the nested-loop plan it replaces.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def intervals: DataFrame = Seq(
    (1L, ts("2024-01-01 00:10:00"), ts("2024-01-01 03:20:00")),
    (2L, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:00:00")),
    (3L, ts("2024-02-01 00:00:00"), ts("2024-02-01 00:30:00"))
  ).toDF("iv_id", "lo", "hi")

  private def probes: DataFrame = Seq(
    (100L, ts("2024-01-01 00:10:00")),
    (101L, ts("2024-01-01 03:20:00")),
    (102L, ts("2024-01-01 01:00:00")),
    (103L, ts("2024-01-01 03:20:01")),
    (104L, ts("2023-12-31 23:59:59"))
  ).toDF("p_id", "p_ts")

  private def betweenJoin: DataFrame =
    probes.join(intervals, col("p_ts") >= col("lo") && col("p_ts") <= col("hi"))

  test("BETWEEN join rewrites to a bucket equi-join with identical results") {
    val df   = betweenJoin
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"rewrite did not fire — still a nested loop:\n$plan")
    assert(plan.contains("__graft_bk"), s"expected the rewrite's bucket key in:\n$plan")
    val got = df.select("iv_id", "p_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (1L, 101L), (1L, 102L), (2L, 102L)))
  }

  test("disabled by conf, the same join is the nested loop Spark would plan anyway") {
    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try {
      val plan = betweenJoin.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), s"expected the stock plan:\n$plan")
      val got = betweenJoin.select("iv_id", "p_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 100L), (1L, 101L), (1L, 102L), (2L, 102L)))
    } finally spark.conf.unset(RangeJoinRewrite.EnabledKey)
  }

  test("joins that already have an equi-key are left untouched") {
    val l = Seq((1L, ts("2024-01-01 01:00:00"))).toDF("k", "ts1")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00"))).toDF("k2", "lo", "hi")
    val df = l.join(r, col("k") === col("k2") && col("ts1") >= col("lo") && col("ts1") <= col("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_bk"), s"rule must not touch equi-joins:\n$plan")
    assert(df.count() == 1L)
  }

  test("inverted and null-bound intervals yield no rows instead of crashing") {
    val iv = Seq(
      (10L, Some(ts("2024-01-01 05:00:00")), Some(ts("2024-01-01 01:00:00"))), // lo > hi
      (11L, None, Some(ts("2024-01-01 06:00:00"))),                            // null lo
      (12L, Some(ts("2024-01-01 00:00:00")), Some(ts("2024-01-01 06:00:00")))  // sane
    ).toDF("iv_id", "lo", "hi")
    val pr = Seq((200L, ts("2024-01-01 03:00:00"))).toDF("p_id", "p_ts")
    val df = pr.join(iv, col("p_ts") >= col("lo") && col("p_ts") <= col("hi"))
    assert(df.queryExecution.executedPlan.toString.contains("__graft_bk"))
    // only the sane interval matches; inverted + null-bound drop silently
    assert(df.select("iv_id", "p_id").as[(Long, Long)].collect().toSet == Set((12L, 200L)))
  }

  test("DATE-typed bounds rewrite too (date-date comparisons skip the analyzer's cast)") {
    val iv = Seq(
      (1L, "2024-01-10", "2024-01-20"),
      (2L, "2024-03-01", "2024-03-02")
    ).toDF("iv_id", "lo_s", "hi_s")
      .select(col("iv_id"), to_date(col("lo_s")).as("lo"), to_date(col("hi_s")).as("hi"))
    val pr = Seq((300L, "2024-01-15"), (301L, "2024-01-20"), (302L, "2024-02-01"))
      .toDF("p_id", "d_s")
      .select(col("p_id"), to_date(col("d_s")).as("p_d"))
    val df = pr.join(iv, col("p_d") >= col("lo") && col("p_d") <= col("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_bk"), s"date-bound rewrite did not fire:\n$plan")
    assert(df.select("iv_id", "p_id").as[(Long, Long)].collect().toSet ==
      Set((1L, 300L), (1L, 301L)))
  }

  test("SQL text goes through the same rewrite") {
    intervals.createOrReplaceTempView("rr_iv")
    probes.createOrReplaceTempView("rr_pr")
    val df = spark.sql(
      "SELECT iv_id, p_id FROM rr_pr JOIN rr_iv ON p_ts BETWEEN lo AND hi")
    assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    assert(df.as[(Long, Long)].collect().toSet ==
      Set((1L, 100L), (1L, 101L), (1L, 102L), (2L, 102L)))
  }
}
