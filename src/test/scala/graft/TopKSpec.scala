package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("algebraic top-k equals the window idiom on real data (incl. groups smaller than k)") {
    val base = Tables
      .orders(spark, Sf)
      .select(
        col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        col("o_orderkey")
      )
    val agg = TopK
      .perGroup(base, Seq("o_custkey"), col("cents"), col("o_orderkey"), k = 3)
      .select("o_custkey", "rnk", "value", "id")
      .as[(Long, Int, Long, Long)]
      .collect()
      .toSet
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("cents").desc, col("o_orderkey").asc)
    val win = base
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk").cast("int"), col("cents"), col("o_orderkey"))
      .as[(Long, Int, Long, Long)]
      .collect()
      .toSet
    assert(agg == win)
  }

  test("ties break by id ascending; duplicates of one value all survive up to k") {
    val df = Seq(
      (1L, 10L, 3L), (1L, 10L, 1L), (1L, 10L, 2L), (1L, 5L, 9L),
      (2L, 7L, 4L)
    ).toDF("g", "v", "id")
    val got = TopK
      .perGroup(df, Seq("g"), col("v"), col("id"), k = 3)
      .select("g", "rnk", "value", "id")
      .as[(Long, Int, Long, Long)]
      .collect()
      .sortBy(r => (r._1, r._2))
      .toSeq
    assert(got == Seq(
      (1L, 1, 10L, 1L), (1L, 2, 10L, 2L), (1L, 3, 10L, 3L),
      (2L, 1, 7L, 4L)
    ))
  }

  test("plans as a partial aggregation, not a window sort") {
    val base = Tables
      .orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"))
    val plan = TopK
      .perGroup(base, Seq("o_custkey"), col("o_orderkey"), col("o_orderkey"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan:\n$plan")
    assert(!plan.contains("Window"), s"top-k aggregator must not plan a window:\n$plan")
    // partial + final pair proves the map-side combine actually happens
    assert(plan.contains("partial_"), s"expected a partial aggregation stage:\n$plan")
  }

  test("perGroupTies: full (value DESC, t1 ASC, t2 ASC, id ASC) order, cut at k") {
    val df = Seq(
      // group 1: value tie broken by t1, then t2, then id
      (1L, 10L, 5L, 5L, 100L),
      (1L, 10L, 3L, 9L, 101L),
      (1L, 10L, 3L, 7L, 102L),
      (1L, 10L, 3L, 7L, 99L),
      (1L, 20L, 9L, 9L, 103L), // highest value wins outright
      (1L, 1L, 0L, 0L, 104L),  // cut by k=4
      // group 2: fewer than k rows survive whole
      (2L, 7L, 1L, 1L, 200L)
    ).toDF("g", "v", "t1", "t2", "i")
    val got = TopK
      .perGroupTies(df, Seq("g"), col("v"), col("t1"), col("t2"), col("i"), k = 4)
      .select("g", "rnk", "value", "id")
      .as[(Long, Int, Long, Long)]
      .collect()
      .sortBy(r => (r._1, r._2))
      .toSeq
    assert(got == Seq(
      (1L, 1, 20L, 103L),
      (1L, 2, 10L, 99L),  // t1=3,t2=7,id 99 beats id 102
      (1L, 3, 10L, 102L),
      (1L, 4, 10L, 101L), // t2=9 loses to t2=7; (t1=5) row cut
      (2L, 1, 7L, 200L)
    ))
  }

  test("bucketedOverlapTopK equals the window-capped overlap join on real events") {
    import graft.operators.RangeJoin
    val ev = Tables.events(spark, Sf)
    def spans(p: String) = ev
      .groupBy(col("user_id").as(p + "user"), to_date(col("ts")).as(p + "day"))
      .agg(min(col("ts")).as(p + "start"), max(col("ts")).as(p + "end"))
    val agg = RangeJoin
      .bucketedOverlapTopK(
        spans("l_"), spans("r_"), "l_start", "l_end", "r_start", "r_end",
        bucketSeconds = 21600L, k = 3, leftKeys = Seq("l_user", "l_day"),
        rIdCol = "r_user", extraPred = col("l_user") =!= col("r_user"))
      .select(col("l_user"), col("l_day").cast("string"), col("rnk"), col("ov_us"), col("r_user"))
      .as[(Long, String, Int, Long, Long)].collect().toSet
    val win = RangeJoin
      .bucketedOverlapJoin(
        spans("l_"), spans("r_"), "l_start", "l_end", "r_start", "r_end",
        bucketSeconds = 21600L, extraPred = col("l_user") =!= col("r_user"),
        maxPairsPerLeft = 3, pairBudgetKeys = Seq("l_user"),
        // total order: same 4-key tiebreak as the aggregate path, so the
        // two 'same semantics' cap paths keep identical twins on ties
        pairBudgetTieKeys = Seq("r_user"))
      .select(
        col("l_user"), col("l_day").cast("string"),
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("l_user"), col("l_day"))
            .orderBy(
              (least(expr("unix_micros(l_end)"), expr("unix_micros(r_end)")) -
                greatest(expr("unix_micros(l_start)"), expr("unix_micros(r_start)"))).desc,
              col("r_start").asc, col("r_end").asc, col("r_user").asc)).as("rnk"),
        (least(expr("unix_micros(l_end)"), expr("unix_micros(r_end)")) -
          greatest(expr("unix_micros(l_start)"), expr("unix_micros(r_start)"))).as("ov_us"),
        col("r_user"))
      .as[(Long, String, Int, Long, Long)].collect().toSet
    assert(agg == win)
    // and the aggregate path must not plan a window
    val plan = RangeJoin
      .bucketedOverlapTopK(
        spans("l_"), spans("r_"), "l_start", "l_end", "r_start", "r_end",
        bucketSeconds = 21600L, k = 3, leftKeys = Seq("l_user", "l_day"),
        rIdCol = "r_user", extraPred = col("l_user") =!= col("r_user"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"overlap top-k must aggregate, not window-sort:\n$plan")
  }

  test("bucketedOverlapTopKSym equals the asymmetric =!= form on real events, window-free") {
    import graft.operators.RangeJoin
    val ev = Tables.events(spark, Sf)
    def spans(p: String) = ev
      .groupBy(col("user_id").as(p + "user"), to_date(col("ts")).as(p + "day"))
      .agg(min(col("ts")).as(p + "start"), max(col("ts")).as(p + "end"))
    def sym = RangeJoin.bucketedOverlapTopKSym(
      spans("l_"), spans("r_"), "l_start", "l_end", "r_start", "r_end",
      bucketSeconds = 21600L, k = 3,
      lKeys = Seq("l_user", "l_day"), rKeys = Seq("r_user", "r_day"),
      lIdCol = "l_user", rIdCol = "r_user",
      outKeys = Seq("l_user", "l_day"), outIdCol = "r_user")
    val asym = RangeJoin.bucketedOverlapTopK(
      spans("l_"), spans("r_"), "l_start", "l_end", "r_start", "r_end",
      bucketSeconds = 21600L, k = 3, leftKeys = Seq("l_user", "l_day"),
      rIdCol = "r_user", extraPred = col("l_user") =!= col("r_user"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(
        col("l_user"), col("l_day").cast("string"), col("rnk"),
        col("ov_us"), col("r_start_us"), col("r_end_us"), col("r_user"))
      .as[(Long, String, Int, Long, Long, Long, Long)]
      .collect()
      .toSet
    // the canonical l<r enumeration + two-directed-updates generate must
    // reproduce the double-enumerated pair semantics EXACTLY (full rows,
    // including the neighbor endpoints the tiebreak orders by)
    assert(rows(sym) == rows(asym))
    val plan = sym.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sym overlap top-k must aggregate, not window-sort:\n$plan")
    assert(plan.contains("Generate"), s"sym path should fan canonical pairs via a generate:\n$plan")
  }
}
