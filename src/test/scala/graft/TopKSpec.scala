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
}
