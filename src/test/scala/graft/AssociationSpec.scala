package graft

import graft.operators.Association
import org.apache.spark.sql.functions._

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  private def rules(rows: Seq[(Long, Long)], minSupport: Long = 2L) =
    Association
      .pairRules(rows.toDF("b", "i"), "b", "i", minSupport)
      .select("ante", "cons", "s_pair", "s_ante", "s_cons", "conf_micro", "lift_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect()

  test("hand-computed confidences and lifts") {
    // 4 baskets: {1,2} {1,2} {1,3} {2,3}
    // s(1)=3 s(2)=3 s(3)=2; s(1,2)=2, s(1,3)=1, s(2,3)=1; N=4
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 3L), (13L, 2L), (13L, 3L))
    val got = rules(rows).map(t => (t._1, t._2) -> t).toMap
    assert(got.keySet === Set((1L, 2L), (2L, 1L))) // only (1,2) reaches support 2
    val r12 = got((1L, 2L))
    assert(r12._3 === 2L && r12._4 === 3L && r12._5 === 3L)
    assert(r12._6 === 666666L)                 // conf = 2/3
    assert(r12._7 === (1000000L * 2 * 4) / 9)  // lift = 2*4/(3*3) = 888888
    val r21 = got((2L, 1L))
    assert(r21._6 === 666666L && r21._7 === r12._7) // lift symmetric
  }

  test("apriori prune: pairs of infrequent items never surface") {
    // item 9 appears once -> infrequent; its pair with 1 would have
    // support 1 anyway, but even a basket-duplicated item stays pruned
    val rows = Seq((1L, 1L), (1L, 9L), (1L, 9L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L))
    val got = rules(rows)
    assert(got.forall(r => r._1 != 9L && r._2 != 9L))
    assert(got.map(r => (r._1, r._2)).toSet === Set((1L, 2L), (2L, 1L)))
  }

  test("basket-level duplicates collapse before counting") {
    val rows = Seq((1L, 5L), (1L, 5L), (1L, 6L), (2L, 5L), (2L, 6L), (2L, 6L))
    val got = rules(rows).map(t => (t._1, t._2) -> t._3).toMap
    assert(got === Map((5L, 6L) -> 2L, (6L, 5L) -> 2L))
  }

  test("frequent-item and scalar joins broadcast; pair join keys on the basket") {
    val baskets = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
    val plan = Association.pairRules(baskets, "b", "i", 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
