package graft

import graft.operators.LinkPrediction
import org.apache.spark.sql.functions._

class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  private def links(edges: Seq[(Long, Long)], cap: Int = 1000,
      minCommon: Long = 1L, topK: Int = 100) =
    LinkPrediction.predictLinks(edges.toDF("src", "dst"), cap, minCommon, topK)

  test("hand-computed fixture: scores, Jaccard, ranks") {
    // path-ish graph: 1-2, 1-3, 4-2, 4-3, 5-2  => candidates:
    //   (1,4): common {2,3} cn=2; du=2, dv=2 -> jac = 2/(2+2-2) = 1.0
    //   (1,5): common {2} cn=1; du=2, dv=1 -> 1/2
    //   (4,5): common {2} cn=1; 1/2
    //   (2,3): common {1,4} cn=2; du=3, dv=2 -> 2/3
    //   (3,5): via 2? N(3)={1,4}, N(5)={2} -> no common
    val out = links(Seq((1L, 2L), (1L, 3L), (4L, 2L), (4L, 3L), (5L, 2L)))
      .select("node", "candidate", "cn", "du", "dv", "jac_micro", "rnk")
      .as[(Long, Long, Long, Long, Long, Long, Int)]
      .collect().toSet
    val expPairs = Set(
      (1L, 4L, 2L, 2L, 2L, 1000000L), (4L, 1L, 2L, 2L, 2L, 1000000L),
      (2L, 3L, 2L, 3L, 2L, 666666L), (3L, 2L, 2L, 2L, 3L, 666666L),
      (1L, 5L, 1L, 2L, 1L, 500000L), (5L, 1L, 1L, 1L, 2L, 500000L),
      (4L, 5L, 1L, 2L, 1L, 500000L), (5L, 4L, 1L, 1L, 2L, 500000L)
    )
    assert(out.map(t => (t._1, t._2, t._3, t._4, t._5, t._6)) === expPairs)
    // ranks: node 1 sees 4 (cn 2) before 5 (cn 1)
    val r1 = out.filter(_._1 == 1L).map(t => (t._2, t._7)).toMap
    assert(r1 === Map(4L -> 1, 5L -> 2))
  }

  test("existing edges are never predicted; self-pairs never appear") {
    val out = links(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L)))
      .select("node", "candidate").as[(Long, Long)].collect()
    val edgeSet = Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L))
    out.foreach { case (a, b) =>
      assert(a != b)
      val c = (math.min(a, b), math.max(a, b))
      assert(!edgeSet.contains(c), s"predicted an existing edge $c")
    }
  }

  test("cap: hub wedges truncate to the smallest neighbor ids, scores lower-bound uncapped") {
    // star: hub 100 with neighbors 1..10, so every pair (i,j) has cn=1
    // uncapped; cap 4 keeps only neighbors 1..4 at the hub
    val star = (1L to 10L).map(i => (100L, i))
    val capped = links(star, cap = 4)
      .select("node", "candidate", "cn").as[(Long, Long, Long)].collect().toSet
    val expected = (for {
      i <- 1L to 4L; j <- 1L to 4L if i != j
    } yield (i, j, 1L)).toSet
    assert(capped === expected)
    val uncapped = links(star)
      .select("node", "candidate").as[(Long, Long)].collect().toSet
    assert(capped.map(t => (t._1, t._2)).subsetOf(uncapped))
    assert(uncapped.size === 90) // all ordered pairs of 10 leaves
  }

  test("minCommon and topK bound the output; dup/reversed/self edges canonicalize") {
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 1L), // dup + reversed + self-loop
      (1L, 3L), (4L, 2L), (4L, 3L), (5L, 2L), (5L, 3L)
    )
    val out = links(edges, minCommon = 2L, topK = 1)
      .select("node", "candidate", "cn", "rnk").as[(Long, Long, Long, Int)].collect()
    assert(out.forall(_._3 >= 2L))
    assert(out.forall(_._4 == 1))
    val perNode = out.groupBy(_._1).view.mapValues(_.length)
    assert(perNode.values.forall(_ == 1))
  }

  test("degree joins broadcast; no cartesian anywhere") {
    val pp = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = pp.as("a")
      .join(pp.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
    val plan = LinkPrediction.predictLinks(edges, 32, 2L, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("BroadcastHashJoin"), s"degree join should broadcast:\n$plan")
  }

  test("wedge-agg shuffle width is a pure layout knob: explicit width equals auto") {
    import spark.implicits._
    val r = new java.util.Random(5)
    val es = (1 to 400).map(_ => (r.nextInt(25).toLong, r.nextInt(25).toLong)).toDF("src", "dst")
    def res(wp: Int) = LinkPrediction
      .predictLinks(es, capDeg = 8, minCommon = 2L, topK = 3, wedgePartitions = wp)
      .select("node", "candidate", "cn", "jac_micro", "rnk")
      .as[(Long, Long, Long, Long, Int)]
      .collect()
      .toSet
    assert(res(0) == res(7))
    assert(res(7) == res(1))
  }
}
