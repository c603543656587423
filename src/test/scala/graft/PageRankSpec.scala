package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank
      .ranks(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)]
      .collect()
      .toMap

  test("a directed cycle is a fixpoint: every rank stays exactly 10^6") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 4)
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("star graph follows the exact integer trajectory, dangling sinks leak") {
    val edges = Seq((1L, 2L), (1L, 3L))
    // it1: src node gets base only; sinks get 150000 + (850*(1e6 div 2)) div 1000
    assert(run(edges, 1) == Map(1L -> 150000L, 2L -> 575000L, 3L -> 575000L))
    // it2: sinks now see only the shrunken source mass
    // 150000 + (850 * (150000 div 2)) div 1000 = 213750
    assert(run(edges, 2) == Map(1L -> 150000L, 2L -> 213750L, 3L -> 213750L))
  }

  test("zero iterations returns the uniform init") {
    val got = run(Seq((7L, 8L)), iters = 0)
    assert(got == Map(7L -> 1000000L, 8L -> 1000000L))
  }

  test("reliable checkpointDir variant: bit-identical ranks, checkpoint files written") {
    // a denser fixture than the trajectory tests: two cycles bridged by
    // a dangling hub, 4 iterations crossing two checkpoint barriers
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 4L), (3L, 4L), (1L, 6L))
    val df   = edges.toDF("src", "dst")
    val dir  = tempDir("pagerank-ckpt")
    val base = PageRank.ranks(df, 4).as[(Long, Long)].collect().toMap
    val reliable = PageRank
      .ranks(df, 4, checkpointDir = Some(dir))
      .as[(Long, Long)]
      .collect()
      .toMap
    // integer arithmetic: the reliable path must be BIT-identical
    assert(reliable == base)
    // and the materializations really went to the reliable dir (files
    // survive executor loss — the cluster-scale fault-tolerance contract)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    assert(walk(new java.io.File(dir)).nonEmpty, "no checkpoint files written")
  }
}
