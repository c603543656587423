package graft

import graft.operators.LabelPropagation
import org.apache.spark.sql.functions._

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")

  private def labels(df: org.apache.spark.sql.DataFrame, rounds: Int,
                     dir: Option[String] = None) =
    LabelPropagation
      .propagate(df, rounds, checkpointDir = dir)
      .as[(Long, Long)]
      .collect()
      .toMap

  test("two cliques with one bridge converge to two min-id communities") {
    // cliques {1,2,3} and {10,11,12}, bridge 3-10
    val e = undirected((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val l = labels(e, 6)
    assert(Set(1L, 2L, 3L).map(l).size == 1, s"clique A not converged: $l")
    assert(Set(10L, 11L, 12L).map(l).size == 1, s"clique B not converged: $l")
    assert(l(1L) != l(11L), s"bridge merged the communities: $l")
  }

  test("node with no in-edges keeps its own label") {
    // directed: 5 -> 1 only; node 5 has no in-neighbors
    val e = Seq((5L, 1L)).toDF("src", "dst")
    val l = labels(e, 3)
    assert(l(5L) == 5L && l(1L) == 5L)
  }

  test("ties go to the smallest label, synchronously") {
    // node 9 hears labels {1, 2} once each -> adopts 1
    val e = Seq((1L, 9L), (2L, 9L)).toDF("src", "dst")
    assert(labels(e, 1)(9L) == 1L)
  }

  test("reliable checkpoint run is bit-identical to localCheckpoint run") {
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
    val dir = java.nio.file.Files.createTempDirectory("lpa-ckpt").toString
    try assert(labels(e, 4) == labels(e, 4, Some(dir)))
    finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("deterministic under repartitioning") {
    val r = new java.util.Random(5)
    val edges = (1 to 400).map(_ => (r.nextInt(60).toLong, r.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    assert(labels(df, 3) == labels(df.repartition(13), 3))
  }
}
