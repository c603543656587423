package graft

import graft.operators.ClusterDedup

class ClusterDedupSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain, clique, and separate components get min-id labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (edge)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)
    ).toDF("id_a", "id_b")
    val labels = ClusterDedup
      .connectedComponents(pairs, "id_a", "id_b")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L
    ))
  }

  test("checkpointMinimized arm: identical labels on chain + clique + deep path") {
    // the round-15 per-round-agg checkpoint lever must be invisible in
    // results on both a shallow mixed fixture and a deep-peel path
    val pairs = (Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L)) ++
      (100L until 160L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    def toMapOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val off = toMapOf(ClusterDedup.connectedComponents(pairs, "id_a", "id_b"))
    val on = toMapOf(
      ClusterDedup.connectedComponents(pairs, "id_a", "id_b", checkpointMinimized = true))
    assert(on === off)
  }

  test("connected components: a long chain converges (pointer jumping)") {
    // path 0-1-2-...-40: diameter 40, must finish inside the iteration cap
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = ClusterDedup
      .connectedComponents(pairs, "id_a", "id_b")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(labels.size == 41 && labels.values.forall(_ == 0L))
  }

  test("reliable checkpointDir variant: identical labels, checkpoint files written") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)
    ).toDF("id_a", "id_b")
    def toMapOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = toMapOf(ClusterDedup.connectedComponents(pairs, "id_a", "id_b"))
    val dir = tempDir("cc-reliable")
    val reliable = toMapOf(
      ClusterDedup.connectedComponents(pairs, "id_a", "id_b", checkpointDir = Some(dir))
    )
    assert(reliable == local)
    // the reliable path must actually have materialized into the dir
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    assert(walk(new java.io.File(dir)).nonEmpty, "no checkpoint files written")
  }

  test("assignClusters: singletons self-cluster, survivors are the min member") {
    val docs = Seq(1L, 2L, 3L, 7L).toDF("doc_id")
    val pairs = Seq((2L, 3L)).toDF("id_a", "id_b")
    val out = ClusterDedup
      .assignClusters(docs, "doc_id", pairs, "id_a", "id_b")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    assert(out == Map(
      1L -> ((1L, 1)),
      2L -> ((2L, 1)),
      3L -> ((2L, 0)),
      7L -> ((7L, 1))
    ))
  }
}
