package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling — the density-based
  * graph quality signal next to [[PageRank]] (centrality),
  * [[LabelPropagation]] (community), and [[Triangles]] (local
  * clustering): the k-core is the maximal subgraph where every node
  * keeps degree >= k, the standard spam/boilerplate separator on
  * link graphs (low-core pages are the periphery).
  *
  * Semantics are SYNCHRONOUS rounds: each round simultaneously removes
  * every surviving node whose degree among survivors is < k. This is a
  * pure function of (edges, k, round) — sequential peel orders (the
  * textbook O(m) algorithm) reach the same fixpoint but have no
  * deterministic intermediate states, and it is the fixpoint plus the
  * per-node REMOVAL ROUND (a peel-depth signal, like an onion layer
  * index) that this returns: (id, removed_round), 0 = still alive.
  *
  * `maxRounds` caps the loop for a round-count-deterministic result an
  * unrolled SQL oracle can replay at ANY scale (the PageRank
  * fixed-iterations discipline); `None` runs to the true fixpoint
  * (spec-pinned equal to a naive k-core peel). Convergence is
  * detected by a count of the round's removals — a group-sized scan of
  * the checkpointed round, the ClusterDedup probe discipline.
  *
  * Scale shape per round: one semi-join of the (checkpointed) edge
  * list against the shrinking alive set per endpoint + one degree agg
  * — all hash-partitioned on node id; rounds are O(peel depth), lineage
  * cut per round (local or RELIABLE via `checkpointDir`, same fault
  * contract as [[PageRank.ranks]]).
  */
object KCore {

  /** `edges`: undirected (direction/duplicates ignored, self-loops
    * dropped). Returns every node with its removal round (0 = in the
    * surviving set when peeling stopped).
    */
  def peel(
      edges: DataFrame,
      k: Long,
      maxRounds: Option[Int] = None,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    maxRounds.foreach(r => require(r >= 0, s"maxRounds must be >= 0, got $r"))
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()

    val und = materialize(
      edges
        .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
        .where(col("u") =!= col("v"))
        .distinct())
    val adj = und.select(
      explode(array(
        struct(col("u").as("id"), col("v").as("nbr")),
        struct(col("v").as("id"), col("u").as("nbr"))
      )).as("e")
    ).select(col("e.id").as("id"), col("e.nbr").as("nbr"))

    var alive   = materialize(adj.select(col("id")).distinct())
    // empty accumulator with the output schema (typed off the id column)
    var removed = alive.select(col("id"), lit(0).as("removed_round")).where(lit(false))
    var round = 0
    var done  = false
    while (!done && maxRounds.forall(round < _)) {
      round += 1
      // degree among survivors: an edge counts iff BOTH endpoints live
      val deg = adj
        .join(alive, "id", "left_semi")
        .join(alive.withColumnRenamed("id", "nbr"), "nbr", "left_semi")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("d"))
      val drop = alive
        .join(deg, Seq("id"), "left")
        .where(coalesce(col("d"), lit(0L)) < k)
        .select(col("id"), lit(round).as("removed_round"))
      val nDrop = drop.count()
      if (nDrop == 0) done = true
      else {
        removed = materialize(removed.unionByName(drop))
        alive   = materialize(alive.join(drop, Seq("id"), "left_anti"))
      }
    }
    alive.withColumn("removed_round", lit(0)).unionByName(removed)
  }
}
