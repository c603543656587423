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

  /** Env-gated phase timing (`SPARK_GRAFT_KCORE_TIMING`): one stderr
    * line per peel phase, for scale diagnosis — the round-13 A/B
    * (tools/bench_sf10_kcore_p{32,128}_r13.json) refuted the
    * partition-pressure hypothesis (128 partitions is 1.7× SLOWER than
    * 32 at the 100× fixture), so the per-decade excess needed a
    * measured phase split instead of an asserted mechanism.
    */
  private val phaseTiming = sys.env.contains("SPARK_GRAFT_KCORE_TIMING")
  private def timedPhase[A](phase: String)(f: => A): A =
    if (!phaseTiming) f
    else {
      val t0 = System.nanoTime()
      try f
      finally System.err.println(
        f"[kcore] phase=$phase sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }

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

    val und = timedPhase("und_materialize")(materialize(
      edges
        .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
        .where(col("u") =!= col("v"))
        .distinct()))
    val adj = und.select(
      explode(array(
        struct(col("u").as("id"), col("v").as("nbr")),
        struct(col("v").as("id"), col("u").as("nbr"))
      )).as("e")
    ).select(col("e.id").as("id"), col("e.nbr").as("nbr"))

    var alive   = timedPhase("alive0_materialize")(materialize(adj.select(col("id")).distinct()))
    // per-round dropped sets, each materialized ONCE and unioned only at
    // the END. Two round-13 scale lessons baked into this loop shape
    // (sf10 phase split, tools/bench_sf10_kcore_diag_r13.json):
    //   1. `drop` is lazy — counting it, unioning it into an
    //      accumulator, and anti-joining alive against it would
    //      re-evaluate the FULL degree join (two semi-joins over the 2m
    //      adjacency + agg) three times per round. Materializing drop
    //      first makes every later use a block-manager scan.
    //   2. a removed-accumulator re-materialized per round copies the
    //      whole removed set every round — O(rounds²) rows of pure
    //      bookkeeping (round-4 materialize alone read 64.8 s at the
    //      100× fixture). Nothing in the loop reads `removed`, so the
    //      union belongs after the loop.
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
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
      val drop = timedPhase(s"round${round}_degree_drop")(materialize(
        alive
          .join(deg, Seq("id"), "left")
          .where(coalesce(col("d"), lit(0L)) < k)
          .select(col("id"), lit(round).as("removed_round"))))
      val nDrop = drop.count()
      if (nDrop == 0) done = true
      else timedPhase(s"round${round}_alive_update") {
        rounds += drop
        alive = materialize(alive.join(drop, Seq("id"), "left_anti"))
      }
    }
    // empty accumulator with the output schema (typed off the id column)
    val removed0 = alive.select(col("id"), lit(0).as("removed_round")).where(lit(false))
    alive
      .withColumn("removed_round", lit(0))
      .unionByName(rounds.foldLeft(removed0)(_.unionByName(_)))
  }
}
