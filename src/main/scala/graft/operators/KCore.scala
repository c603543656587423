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
  * Scale shape (round-14 incremental-degree plan): degrees are
  * maintained as STATE, not recomputed. Round 1's "degree among
  * survivors" is just `adj.groupBy(id).count` — alive₀ is every node,
  * so the survivor semi-joins the round-13 loop still paid there were
  * no-ops by construction. Rounds 2+ apply the peel identity
  * deg_{r+1}(id) = deg_r(id) − |neighbors of id dropped in round r|
  * (valid because per-round drop sets are disjoint and every node in
  * drop_r was alive when round r was evaluated): one semi-join of the
  * static adjacency against the round's drop set on `nbr` — broadcast
  * when the drop set is small, which after round 1 it usually is —
  * then a node-scale left join to subtract. Work per round is
  * proportional to the dropped FRONTIER's edges plus one node-scale
  * update, instead of the full 2m-row adjacency re-aggregation
  * (measured at the 100× fixture: rounds 2–3 re-aggregated ~54 s each
  * under the round-13 plan). Rounds are O(peel depth); lineage is cut
  * per round (local or RELIABLE via `checkpointDir`, same fault
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

  /** A drop set at or under this row count rides the decrement
    * semi-join as a BROADCAST build side (no shuffle of the 2m-row
    * adjacency — the dominant per-round cost once degrees are
    * incremental); above it, the planner's shuffled semi-join stands.
    * 2M longs is ~16 MB hashed — well inside executor broadcast
    * comfort on any real cluster, and the row count is already on the
    * driver (the convergence count), so the choice is free.
    */
  private val BroadcastDropMaxRows = 2L * 1000 * 1000

  /** Per-round dropped sets are each materialized once and unioned at
    * the END (nothing in the loop reads them — re-materializing an
    * accumulator per round was the round-13 O(rounds²) bookkeeping
    * bug). The union is assembled as a BALANCED tree (plan depth
    * log₂ n, so a deep peel cannot overflow Catalyst's analysis
    * recursion the way a left-deep foldLeft chain would) and the
    * buffer is additionally collapsed into one materialized frame
    * whenever it reaches this many entries, bounding plan WIDTH for
    * pathological peel depths (a path graph at k=2 peels O(n) rounds).
    * Each collapse re-copies rows at most once per `CollapseEvery`
    * subsequent rounds — O(rounds²/collapseEvery) bookkeeping in the
    * worst case, negligible at the default 256 and zero for ordinary
    * peels.
    */
  val DefaultCollapseEvery = 256

  private def balancedUnion(dfs: Seq[DataFrame]): DataFrame = {
    @annotation.tailrec
    def go(level: Seq[DataFrame]): DataFrame =
      if (level.sizeIs <= 1) level.head
      else go(level.grouped(2).map {
        case Seq(a, b) => a.unionByName(b)
        case Seq(a)    => a
      }.toSeq)
    go(dfs)
  }

  /** Per-round degree strategies, A/B-able from a bench without a code
    * change (the measured-lever discipline of
    * SPARK_GRAFT_SHUFFLE_PARTITIONS): `Incremental` is the round-14
    * plan documented on this object; `Reaggregate` is the round-13
    * plan — recompute each round's survivor degrees with two alive
    * semi-joins over the full adjacency — kept as the A/B baseline
    * that isolates exactly this round's cut. Semantics are identical
    * (KCoreSpec pins the plans equal); only the physical work differs.
    */
  object Plan {
    val Incremental = "incremental"
    val Reaggregate = "reaggregate"
  }

  /** `edges`: undirected (direction/duplicates ignored, self-loops
    * dropped). Returns every node with its removal round (0 = in the
    * surviving set when peeling stopped). `collapseEvery` bounds the
    * deferred-union buffer (see [[DefaultCollapseEvery]]) — a capacity
    * knob, never a semantics knob (KCoreSpec pins tiny values equal).
    */
  def peel(
      edges: DataFrame,
      k: Long,
      maxRounds: Option[Int] = None,
      checkpointDir: Option[String] = None,
      collapseEvery: Int = DefaultCollapseEvery,
      plan: String = Plan.Incremental
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    maxRounds.foreach(r => require(r >= 0, s"maxRounds must be >= 0, got $r"))
    require(collapseEvery >= 2, s"collapseEvery must be >= 2, got $collapseEvery")
    require(plan == Plan.Incremental || plan == Plan.Reaggregate,
      s"plan must be '${Plan.Incremental}' or '${Plan.Reaggregate}', got '$plan'")
    val incremental = plan == Plan.Incremental
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

    // live degrees as maintained state (incremental plan). Round 1:
    // alive₀ = every node (adj lists each node on the id side of every
    // incident edge), so the survivor-filtered degree IS the plain
    // degree — one map-side-combined agg over the adjacency, no
    // semi-joins. The reaggregate plan instead maintains the alive SET
    // and recomputes survivor degrees per round (the r13 baseline).
    var deg: DataFrame =
      if (incremental)
        timedPhase("deg0_materialize")(materialize(
          adj.groupBy(col("id")).agg(count(lit(1)).as("d"))))
      else null
    var alive: DataFrame =
      if (incremental) null
      else timedPhase("alive0_materialize")(materialize(adj.select(col("id")).distinct()))
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var done  = false
    while (!done && maxRounds.forall(round < _)) {
      round += 1
      // the round's drop set, materialized ONCE: every later use — the
      // count, the decrement join, the state update — is a block-
      // manager scan (`drop` left lazy would re-run its whole plan per
      // use, the round-13 triple-evaluation lesson)
      val drop = timedPhase(s"round${round}_drop")(materialize {
        if (incremental)
          // node-scale filter over maintained state
          deg.where(col("d") < k).select(col("id"), lit(round).as("removed_round"))
        else {
          // full survivor-degree reaggregation: an edge counts iff
          // BOTH endpoints live — two semi-joins over the adjacency
          val degR = adj
            .join(alive, "id", "left_semi")
            .join(alive.withColumnRenamed("id", "nbr"), "nbr", "left_semi")
            .groupBy(col("id"))
            .agg(count(lit(1)).as("d"))
          alive
            .join(degR, Seq("id"), "left")
            .where(coalesce(col("d"), lit(0L)) < k)
            .select(col("id"), lit(round).as("removed_round"))
        }
      })
      val nDrop = drop.count()
      if (nDrop == 0) done = true
      else timedPhase(s"round${round}_state_update") {
        rounds += drop
        if (rounds.sizeIs >= collapseEvery) {
          val collapsed = materialize(balancedUnion(rounds.toSeq))
          rounds.clear()
          rounds += collapsed
        }
        if (incremental) {
          // deg_{r+1} = deg_r − dropped-neighbor counts: the decrement
          // stream is only the frontier's incident edges; drop sets are
          // round-disjoint, so a neighbor dropped in an EARLIER round
          // is never re-subtracted
          val dropNbr0 = drop.select(col("id").as("nbr"))
          val dropNbr =
            if (nDrop <= BroadcastDropMaxRows) broadcast(dropNbr0) else dropNbr0
          val dec = adj
            .join(dropNbr, Seq("nbr"), "left_semi")
            .groupBy(col("id"))
            .agg(count(lit(1)).as("dec"))
          deg = materialize(
            deg
              .join(drop, Seq("id"), "left_anti")
              .join(dec, Seq("id"), "left")
              .select(col("id"), (col("d") - coalesce(col("dec"), lit(0L))).as("d")))
        } else
          alive = materialize(alive.join(drop, Seq("id"), "left_anti"))
      }
    }
    val survivors = if (incremental) deg.select(col("id")) else alive
    // empty accumulator with the output schema (typed off the id column)
    val removed0 = survivors.select(col("id"), lit(0).as("removed_round")).where(lit(false))
    survivors
      .select(col("id"), lit(0).as("removed_round"))
      .unionByName(balancedUnion(removed0 +: rounds.toSeq))
  }
}
