package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-analysis centrality (PageRank) in exact 64-bit
  * integer arithmetic — the graph-quality signal family web-corpus
  * curation uses (Common Crawl publishes harmonic/PageRank centrality
  * per host and corpus filters key off it).
  *
  * Ranks are micro-scaled BIGINTs (start 10^6 per node); one iteration
  * is rank' = (1-d)·10^6 + d·Σ contrib with every step floored integer
  * division: contrib = r div outdeg, damped sum = (850·Σ) div 1000.
  * Integer sums are order-free, so the result is bit-identical across
  * engines and partitionings — an oracle can replay the exact fixpoint
  * trajectory, which a float implementation cannot promise.
  *
  * Scale shape: per iteration one equi-join of the edge list against
  * the current ranks (both hash-partitioned on src) and one shuffled
  * aggregation by dst — the textbook Pregel-as-relational-ops loop.
  * Edge list, degrees, and node set are checkpointed ONCE upfront
  * (eager) so the per-iteration plan re-reads materialized partitions
  * instead of replaying their lineage; each iteration's ranks
  * checkpoint too, keeping lineage depth O(1) like [[ClusterDedup]].
  * Checkpoints are executor-local by default (fast, single-node) or
  * RELIABLE via `checkpointDir` (survives executor loss — required at
  * cluster scale). Dangling nodes (no out-edges) leak their mass by
  * design — the simplified PageRank variant — and the oracle mirrors
  * that choice.
  */
object PageRank {
  val DampMilli = 850        // d = 0.85 as an exact per-mille
  val InitMicro = 1000000L   // every node starts at 1.0, micro-scaled

  /** `edges`: (src: long, dst: long), directed, deduplicated by the
    * caller if required. Returns (id, r) after `iterations` rounds.
    *
    * `checkpointEvery` trades lineage depth against eager
    * materialization latency: every round is the safest on a lossy
    * cluster, every 2-3 rounds halves the per-round barrier cost when
    * iterations are few (each skipped checkpoint leaves one more
    * join+agg in the recomputation path of the next one).
    *
    * `checkpointDir` selects RELIABLE checkpoints (HDFS/object-store
    * files) instead of `localCheckpoint`: local checkpoints store
    * blocks on executors, so on a real cluster one lost executor kills
    * the truncated lineage and the whole run. With a reliable dir every
    * materialization survives executor loss — the only choice for long
    * iterative jobs at cluster scale (same contract as
    * [[ClusterDedup.connectedComponents]]). Ranks are integer-exact, so
    * the results are bit-identical either way (PageRankSpec pins it).
    *
    * Per-iteration shuffle shape (round 14): the edge⋈outdeg join is
    * loop-INVARIANT, so it is taken once, hash-partitioned on `src` at
    * the session shuffle width, and materialized — the checkpoint
    * preserves that partitioning, so every iteration's rank join reads
    * the edge side with NO exchange and shuffles only the node-scale
    * rank frame. Per iteration: one rank exchange (n rows), one
    * map-side-combined contribution agg (exchange keyed on dst), and
    * the node-scale rank update — the 8m-byte edge list crosses the
    * wire exactly once per RUN instead of once per iteration.
    */
  def ranks(
      edges: DataFrame,
      iterations: Int,
      checkpointEvery: Int = 2,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val e   = materialize(edges.select(col("src"), col("dst")))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = materialize(
      e.select(explode(array(col("src"), col("dst"))).as("id")).distinct())
    // loop-invariant (src, dst, outdeg), hash-partitioned on `src`
    // EXPLICITLY before the degree join: when Catalyst broadcasts the
    // node-scale degree side (the common case) the join output would
    // otherwise carry NO src distribution (round-14 comment wrongly
    // assumed the join provided it — the committed iter-1 plan showed
    // UnknownPartitioning), and at cluster scale, where ranks exceed
    // the broadcast threshold, the edge list would reshuffle every
    // iteration. Partitioning e BEFORE the join costs nothing extra
    // under a sort-merge plan (it is the join's own requirement) and
    // one edge-scale exchange per RUN under a broadcast plan; the
    // checkpoint preserves it either way, so iterations shuffle only
    // the node-scale rank frame (same shape as LabelPropagation /
    // ClusterDedup).
    val edeg = materialize(
      e.repartition(col("src"))
        .join(deg, "src")
        .select(col("src"), col("dst"), col("outdeg")))

    var r = nodes.withColumn("r", lit(InitMicro))
    for (i <- 1 to iterations) {
      val contrib = edeg
        .join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("r div outdeg").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("s"))
      r = nodes
        .join(contrib, Seq("id"), "left")
        .select(
          col("id"),
          (lit(InitMicro - DampMilli * 1000L) +
            expr(s"($DampMilli * coalesce(s, 0L)) div 1000")).as("r")
        )
      if (i % checkpointEvery == 0 || i == iterations) r = materialize(r)
    }
    r
  }
}
