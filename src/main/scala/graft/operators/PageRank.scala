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
      Materialize.frame(df, checkpointDir)
    // edge staging (round 15): ONE materialization that STATES hash(src)
    // + in-partition order on the checkpoint (Materialize.framePartitioned
    // — a bare repartition+checkpoint loses its partitioning under AQE,
    // so the r14 shape still reshuffled the edge side every iteration;
    // the r14 comment's "the degree join's output is already
    // hash-partitioned" was also wrong under a broadcast degree join,
    // per the r14 advice).
    val ep = Materialize.framePartitioned(
      edges.select(col("src"), col("dst")), Seq(col("src")), checkpointDir)
    // degree agg over the stated hash(src) blocks — no exchange
    val deg = ep.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // the node set stays a PLAIN checkpoint: stating hash(id) on it
    // pins the per-iteration rank update into a no-exchange SMJ that
    // AQE can never rebroadcast — measured 2x slower per iteration
    // locally (round-15 phase probe: iters 7.7 s with plain nodes vs
    // 14.9 s with stated nodes, edeg held constant). The update join's
    // inputs are node-scale on both sides, so the exchange it keeps is
    // never the scale bottleneck; the edge-scale side below is.
    val nodes = materialize(
      ep.select(explode(array(col("src"), col("dst"))).as("id")).distinct())
    // loop-invariant (src, dst, outdeg) with stated hash(src) + order:
    // the build join is co-partitioned (both sides read ep's blocks),
    // and every iteration's rank join reads this side with neither an
    // exchange NOR a sort at any scale — only the node-scale rank
    // frame moves per iteration (plans/r15/graph_pagerank_iter1_*).
    val edeg = Materialize.framePartitioned(
      ep.join(deg, "src").select(col("src"), col("dst"), col("outdeg")),
      Seq(col("src")), checkpointDir)

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
      // rank checkpoints stay plain: stating hash(id) here would run
      // the update join AQE-off every checkpoint (measured slower —
      // AQE's broadcast of the contribution agg is the right local
      // plan) to save one NODE-scale exchange per iteration; the
      // edge-scale per-iteration exchange is the one that matters and
      // edeg's stated partitioning already removes it
      if (i % checkpointEvery == 0 || i == iterations) r = materialize(r)
    }
    r
  }
}
