package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING: the stage after pair generation in a
  * corpus-dedup pipeline. Pair operators ([[ApproxDedup]]) emit edges;
  * this one groups them into connected components and elects one
  * survivor per component — what a 100 TB pretraining-dedup actually
  * ships (drop all but one doc of each near-dup family).
  *
  * Algorithm: iterative min-label propagation with pointer-jumping
  * (hash-to-min): each round every vertex takes the min label among
  * itself and its neighbors, then labels are compressed one hop
  * (label := label(label)). Pointer jumping makes convergence
  * O(log diameter) rounds, so even pathological chain-shaped families
  * finish in a handful of iterations; near-dup families are in practice
  * dense and converge in 2-3.
  *
  * Scale shape per round: one shuffle join of edges with labels on the
  * vertex id + one min-aggregation + one self-join for compression —
  * all hash-partitioned on ids, never materializing anything wider than
  * (id, label) pairs. The per-round frame is CHECKPOINTED to cut the
  * growing lineage: `localCheckpoint` (executor-local blocks, fastest)
  * by default, or a RELIABLE `checkpoint()` into `checkpointDir` when
  * one is passed — on a real cluster localCheckpoint pins blocks to
  * executors, so one executor loss mid-iteration kills the job; a
  * production run hands in a durable (HDFS/object-store) directory.
  * Convergence is detected with a scalar `isEmpty` probe, not a
  * collect. This is the standard Pregel-style CC shape (cf. GraphX),
  * expressed over DataFrames so Catalyst/AQE still plan each round.
  */
object ClusterDedup {
  /** Connected-component label (the min member id) per vertex id
    * appearing in `pairs`. Output: (id, label).
    *
    * `pairs` must be an undirected edge list (each unordered pair once,
    * either orientation); ids must be orderable (the component label is
    * the component's min id, which makes results deterministic and
    * engine-portable).
    */
  /** `checkpointMinimized` materializes each round's min-label
    * aggregation BEFORE the pointer-jump self-join: exchange reuse
    * covers the agg's shuffle but not the final hash agg, so the
    * default plan evaluates that agg twice per round; the checkpoint
    * trades one extra per-round barrier for the second evaluation.
    * Default OFF — the round-15 deep-peel A/B (22-round path graph,
    * tools/bench_r15_ccpeel_ab.jsonl) adjudicates which arm ships.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25,
      checkpointDir: Option[String] = None,
      checkpointMinimized: Boolean = false
  ): DataFrame = {
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    // reliable checkpoint survives executor loss; both variants are
    // EAGER, so each round's probe below reads materialized blocks
    def save(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()

    // BOTH edge orientations from ONE evaluation of the (potentially
    // expensive) upstream pair pipeline: explode duplicates each row
    // inside the same scan — `pairs.union(pairs.swapped)` would plant the
    // whole pair-generation DAG in the plan twice and execute it twice
    // (the round-2 cc bench was dominated by exactly that)
    val e = pairs
      .select(
        explode(
          array(
            struct(col(aCol).as("src"), col(bCol).as("dst")),
            struct(col(bCol).as("src"), col(aCol).as("dst"))
          )
        ).as("se")
      )
      .select(col("se.src").as("src"), col("se.dst").as("dst"))
      .distinct()
    // edge staging (round 15): one materialization that STATES
    // hash(src) + in-partition order on the checkpoint. The r14
    // repartition-before-checkpoint was structurally inert — under AQE
    // the checkpoint captures UnknownPartitioning (see
    // Materialize.framePartitioned) — so the edge list still reshuffled
    // every round; now only the node-scale label frame moves per round
    // (same shape as LabelPropagation/PageRank).
    val edges = Materialize.framePartitioned(e, Seq(col("src")), checkpointDir)

    var labels = save(
      edges
        .select(col("src").as("id"))
        .distinct()
        .withColumn("label", col("id"))
    )

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min over self + neighbor labels; the self rows also carry the
      // round's PREVIOUS label through the aggregation (min over the
      // single tagged row), so convergence needs no extra join below
      val idType = pairs.schema(aCol).dataType
      val msgs = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"), lit(null).cast(idType).as("__self"))
      val minimizedAgg = labels
        .select(col("id"), col("label"), col("label").as("__self"))
        .union(msgs)
        .groupBy("id")
        .agg(min("label").as("label"), min("__self").as("__old"))
      val minimized =
        if (checkpointMinimized) save(minimizedAgg) else minimizedAgg
      // pointer jump: label := label(label) — every label IS a vertex id
      // (the min is always some member's id), so the self-join hits
      val next = minimized
        .join(
          minimized.select(col("id").as("__lid"), col("label").as("__ll")),
          col("label") === col("__lid")
        )
        .select(col("id"), col("__ll").as("label"), (col("__ll") =!= col("__old")).as("__chg"))
      val saved = save(next)
      // probe reads the just-checkpointed frame — no recomputation, no join
      converged = saved.where(col("__chg")).isEmpty
      labels = saved.select(col("id"), col("label"))
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Cluster assignment for EVERY document: docs in no pair form their
    * own singleton cluster (cluster_id = own id); `is_survivor` marks
    * the elected representative (the min id of its cluster) — filtering
    * on it yields the deduplicated corpus.
    */
  def assignClusters(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String
  ): DataFrame = {
    val labels = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", idCol)
      .withColumnRenamed("label", "__cc")
    docs
      .select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("__cc"), col(idCol)).as("cluster_id"),
        when(coalesce(col("__cc"), col(idCol)) === col(idCol), 1).otherwise(0).as("is_survivor")
      )
  }
}
