package graft.operators

import org.apache.spark.sql.DataFrame

/** The one materialization seam every operator shares (round 15).
  *
  * Cutting a plan's lineage at a reused subtree is the round-14
  * optimization family (evaluate an expensive derivation once, let every
  * consumer read blocks). This helper makes the DURABILITY of that cut a
  * caller choice instead of a hard-coded `localCheckpoint`:
  *
  *   - `checkpointDir = None` (default): `localCheckpoint()` — executor-
  *     local blocks, fastest, right for single-node / short-lived jobs.
  *     NOT fault-tolerant: on a real cluster one lost executor loses the
  *     truncated lineage and fails the job.
  *   - `checkpointDir = Some(dir)`: RELIABLE `checkpoint()` into `dir`
  *     (HDFS/object store) — survives executor loss and dynamic
  *     deallocation; the only safe choice for long multi-stage jobs at
  *     cluster scale. Same contract [[PageRank.ranks]],
  *     [[LabelPropagation.propagate]] and
  *     [[ClusterDedup.connectedComponents]] established.
  *
  * Both variants are EAGER: calling this executes the frame's plan
  * immediately (MaterializeSpec pins reliable-path file creation; the
  * operators that call it document the eager-construction side effect).
  * Results are unaffected either way — only where the blocks live.
  */
object Materialize {
  def frame(df: DataFrame, checkpointDir: Option[String]): DataFrame = {
    checkpointDir.foreach(df.sparkSession.sparkContext.setCheckpointDir)
    if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
  }

  /** Materialize WITH a stated hash partitioning that downstream joins
    * can reuse (no exchange on this side).
    *
    * Round-15 probe: under AQE — on by default since Spark 3.2, and on
    * in Bench/Verify — `Dataset.checkpoint` captures the ADAPTIVE
    * plan's `outputPartitioning`, which reads as UnknownPartitioning,
    * so a `repartition(key)` in front of a checkpoint was structurally
    * INERT: every per-round consumer re-shuffled the checkpointed frame
    * anyway (the r14 pre-partition family — PageRank, LabelPropagation,
    * ClusterDedup — never skipped its iteration exchange at runtime).
    * Disabling AQE around THIS materialization only makes the
    * checkpoint's LogicalRDD carry hashpartitioning(keys, session
    * shuffle width); consumer queries keep AQE and read the frame
    * exchange-free (plans/r15/graph_pagerank_iter1_*). The
    * materialization itself is a single explicit repartition — exactly
    * the shape AQE would not improve.
    *
    * Mechanism: [[org.apache.spark.sql.execution.GraftStampedCheckpoint]]
    * enforces the layout (explicit-count repartition AQE never
    * coalesces, plus an in-partition sort on `keys`) and stamps
    * HashPartitioning + SortOrder onto the checkpoint's LogicalRDD, so
    * the upstream pipeline keeps AQE (an AQE-off materialization window
    * measured 1.25-1.49x slower on the iterative graph operators) and a
    * downstream sort-merge join reads this side with neither an
    * exchange NOR a sort.
    */
  def framePartitioned(
      df: DataFrame,
      keys: Seq[org.apache.spark.sql.Column],
      checkpointDir: Option[String]
  ): DataFrame = {
    checkpointDir.foreach(df.sparkSession.sparkContext.setCheckpointDir)
    org.apache.spark.sql.execution.GraftStampedCheckpoint
      .partitionedCheckpoint(df, keys, reliable = checkpointDir.isDefined)
  }
}
