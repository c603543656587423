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
}
