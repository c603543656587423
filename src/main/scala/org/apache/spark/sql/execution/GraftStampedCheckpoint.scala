package org.apache.spark.sql.execution

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Checkpoint a frame AND carry its true physical layout through the cut.
  *
  * `Dataset.checkpoint`/`localCheckpoint` record the physical plan's
  * `outputPartitioning`/`outputOrdering` on the resulting [[LogicalRDD]] —
  * but under AQE (on by default since Spark 3.2) the executed plan's root
  * is the adaptive wrapper, whose partitioning reads as
  * `UnknownPartitioning`, so a `repartition(key)` feeding a checkpoint is
  * silently erased and every downstream join re-shuffles the materialized
  * frame (round-15 probe, plans/r15/graph_pagerank_iter1_*). Disabling AQE
  * around the materialization works but costs the adaptive wins of
  * whatever upstream pipeline feeds it (measured 1.25-1.49x on the
  * iterative graph operators).
  *
  * This shim instead ENFORCES the layout and then STAMPS it:
  *
  *  1. `repartition(numShufflePartitions, keys)` — the EXPLICIT partition
  *     count makes the exchange `REPARTITION_BY_NUM`, which AQE never
  *     coalesces, so the materialized RDD's partition i holds exactly the
  *     rows with `murmur3(keys) % n == i`;
  *  2. `sortWithinPartitions(keys)` — per-partition order is preserved
  *     verbatim into the checkpointed blocks;
  *  3. rebuild the checkpoint's [[LogicalRDD]] with
  *     `HashPartitioning(keys, n)` + ascending [[SortOrder]], carrying the
  *     original stats through.
  *
  * The stamp states only what steps 1-2 physically guaranteed (a partition
  * -count mismatch fails loudly), so consumers — under AQE or not — read
  * the frame with neither an exchange nor a sort on this side. Lives in
  * Spark's own package because [[LogicalRDD]] and `Dataset.ofRows` are
  * `private[sql]`; uses only the public Apache Spark source contract.
  */
object GraftStampedCheckpoint {
  def partitionedCheckpoint(
      df: DataFrame,
      keys: Seq[Column],
      reliable: Boolean
  ): DataFrame = {
    val session = df.sparkSession.asInstanceOf[SparkSession]
    val n       = session.sessionState.conf.numShufflePartitions
    val laid    = df.repartition(n, keys: _*).sortWithinPartitions(keys: _*)
    val ck      = if (reliable) laid.checkpoint() else laid.localCheckpoint()
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        require(
          lr.rdd.getNumPartitions == n,
          s"stamped layout mismatch: rdd has ${lr.rdd.getNumPartitions} partitions, stated $n")
        val keyNames = keys.map(k => df.select(k).schema.head.name)
        val keyAttrs = keyNames.map { name =>
          lr.output
            .find(_.name == name)
            .getOrElse(throw new IllegalArgumentException(
              s"stamp key '$name' not among checkpoint output ${lr.output.map(_.name).mkString(", ")}"))
        }
        val stamped = LogicalRDD(
          lr.output,
          lr.rdd,
          HashPartitioning(keyAttrs, n),
          keyAttrs.map(a => SortOrder(a, Ascending)),
          lr.isStreaming
        )(session, Some(lr.stats), None)
        Dataset.ofRows(session, stamped)
      case other =>
        throw new IllegalStateException(
          s"checkpoint did not produce a LogicalRDD plan: ${other.getClass.getName}")
    }
  }
}
