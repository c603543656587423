package graft.plans

import org.apache.spark.sql.DataFrame

/** Planning-time shuffle-width sizing from leaf-relation input
  * statistics — the shared mechanism behind every operator whose
  * intermediate (wedges, candidate pairs, interval buckets) is orders
  * of magnitude larger than its input, where a fixed
  * `spark.sql.shuffle.partitions` that suits ordinary stages
  * under-partitions the heavy exchange and spills.
  *
  * The size signal is the sum of LEAF relation estimates under the
  * expression's optimized plan (file-size-derived, zero runtime cost —
  * the same signal broadcast-join thresholds use). Leaves, not the
  * top-level estimate: join-selectivity guesses multiply upward through
  * the tree, while input bytes are the honest proxy for data volume.
  *
  * Leaves with NO file-derived stats (in-memory/local relations,
  * non-file sources) report the `spark.sql.defaultSizeInBytes` sentinel
  * (Long.MaxValue by default) — those are EXCLUDED from the sum, so a
  * tiny in-memory test input falls back to `defaultParallelism` instead
  * of being clamped to the max width (4096 shuffle partitions of task
  * overhead on a 60-row fixture).
  */
object InputSizing {

  /** Sum of file-stat-backed leaf sizes (bytes) under `df`'s optimized
    * plan; leaves reporting the defaultSizeInBytes sentinel are ignored.
    */
  def statedInputBytes(df: DataFrame): BigInt = {
    val sentinel = BigInt(
      df.sparkSession.conf
        .get("spark.sql.defaultSizeInBytes", Long.MaxValue.toString)
        .toLong)
    df.queryExecution.optimizedPlan
      .collectLeaves()
      .map(_.stats.sizeInBytes)
      .filterNot(_ == sentinel)
      .sum
  }

  /** One shuffle partition per `bytesPerPartition` of stated input,
    * clamped to [defaultParallelism, maxWidth]. The default granularity
    * (1 MiB of INPUT per post-shuffle partition) is calibrated for
    * super-linear intermediates — at the 10x fixture it is the setting
    * that took the triangle closing join from 87.5 s (spilling at 32
    * partitions) to 40.2 s; linear-intermediate stages should pass a
    * coarser granularity.
    */
  def widthFor(
      df: DataFrame,
      bytesPerPartition: Long = 1L << 20,
      maxWidth: Int = 4096
  ): Int = {
    val base = df.sparkSession.sparkContext.defaultParallelism
    val est  = statedInputBytes(df) / bytesPerPartition
    math.min(maxWidth, math.max(base, est.min(BigInt(maxWidth)).toInt))
  }
}
