package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-stage (salted) grouping for the case
  * where the group-key cardinality is far below the cluster's
  * parallelism or a few keys dominate the data (the classic 100 TB
  * failure mode: one reducer owns the hot key while the rest idle).
  *
  * Stage 1 groups by (key, salt) — `nSalts` deterministic buckets from a
  * hash of `saltFrom` columns — producing at most |keys| * nSalts
  * partial rows spread across the cluster with map-side combine; stage 2
  * re-groups the partials by key alone. Both stages are ordinary
  * hash aggregations, so AQE still coalesces/plans them; the only cost
  * is one extra (tiny) shuffle of the partials.
  *
  * Only ALGEBRAIC aggregates decompose this way (sum/count/min/max —
  * sums must be over exact types: Long or DECIMAL, since double addition
  * is not associative and salting would change the result bits).
  */
object Skew {
  /** count + exact decimal sums per key, salted. `sums` maps output
    * column name -> numeric column to sum (cast to an exact type by the
    * caller).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFrom: Seq[String],
      nSalts: Int,
      sums: Map[String, Column]
  ): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = df.withColumn("__salt", pmod(hash(saltFrom.map(col): _*), lit(nSalts)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        count(lit(1)).as("__cnt"),
        sums.toSeq.sortBy(_._1).map { case (name, c) => sum(c).as(s"__s_$name") }: _*
      )
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__cnt")).as("n_rows"),
        sums.keys.toSeq.sorted.map(name => sum(col(s"__s_$name")).as(name)): _*
      )
  }
}
