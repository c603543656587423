package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained aggregate view — the materialized-rollup
  * primitive: a per-group (count, sum, min, max) table kept current
  * under append-only loads by merging the STORED aggregates with the
  * DELTA's aggregates, never rescanning history. The same O(delta)
  * discipline as the bucketed SCD2 merge and the incremental dedup
  * store, applied to aggregation.
  *
  * Only ALGEBRAIC aggregates participate: count/sum merge by +, min/max
  * by least/greatest — each group's stored row and delta row combine
  * into one row with no information loss, so
  * `refresh(refresh(init, d1), d2) == aggregate(full)` EXACTLY
  * (integer/decimal inputs; IncrementalAggSpec pins the equivalence and
  * the oracle recomputes from the full table). Non-algebraic aggregates
  * (distinct counts, percentiles) need sketches — see SketchSpec for
  * the bounded-memory paths.
  *
  * Scale shape per refresh: one partial-agg'd shuffle of the DELTA on
  * the group key plus a group-keyed full-outer merge against the stored
  * view (view side is group-cardinality, not fact-cardinality). The
  * fact history is never read again.
  */
object IncrementalAgg {

  /** Aggregate a slice into the view shape: one row per group with
    * n_rows / sum_<v> / min_<v> / max_<v> per value column.
    */
  def aggregate(df: DataFrame, groupCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && valueCols.nonEmpty, "need group and value columns")
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        valueCols.flatMap { v =>
          Seq(sum(col(v)).as(s"sum_$v"), min(col(v)).as(s"min_$v"), max(col(v)).as(s"max_$v"))
        }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge the stored view with a new delta's aggregates. Groups seen
    * only on one side pass through; shared groups combine algebraically.
    */
  def merge(view: DataFrame, delta: DataFrame, groupCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val a = view.select(
      groupCols.map(col) :+ struct(view.columns.filterNot(groupCols.contains).map(col): _*).as("__a"): _*)
    val b = delta.select(
      groupCols.map(col) :+ struct(delta.columns.filterNot(groupCols.contains).map(col): _*).as("__b"): _*)
    val merged = a.join(b, groupCols, "full_outer")
    val outCols: Seq[Column] =
      coalesce(col("__a.n_rows"), lit(0L)).plus(coalesce(col("__b.n_rows"), lit(0L))).as("n_rows") +:
        valueCols.flatMap { v =>
          Seq(
            // sum over an all-null column is NULL on either side; treat
            // missing-side as identity, keep NULL+NULL = NULL
            when(col(s"__a.sum_$v").isNull && col(s"__b.sum_$v").isNull, lit(null))
              .otherwise(coalesce(col(s"__a.sum_$v"), lit(0)) + coalesce(col(s"__b.sum_$v"), lit(0)))
              .as(s"sum_$v"),
            least(col(s"__a.min_$v"), col(s"__b.min_$v")).as(s"min_$v"),
            greatest(col(s"__a.max_$v"), col(s"__b.max_$v")).as(s"max_$v")
          )
        }
    merged.select(groupCols.map(col) ++ outCols: _*)
  }

  /** Bootstrap-or-refresh against a parquet-backed view path: aggregates
    * the delta, merges with the stored view when one exists, writes the
    * refreshed view aside and swaps (crash-safe rename discipline), and
    * returns the refreshed view.
    */
  def refresh(
      spark: SparkSession,
      viewPath: String,
      delta: DataFrame,
      groupCols: Seq[String],
      valueCols: Seq[String]
  ): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(viewPath)
    val tmp = new org.apache.hadoop.fs.Path(viewPath + ".staging")
    val bak = new org.apache.hadoop.fs.Path(viewPath + ".bak")
    // crash window recovery: between "rename view aside" and "rename
    // staging in" only the .bak exists — without this restore the next
    // refresh would take the bootstrap branch and silently rebuild the
    // view from the latest delta alone, losing all accumulated history
    if (!fs.exists(p) && fs.exists(bak)) fs.rename(bak, p)
    val deltaAgg = aggregate(delta, groupCols, valueCols)
    val next =
      if (fs.exists(p)) merge(spark.read.parquet(viewPath), deltaAgg, groupCols, valueCols)
      else deltaAgg
    fs.delete(tmp, true)
    next.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(p)) fs.rename(p, bak)
    fs.rename(tmp, p)
    fs.delete(bak, true)
    spark.read.parquet(viewPath)
  }
}
