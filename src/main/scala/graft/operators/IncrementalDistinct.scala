package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained DISTINCT-count view — the sketch-backed
  * sibling of [[IncrementalAgg]]. Distinct counts are not algebraic
  * (two groups' counts don't add when their value sets overlap), so the
  * stored state is a per-group Apache DataSketches HLL sketch
  * (`hll_sketch_agg`, binary column): sketches MERGE losslessly
  * (`hll_union_agg` is a register-wise max for a shared lgK), which
  * restores the O(delta) refresh discipline — the fact history is never
  * rescanned, and re-loading the same rows is a no-op (union is
  * idempotent: the property count/sum maintenance fundamentally lacks).
  *
  * At 100 TB the view is |groups| rows x ~2^lgK bytes; refresh cost is
  * one partial-agg'd shuffle of the delta (sketches combine map-side)
  * plus a group-keyed merge against the group-sized store. Estimates
  * carry ~1.04/sqrt(2^lgK) relative standard error (1.6% at the
  * default lgK 12); exact distinct at unbounded cardinality is
  * precisely what this path exists to avoid. Estimates are
  * deterministic (hash-based, no RNG) but implementation-defined, so
  * correctness is spec-pinned as an error BOUND vs exact counts plus
  * the incremental==direct equivalence, and the gate query verifies
  * the bound as data (a per-group within-tolerance flag the DuckDB
  * oracle computes from exact counts).
  */
object IncrementalDistinct {
  val DefaultLgK = 12

  /** One row per group: (groupCols..., sketch) over `valueCol`. */
  def sketches(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lgK: Int = DefaultLgK
  ): DataFrame = {
    require(groupCols.nonEmpty, "need group columns")
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sketch"))
  }

  /** Merge the stored view with a delta's sketches: groups on one side
    * pass through (a single-sketch union is itself), shared groups
    * union register-wise. One group-keyed agg — no fact-sized data.
    */
  def merge(view: DataFrame, delta: DataFrame, groupCols: Seq[String]): DataFrame =
    view
      .select((groupCols.map(col) :+ col("sketch")): _*)
      .unionByName(delta.select((groupCols.map(col) :+ col("sketch")): _*))
      .groupBy(groupCols.map(col): _*)
      .agg(expr("hll_union_agg(sketch, true)").as("sketch"))

  /** Readback: per-group distinct estimates from the stored sketches. */
  def estimates(view: DataFrame, groupCols: Seq[String]): DataFrame =
    view.select(
      groupCols.map(col) :+ expr("hll_sketch_estimate(sketch)").as("n_distinct_est"): _*)

  /** Rolling-window distinct counts from per-day sketches — the
    * unbounded-cardinality sibling of the exact coverage-expansion
    * rolling distinct (t_rolling_distinct_users): distinct-count does
    * not decompose over sliding windows, but per-day HLL sketches DO
    * union — so the rolling DAU/WAU metric becomes |days| sketch rows
    * (not |facts|) exploded onto the `nDays` window-ends each day
    * covers and union-merged per window end. At 100 TB the per-day
    * sketch table is the thing you persist (via [[refresh]] per daily
    * load); this computes the window readback. Returns
    * (day, n_distinct_est) for every window END day present.
    */
  def rollingDistinctEstimates(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      nDays: Int,
      lgK: Int = DefaultLgK
  ): DataFrame = {
    require(nDays >= 1, s"nDays must be >= 1, got $nDays")
    val daily = df
      .withColumn("__day", to_date(col(tsCol)))
      .groupBy(col("__day"))
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sketch"))
    val days = daily.select(col("__day"))
    daily
      // each day's sketch serves the nDays window-ends that cover it
      .withColumn("day", explode(expr(s"sequence(__day, date_add(__day, ${nDays - 1}))")))
      .groupBy(col("day"))
      .agg(expr("hll_union_agg(sketch, true)").as("sketch"))
      // only days that exist in the data are valid window ends
      .join(days.withColumnRenamed("__day", "day"), Seq("day"), "left_semi")
      .select(col("day"), expr("hll_sketch_estimate(sketch)").as("n_distinct_est"))
  }

  /** Bootstrap-or-refresh a parquet-backed sketch view: sketch the
    * delta, merge with the stored view when one exists, write aside,
    * swap (the crash-safe rename discipline of [[IncrementalAgg]]).
    */
  def refresh(
      spark: SparkSession,
      viewPath: String,
      delta: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lgK: Int = DefaultLgK
  ): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val p  = new org.apache.hadoop.fs.Path(viewPath)
    val tmp = new org.apache.hadoop.fs.Path(viewPath + ".staging")
    val bak = new org.apache.hadoop.fs.Path(viewPath + ".bak")
    // crash window recovery: between "rename view aside" and "rename
    // staging in" only the .bak exists — without this restore the next
    // refresh would take the bootstrap branch and silently rebuild the
    // view from the latest delta alone, losing all accumulated history
    if (!fs.exists(p) && fs.exists(bak)) fs.rename(bak, p)
    val deltaSk = sketches(delta, groupCols, valueCol, lgK)
    val next =
      if (fs.exists(p)) merge(spark.read.parquet(viewPath), deltaSk, groupCols)
      else deltaSk
    fs.delete(tmp, true)
    next.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(p)) fs.rename(p, bak)
    fs.rename(tmp, p)
    fs.delete(bak, true)
    spark.read.parquet(viewPath)
  }
}
