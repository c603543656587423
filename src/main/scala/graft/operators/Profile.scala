package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the audit stage an ETL pipeline runs before
  * trusting a feed (complements the persisted load audit,
  * reference: Setup/SQL_DDL_Script.sql CSD_DATA_LOADS and the validity
  * decode of the conform stage).
  *
  * One scan of the input produces one row per profiled column:
  * row count, null count, exact distinct count, and min/max rendered as
  * strings (portable across engines and column types).
  *
  * Scale shape: a single aggregation — Spark plans the multi-column
  * DISTINCT aggregates with one Expand (input multiplied by the number
  * of distinct aggregates, then partial-aggregated map-side before one
  * shuffle). That trades |cols| x input volume through the FIRST partial
  * aggregate for a single pass over the data — the standard profiling
  * trade; for very wide tables profile in column batches. Exact distinct
  * (not approx_count_distinct/HLL) keeps the result engine-portable for
  * the oracle; swap in approx_count_distinct when a ±2 % estimate is
  * acceptable at 100 TB.
  */
object Profile {
  /** (column, n_rows, n_null, n_distinct, min_val, max_val) per column. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "must profile at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")
      )
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n_rows"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val")
      )
    }
    one
      .select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
  }

  /** floor(log2(`expr`)) for values >= 1, as a SQL expression valid in
    * BOTH Spark SQL and DuckDB (a chain of integer comparisons — no
    * floating log whose ulp behavior could differ between engines).
    * Values < 1 land in bucket -1 by convention (empty docs).
    * `maxBits` bounds the value range: values below 2^maxBits bucket
    * exactly.
    */
  def log2BucketSql(expr: String, maxBits: Int = 40): String = {
    val terms = (1 to maxBits)
      .map(i => s"(CASE WHEN ($expr) >= ${1L << i} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"(CASE WHEN ($expr) < 1 THEN -1 ELSE $terms END)"
  }

  /** Log2-bucketed histogram of a non-negative measure: one row per
    * occupied bucket with count and exact min/max. The distribution-
    * shape companion to [[profileColumns]] (length histograms are the
    * standard first look at a text corpus); single shuffled aggregation
    * on ~64 keys.
    */
  def log2Histogram(df: DataFrame, measureCol: String): DataFrame =
    df.groupBy(
        org.apache.spark.sql.functions.expr(log2BucketSql(measureCol)).as("bucket")
      )
      .agg(
        count(lit(1)).as("n"),
        min(col(measureCol)).as("lo"),
        max(col(measureCol)).as("hi")
      )
}
