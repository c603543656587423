package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness-provided parquet tables (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst can push filters and
  * prune columns into the scan (`PushedFilters` / `ReadSchema`) — callers
  * should `.select`/`.where` as early as possible and let the optimizer
  * do the rest. At cluster scale these would be partitioned/bucketed
  * tables; nothing here assumes a local filesystem.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` has shipped in two generations of the test fixtures:
    * parquet TIMESTAMP(NANOS) (which Spark's reader only surfaces as a raw
    * Long under `spark.sql.legacy.parquet.nanosAsLong`) and plain
    * TIMESTAMP(MICROS). Branch on the *actual* schema so both stay
    * readable; the conversion to micro-precision happens executor-side
    * (`timestamp_micros(ns div 1000)`), no driver work.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        // TIMESTAMP_NTZ (parquet micros, isAdjustedToUTC=false) → session-tz
        // TIMESTAMP so every downstream epoch function (unix_micros, window,
        // etc.) resolves; identity on wall-clock under the UTC session tz.
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
