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
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it as a raw
    * Long (legacy nanosAsLong) and convert to a micro-precision timestamp
    * executor-side (`timestamp_micros(ns div 1000)`).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
