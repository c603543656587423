package graft.conform

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The three deterministic source feeds synthesized from `orders` — the
  * ONE definition both the per-source conform oracle queries and the
  * end-to-end pipeline harness build on (and whose DuckDB oracles
  * replicate column by column; any edit here must update those SQL
  * twins in ConformQueries/PipelineQueries).
  *
  * `variant`: when set, rows with key % 7 == 0 carry a `_v$n`-suffixed
  * status — the e2e harness's day-2 mutation that routes those keys as
  * UPDATEs (the suffix lands on each source's hash-covered status
  * column: CALL_STATUS / STATUS_OF_CUSTOMER_INCIDENT /
  * STATUS_OF_INTERACTION). `None` = the pristine feed.
  */
object SyntheticFeeds {
  private def orders(s: SparkSession, dir: String): DataFrame =
    // testdata parquet is one row group = one input split; without an
    // explicit repartition the whole parse+hash map stage of the conform
    // pipeline runs in a single task
    Tables.orders(s, dir).repartition(s.sparkContext.defaultParallelism)

  private def mutated(variant: Option[Int]): org.apache.spark.sql.Column = {
    val k = col("o_orderkey")
    variant match {
      case Some(v) =>
        when(k % 7 === 0, concat(col("o_orderstatus"), lit(s"_v$v")))
          .otherwise(col("o_orderstatus"))
      case None => col("o_orderstatus")
    }
  }

  /** CSV ("AT&T") feed — 13 raw string columns. */
  def csv(s: SparkSession, dir: String, variant: Option[Int] = None): DataFrame = {
    val k = col("o_orderkey")
    orders(s, dir).select(
      k.cast("int").as("TICKET_IDENTIFIER"),
      when(k % 2 === 0, "Billing").otherwise("Tech").as("SUPPORT_CATEGORY"),
      concat(lit("agent_"), (k % 3).cast("string")).as("AGENT_NAME"),
      concat(date_format(col("o_orderdate"), "MMddyyyy"), lit("103000")).as("DATE_OF_CALL"),
      mutated(variant).as("CALL_STATUS"),
      col("o_orderpriority").as("CALL_TYPE"),
      when(k % 2 === 0, "Corporate").otherwise("Retail").as("TYPE_OF_CUSTOMER"),
      (k % 100 + 1).cast("string").as("DURATION"),
      (k % 37).cast("string").as("WORK_TIME"),
      col("o_orderstatus").as("TICKET_STATUS"),
      when(k % 2 === 0, "1").otherwise("0").as("RESOLVED_IN_FIRST_CONTACT"),
      concat(lit("SOL_"), (k % 4).cast("string")).as("RESOLUTION_CATEGORY"),
      when(k % 3 === 0, "BEST").when(k % 3 === 1, "GOOD").otherwise("BAD").as("RATING")
    )
  }

  /** JSON ("AMAZON") feed — 13 columns, typed durations. */
  def json(s: SparkSession, dir: String, variant: Option[Int] = None): DataFrame = {
    val k = col("o_orderkey")
    orders(s, dir).select(
      k.cast("int").as("INTERACTION_ID"),
      when(k % 2 === 0, "Billing").otherwise("Tech").as("SUPPORT_CATEGORY"),
      concat(lit("agent_"), (k % 3).cast("string")).as("AGENT_PSEUDO_NAME"),
      concat(date_format(col("o_orderdate"), "dd/MM/yyyy"), lit(" 10:30:00")).as("CONTACT_DATE"),
      col("o_orderstatus").as("INTERACTION_STATUS"),
      col("o_orderpriority").as("INTERACTION_TYPE"),
      when(k % 2 === 0, "Corporate").otherwise("Retail").as("TYPE_OF_CUSTOMER"),
      (k % 100 + 1).cast("int").as("INTERACTION_DURATION"),
      (k % 100 + 1 + k % 37).cast("int").as("TOTAL_TIME"),
      mutated(variant).as("STATUS_OF_CUSTOMER_INCIDENT"),
      when(k % 2 === 0, "yes").otherwise("NO").as("RESOLVED_IN_FIRST_CONTACT"),
      concat(lit("SOL_"), (k % 4).cast("string")).as("SOLUTION_TYPE"),
      (k % 10 + 1).cast("int").as("RATING")
    )
  }

  /** XML ("UBER") feed — 14 columns, H:MM:SS durations. */
  def xml(s: SparkSession, dir: String, variant: Option[Int] = None): DataFrame = {
    val k = col("o_orderkey")
    orders(s, dir).select(
      k.cast("int").as("SUPPORT_IDENTIFIER"),
      when(k % 2 === 0, "Billing").otherwise("Tech").as("CONTACT_REGARDING"),
      concat(lit("agent_"), (k % 3).cast("string")).as("AGENT_CODE"),
      concat(date_format(col("o_orderdate"), "yyyyMMdd"), lit("103000")).as("DATE_OF_INTERACTION"),
      mutated(variant).as("STATUS_OF_INTERACTION"),
      col("o_orderpriority").as("TYPE_OF_INTERACTION"),
      when(k % 2 === 0, "Corporate").otherwise("Retail").as("CUSTOMER_TYPE"),
      Durations.secondsToHms(k % 7200 + 30).as("CONTACT_DURATION"),
      Durations.secondsToHms(k % 3600).as("AFTER_CONTACT_WORK_TIME"),
      col("o_orderstatus").as("INCIDENT_STATUS"),
      when(k % 2 === 0, "true").otherwise("FALSE").as("FIRST_CONTACT_RESOLUTION"),
      concat(lit("SOL_"), (k % 4).cast("string")).as("SOLUTION"),
      ((k % 5) + 1).cast("string").as("RATING"),
      concat(date_format(col("o_orderdate"), "yyyyMMdd"), lit("103000")).as("TIME_STAMP")
    )
  }
}
