package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted load audit — twin of the reference's CSD_DATA_LOADS table
  * (Setup/SQL_DDL_Script.sql:92-104): one row per load with status,
  * bounds, upsert/valid/invalid counts and the data-valid ratio.
  *
  * An append-only parquet table: each load appends exactly one row (tiny
  * driver-side frame — audit rows are per-LOAD, not per-record, so this
  * is O(loads), never O(data)). The valid ratio is stored as permille
  * (BIGINT) rather than a float percentage so downstream checks and
  * cross-engine compares stay exact.
  */
object AuditSink {
  val Schema: StructType = StructType(
    Seq(
      StructField("DATA_LOAD_ID", LongType, nullable = false),
      StructField("DAG_ID", StringType),
      StructField("LOAD_STATUS", StringType, nullable = false),
      StructField("LOAD_START_DATE", StringType, nullable = false),
      StructField("LOAD_END_DATE", StringType),
      StructField("TOTAL_UPSERT_COUNT", LongType),
      StructField("VALID_COUNT", LongType),
      StructField("INVALID_COUNT", LongType),
      StructField("DATA_VALID_PERMILLE", LongType),
      StructField("LOAD_DURATION", StringType)
    )
  )

  /** floor(valid * 1000 / total), 0 for empty loads — integer arithmetic,
    * bit-identical in any engine.
    */
  def validPermille(counts: AuditCounts): Long =
    if (counts.total == 0) 0L else counts.valid * 1000L / counts.total

  /** Append one audit row for a completed load. */
  def record(
      spark: SparkSession,
      path: String,
      dataLoadId: Long,
      dagId: String,
      status: String,
      loadStart: String,
      loadEnd: String,
      counts: AuditCounts
  ): Unit = {
    val row = org.apache.spark.sql.Row(
      dataLoadId,
      dagId,
      status,
      loadStart,
      loadEnd,
      counts.total,
      counts.valid,
      counts.invalid,
      validPermille(counts),
      null // LOAD_DURATION: derivable from bounds; reference keeps both
    )
    spark
      .createDataFrame(java.util.List.of(row), Schema)
      .coalesce(1)
      .write
      .mode(SaveMode.Append)
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schema).parquet(path)

  /** Latest audit row per DAG — recovery probe ("did this load finish?"),
    * mirrors the reference's UNIQUE(DAG_ID) bookkeeping.
    */
  def latestPerDag(audits: DataFrame): DataFrame =
    graft.operators.Dedup.latestByVersion(audits, "DAG_ID", "DATA_LOAD_ID")
}
