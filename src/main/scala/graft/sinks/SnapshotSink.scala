package graft.sinks

import graft.operators.{CdcRouter, Scd2}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** SCD2 snapshot persistence (K1) + load audit (K3).
  *
  * The reference upserts row-at-a-time into SQLite from the driver
  * (ETL/CSV_Batch_Processing.py:247-334). At 100 TB the mart must live in
  * a distributed table; this sink maintains it as a parquet snapshot
  * directory with atomic swap semantics (write new snapshot to a temp
  * path, then move). On a lakehouse this maps 1:1 to `MERGE INTO`
  * (deactivate-match + insert-all) on Delta/Iceberg; the merge logic
  * itself (graft.operators.Scd2.merge) is shared and set-based.
  */
object SnapshotSink {
  /** Read the current snapshot, or an empty frame with `schema` when the
    * mart does not exist yet (mirrors database_df_maker's empty-path,
    * ETL/CSV_Batch_Processing.py:36-43).
    */
  def readSnapshot(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType
  ): DataFrame = {
    val fs  = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    // crash recovery: a crash between "rename dst aside" and "rename
    // staging in" leaves only the .bak — restore it before reading so no
    // load ever observes a missing mart
    if (!fs.exists(dst) && fs.exists(bak)) fs.rename(bak, dst)
    if (fs.exists(dst))
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Merge the routed batch into the snapshot at `path` and swap it in.
    * Returns the audit counts for the load (K3).
    */
  /** Merge the routed batch into the snapshot at `path` and swap it in.
    * `partitionBy` lays the snapshot out as hive-style partition dirs
    * (e.g. SOURCE_ID, or SOURCE_ID + a date bucket): at mart scale the
    * next load's active-row probe and the close-out join then prune to
    * the touched partitions instead of scanning the whole table.
    */
  def upsert(
      spark: SparkSession,
      path: String,
      routed: DataFrame,
      key: String,
      loadTs: Column,
      endOfTime: Column,
      validCol: Option[String] = None,
      partitionBy: Seq[String] = Nil
  ): AuditCounts = {
    // first-run snapshot must already carry the SCD2 columns Scd2.merge
    // reads on the snapshot side (dates ride as 'yyyy-MM-dd HH:mm:ss'
    // strings at this boundary, the reference's TEXT-date convention F13)
    val base = routed.drop(CdcRouter.RouterCol).schema
    val scdFields = Seq(
      org.apache.spark.sql.types.StructField(Scd2.ActiveFlag, org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField(Scd2.StartDate, org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(Scd2.EndDate, org.apache.spark.sql.types.StringType)
    ).filterNot(f => base.fieldNames.contains(f.name))
    val current =
      readSnapshot(spark, path, org.apache.spark.sql.types.StructType(base.fields ++ scdFields))
    val merged  = Scd2.merge(current, routed, key, loadTs, endOfTime)

    val tmp    = path + ".staging"
    val writer = merged.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(tmp)

    // audit BEFORE the swap: routed's lineage reads the pre-swap snapshot
    // files, which the rename below replaces (lazy evaluation would
    // otherwise re-scan paths that no longer exist)
    val counts = audit(CdcRouter.dropDuplicates(routed), validCol)

    // crash-safe swap: the old snapshot is renamed ASIDE (never deleted
    // before the new one is in place), so every crash point leaves either
    // the old or the new snapshot recoverable — readSnapshot restores a
    // dangling .bak on the next load
    val fs  = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    if (fs.exists(bak)) fs.delete(bak, true) // leftover from a completed prior swap
    if (fs.exists(dst)) fs.rename(dst, bak)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    fs.delete(bak, true)

    counts
  }

  /** One aggregation pass over the loaded batch (replaces the reference's
    * driver-side per-row counters, ETL/CSV_Batch_Processing.py:258-329).
    */
  def audit(loaded: DataFrame, validCol: Option[String]): AuditCounts = {
    // coalesce: sum() over an all-DUPLICATE (empty) batch is NULL
    val validExpr =
      validCol.map(c => coalesce(sum(col(c)).cast("long"), lit(0L))).getOrElse(count(lit(1)))
    val row = loaded
      .agg(count(lit(1)).as("total"), validExpr.as("valid"))
      .head()
    val total = row.getLong(0)
    val valid = row.getLong(1)
    AuditCounts(total, valid, total - valid)
  }
}

/** Load-audit result row (reference CSD_DATA_LOADS,
  * Setup/SQL_DDL_Script.sql:92-104).
  */
final case class AuditCounts(total: Long, valid: Long, invalid: Long) {
  def validPercentage: Double = if (total == 0) 0.0 else valid.toDouble / total * 100.0
}
