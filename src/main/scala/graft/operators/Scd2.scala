package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type 2 snapshot merge — set-based reformulation of the reference's
  * row-at-a-time upsert (K1: ETL/CSV_Batch_Processing.py:247-334).
  *
  * The reference collects the routed frame to the driver and issues one
  * UPDATE/INSERT per row against SQLite. That is the scalability cliff
  * (SURVEY §4). Here the merge is expressed as two distributed operations
  * over the snapshot:
  *
  *   1. close-out: active snapshot rows whose key appears among incoming
  *      UPDATEs get ACTIVE_FLAG=0 and END_DATE=loadTs
  *   2. append: all incoming INSERT/UPDATE rows enter with ACTIVE_FLAG=1,
  *      START_DATE=loadTs, END_DATE=endOfTime
  *
  * Both are key-partitioned joins/unions — no collect, no driver loop —
  * so the same code runs against a parquet/Delta snapshot of any size.
  * The incremental batch (updateKeys) is usually tiny relative to the
  * snapshot; Catalyst/AQE broadcasts it, making the close-out a
  * shuffle-free map-side join over the snapshot scan.
  */
object Scd2 {
  val ActiveFlag = "ACTIVE_FLAG"
  val StartDate  = "START_DATE"
  val EndDate    = "END_DATE"

  /** Merge routed incoming rows into an SCD2 snapshot.
    *
    * @param snapshot  current table state: payload + key + ACTIVE_FLAG/START_DATE/END_DATE
    * @param routed    incoming rows with CdcRouter.RouterCol attached; must
    *                  share the snapshot's payload columns (ROUTER_GROUP is
    *                  dropped here; DUPLICATEs are filtered out)
    * @param key       business-key column present on both sides
    * @param loadTs    batch load timestamp (a literal — frozen per batch,
    *                  matching the reference's datetime.now() semantics,
    *                  SURVEY §7.4 risk 5)
    * @param endOfTime open-end sentinel (reference: 2099-12-31)
    */
  def merge(
      snapshot: DataFrame,
      routed: DataFrame,
      key: String,
      loadTs: Column,
      endOfTime: Column
  ): DataFrame = {
    val incoming = CdcRouter
      .dropDuplicates(routed)
      .withColumn(ActiveFlag, lit(1))
      .withColumn(StartDate, loadTs)
      .withColumn(EndDate, endOfTime)

    val updateKeys = incoming
      .where(col(CdcRouter.RouterCol) === CdcRouter.Update)
      .select(col(key))
      .distinct()
      .withColumnRenamed(key, "__graft_upd_key")

    // Close out matched active rows; leave history rows untouched.
    val closed = snapshot
      .join(
        broadcast(updateKeys),
        snapshot(key) === col("__graft_upd_key") && snapshot(ActiveFlag) === 1,
        "left"
      )
      .withColumn(
        EndDate,
        when(col("__graft_upd_key").isNotNull, loadTs).otherwise(col(EndDate))
      )
      .withColumn(
        ActiveFlag,
        when(col("__graft_upd_key").isNotNull, lit(0)).otherwise(col(ActiveFlag))
      )
      .drop("__graft_upd_key")

    val cols = snapshot.columns.map(col).toSeq
    closed.select(cols: _*).unionByName(incoming.drop(CdcRouter.RouterCol).select(cols: _*))
  }

  /** Point-in-time snapshot reconstruction (time travel). An SCD2 table
    * IS a full history, so the state as of instant `ts` is exactly the
    * rows whose validity interval covers it: START_DATE <= ts < END_DATE
    * — half-open, so at the exact close-out instant of a version only
    * its successor is visible (never both, never neither).
    * A pure codegen'd filter over the snapshot scan — zero shuffle — and
    * on a lake partitioned by START_DATE the left bound prunes
    * partitions, so reconstructing an old state never reads rows born
    * after it.
    *
    * This library writes active rows with the 2099-12-31 end-of-time
    * sentinel, but snapshots ingested from systems that leave END_DATE
    * NULL for the active version would otherwise null-filter their
    * entire active set (`ts < NULL` is NULL) — coalesce treats NULL as
    * open-ended. The sentinel is CAST to END_DATE's own type so the
    * comparison domain never silently shifts with the snapshot's column
    * type (a bare string literal would coerce a timestamp-typed
    * END_DATE's coalesce to string comparison). Stays a codegen'd scan
    * filter either way.
    */
  def asOf(snapshot: DataFrame, ts: Column): DataFrame = {
    val sentinel = lit("9999-12-31 23:59:59").cast(snapshot.schema(EndDate).dataType)
    snapshot.where(col(StartDate) <= ts && ts < coalesce(col(EndDate), sentinel))
  }

  /** CDC change feed between two instants: every version OPENED in
    * (fromTs, toTs] (an insert or a new version of an updated key) and
    * every version CLOSED in it, tagged `change_type` OPEN/CLOSE — the
    * downstream-consumer view of a mart ("what changed since my last
    * sync?") derived purely from the SCD2 date columns. Two codegen'd
    * scan filters + a union: zero shuffle; on a lake partitioned by
    * START_DATE the open branch prunes to the window's partitions.
    * Open-ended rows (NULL or sentinel END_DATE beyond toTs) never
    * appear as closes — `NULL > fromTs` is NULL and filters out.
    */
  def changeFeed(snapshot: DataFrame, fromTs: Column, toTs: Column): DataFrame = {
    val opens = snapshot
      .where(col(StartDate) > fromTs && col(StartDate) <= toTs)
      .withColumn("change_type", lit("OPEN"))
    val closes = snapshot
      .where(col(EndDate) > fromTs && col(EndDate) <= toTs)
      .withColumn("change_type", lit("CLOSE"))
    opens.unionByName(closes)
  }

  /** Active-rows probe projection for the next CDC round (reference S2). */
  def activeProbe(snapshot: DataFrame, key: String, hash: String, id: String): DataFrame =
    snapshot
      .where(col(ActiveFlag) === 1)
      .select(
        col(id).as(s"HISTORIC_$id"),
        col(key).as("HISTORIC_SSI"),
        col(hash).as("HISTORIC_HASHKEY")
      )
}
