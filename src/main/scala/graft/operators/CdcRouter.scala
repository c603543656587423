package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC routing — the INSERT / UPDATE / DUPLICATE decision at the heart of
  * the reference's pipelines (ETL/CSV_Batch_Processing.py:150-162, §2.11).
  *
  * Probe the set of currently-active historic rows with a left outer
  * equi-join on the business key, then route:
  *   - no historic match            -> INSERT
  *   - match, fingerprint equal     -> DUPLICATE (no-op, filtered out)
  *   - match, fingerprint differs   -> UPDATE (SCD2 close-out + insert)
  *
  * Scale notes: the historic side is pre-filtered to active rows of one
  * source and projected to (key, hash, id) before the join — at 100 TB
  * that is the slice that must stay join-sized, and Catalyst/AQE will
  * pick broadcast-hash when it fits (callers can force it via
  * `broadcast(historic)`). The feed side shuffles once on the key.
  */
object CdcRouter {
  val Insert    = "INSERT"
  val Update    = "UPDATE"
  val Duplicate = "DUPLICATE"
  val RouterCol = "ROUTER_GROUP"

  /** Left-join the feed against the historic probe and attach ROUTER_GROUP.
    *
    * @param feed      deduplicated feed rows carrying `feedKey` and `feedHash`
    * @param historic  probe rows carrying `histKey` and `histHash`
    *                  (pre-filtered to ACTIVE rows of the feed's source)
    * @param probeOnHash reference variant switch: XML routes on
    *                  HISTORIC_HASHKEY IS NULL where CSV/JSON route on the
    *                  key column (ETL/XML_Batch_Processing.py:199 vs
    *                  ETL/CSV_Batch_Processing.py:157) — same outcome,
    *                  kept for strict parity.
    */
  def route(
      feed: DataFrame,
      historic: DataFrame,
      feedKey: String,
      feedHash: String,
      histKey: String,
      histHash: String,
      probeOnHash: Boolean = false
  ): DataFrame = {
    val joined = feed.join(historic, feed(feedKey) === historic(histKey), "left")
    // resolve every probe column against its own side: bare col() would
    // throw (or silently bind the wrong side) whenever feed and historic
    // share a column name, and the public API must not rely on callers
    // pre-renaming
    val missProbe: Column =
      if (probeOnHash) historic(histHash).isNull else historic(histKey).isNull
    joined.withColumn(
      RouterCol,
      when(missProbe, Insert)
        .when(feed(feedHash) === historic(histHash), Duplicate)
        .otherwise(Update)
    )
  }

  /** Drop DUPLICATE rows (reference P5: filter ROUTER_GROUP != "DUPLICATE"). */
  def dropDuplicates(routed: DataFrame): DataFrame =
    routed.where(col(RouterCol) =!= Duplicate)
}
