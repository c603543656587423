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

  /** Skew-hardened variant of [[route]] for feeds where one business key
    * dominates (a mass-default key, a tombstone value): a plain
    * equi-join shuffles every hot-key row into ONE task. AQE's skew-join
    * split handles sort-merge cases adaptively, but it only fires on
    * runtime size thresholds and not for every join strategy — this is
    * the deterministic fix for a KNOWN hot key pattern.
    *
    * The feed side gets a salt from its row FINGERPRINT (already unique
    * per logical row, so hot-key rows spread uniformly across `nSalts`
    * buckets with no RNG); the historic side replicates each probe row
    * `nSalts` times via explode. Join on (key, salt): left-join
    * semantics, match results, and routing are IDENTICAL to [[route]]
    * (CdcSkewSpec pins equality); the hot key's rows now land on
    * `nSalts` tasks. Cost: historic shuffles nSalts-fold — use only
    * when historic is too big to broadcast yet far smaller than the
    * skewed feed, the regime where the hot task is the bottleneck.
    */
  def routeSalted(
      feed: DataFrame,
      historic: DataFrame,
      feedKey: String,
      feedHash: String,
      histKey: String,
      histHash: String,
      probeOnHash: Boolean = false,
      nSalts: Int = 16
  ): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val sf = feed.withColumn("__salt_f", pmod(hash(feed(feedHash)), lit(nSalts)))
    val sh = historic.withColumn("__salt_h", explode(array((0 until nSalts).map(lit): _*)))
    val joined = sf.join(
      sh,
      sf(feedKey) === sh(histKey) && sf("__salt_f") === sh("__salt_h"),
      "left"
    )
    val missProbe: Column =
      if (probeOnHash) sh(histHash).isNull else sh(histKey).isNull
    joined
      .withColumn(
        RouterCol,
        when(missProbe, Insert)
          .when(sf(feedHash) === sh(histHash), Duplicate)
          .otherwise(Update)
      )
      .drop("__salt_f", "__salt_h")
  }
}
