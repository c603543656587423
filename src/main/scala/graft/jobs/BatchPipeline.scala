package graft.jobs

import graft.conform.Validity
import graft.functions.Fingerprint
import graft.operators.{CdcRouter, Dedup, Scd2}
import graft.sinks.{AuditCounts, SnapshotSink}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One incremental-feed load, end to end — the reference's
  * CSV/JSON/XML `main()` lifecycle (SURVEY §3, §2.11) as a library call:
  *
  *   dedup (W1) -> fingerprint (F1-F3) -> key-prefix (F4) -> validity
  *   flag (F6) -> probe actives (S2/J1) -> route (§2.11 step 4) ->
  *   SCD2 merge + audit (K1/K3)
  *
  * Per-source conform (timestamp formats, decoders) happens in the feed
  * frame BEFORE this call, exactly as each reference pipeline conforms
  * before hashing — so hashes cover post-conform values for JSON/XML and
  * raw strings for CSV, matching the per-pipeline hash canon (SURVEY
  * §7.4 risk 1).
  *
  * Scale: every step is a distributed set operation — one window shuffle
  * for dedup, a broadcast probe join, a broadcast close-out join in the
  * merge. No collect, no driver loops; the snapshot is parquet (Delta /
  * Iceberg MERGE INTO at deployment).
  */
final case class FeedSpec(
    keyCol: String,             // business id column in the feed
    sourcePrefix: String,       // SSI prefix, e.g. "AT&T - " (F4)
    tiebreak: Seq[Column],      // deterministic latest-wins order (W1)
    mandatoryCols: Seq[String], // validity-checked columns (F6)
    // technical columns (e.g. the archive's archive_id) that may drive
    // the dedup tiebreak but are NOT business payload: excluded from the
    // row fingerprint and dropped after dedup, so a replayed record with
    // a fresh technical id still hashes identical and routes DUPLICATE
    // (the reference's batch processor likewise hashes business columns
    // only — ETL/XML_Batch_Processing.py:80-83 vs its RECORD_ID).
    nonPayloadCols: Seq[String] = Nil
)

object BatchPipeline {
  val SsiCol   = "SOURCE_SYSTEM_IDENTIFIER"
  val HashCol  = "SOURCE_HASH_KEY"
  val ValidCol = "IS_VALID_DATA"

  /** Steps 1-2 + flags: dedup, fingerprint over ALL feed columns in feed
    * order (before prefixing — §2.11 step 2), source-qualified key,
    * validity flag. Invalid rows are kept and flagged, never dropped
    * (reference loads them with IS_VALID_DATA=0).
    */
  def conformFeed(feed: DataFrame, spec: FeedSpec): DataFrame = {
    val payloadCols = feed.columns.toSeq.filterNot(spec.nonPayloadCols.contains)
    Dedup
      .latestPerKey(feed, Seq(spec.keyCol), spec.tiebreak)
      .drop(spec.nonPayloadCols: _*)
      .withColumn(HashCol, Fingerprint.rowHash(payloadCols.map(col)))
      .withColumn(SsiCol, concat(lit(spec.sourcePrefix), col(spec.keyCol).cast("string")))
      .withColumn(ValidCol, Validity.flag(spec.mandatoryCols.map(col)))
  }

  /** Probe the snapshot's active rows and attach ROUTER_GROUP. */
  def route(conformed: DataFrame, snapshot: DataFrame): DataFrame = {
    val probe = snapshot
      .where(col(Scd2.ActiveFlag) === 1)
      .select(col(SsiCol).as("__hssi"), col(HashCol).as("__hhash"))
    CdcRouter
      .route(conformed, broadcast(probe), SsiCol, HashCol, "__hssi", "__hhash")
      .drop("__hssi", "__hhash")
  }

  /** [[route]] without the broadcast hint — the probe path when the
    * active set outgrows broadcast range and the join must go
    * sort-merge. Paired with a mart stored as a table bucketed on the
    * business key ([[graft.sinks.SnapshotSink.writeMartBucketedTable]])
    * the mart side reads pre-hash-partitioned buckets with NO exchange;
    * only the delta-sized feed shuffles (BucketedMartSpec pins it).
    */
  def routeSortMerge(conformed: DataFrame, snapshot: DataFrame): DataFrame = {
    val probe = snapshot
      .where(col(Scd2.ActiveFlag) === 1)
      .select(col(SsiCol).as("__hssi"), col(HashCol).as("__hhash"))
    CdcRouter
      .route(conformed, probe, SsiCol, HashCol, "__hssi", "__hhash")
      .drop("__hssi", "__hhash")
  }

  private def snapshotSchema(conformed: DataFrame) = {
    // some conform pipelines already stamp the SCD2 columns on the feed
    // (SourcePipelines) — append only the ones missing
    val have = conformed.schema.fieldNames.toSet
    org.apache.spark.sql.types.StructType(
      conformed.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField(Scd2.ActiveFlag, org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField(Scd2.StartDate, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(Scd2.EndDate, org.apache.spark.sql.types.StringType)
      ).filterNot(f => have.contains(f.name))
    )
  }

  /** One increment against a BUCKETED snapshot (already-conformed feed):
    * both the active-row probe and the merge touch only the partitions
    * whose key bucket the batch hits — O(delta), not O(mart), per load.
    * A historic row whose key is absent from the feed can never match
    * the probe's left join, so pruning the probe to the feed's buckets
    * is semantics-preserving; the merge prune is owned by
    * [[graft.sinks.SnapshotSink.upsertBucketed]].
    */
  def loadIncrementBucketed(
      spark: SparkSession,
      snapshotPath: String,
      conformed: DataFrame,
      loadTs: String,
      endOfTime: String = "2099-12-31 00:00:00",
      validCol: Option[String] = Some(ValidCol),
      numBuckets: Int = 32,
      checkpointDir: Option[String] = None
  ): AuditCounts = {
    // the mart's persisted bucket count outranks the parameter (see
    // SnapshotSink.BucketCountMarker) — probe prune and merge must agree
    val effBuckets = SnapshotSink.bucketCountOf(spark, snapshotPath).getOrElse(numBuckets)
    // the conformed feed is consumed TWICE — the touched-bucket probe
    // below and the routed delta write inside upsertBucketed — and its
    // chain (feed build + dedup window + fingerprints) would re-run for
    // each; materialize it once so both consumers read blocks (round 14).
    // This is a PRODUCTION write path: `checkpointDir` selects a RELIABLE
    // checkpoint so one lost executor mid-load recovers instead of
    // failing the load (graft.operators.Materialize contract); the
    // executor-local default is the single-node/bench configuration.
    val conformedM = graft.operators.Materialize.frame(conformed, checkpointDir)
    val probeBuckets = conformedM
      .select(SnapshotSink.bucketOf(col(SsiCol), effBuckets).as("__b"))
      .distinct()
      .collect()
      .map(_.getInt(0))
      .toSeq
    val snapshot = SnapshotSink.readSnapshotBucketed(
      spark, snapshotPath, snapshotSchema(conformedM), Some(probeBuckets))
    val routed = route(conformedM, snapshot)
    SnapshotSink.upsertBucketed(
      spark, snapshotPath, routed, SsiCol, lit(loadTs), lit(endOfTime), validCol, effBuckets)
  }

  /** Run one increment against the SCD2 snapshot at `snapshotPath`.
    * `loadTs` is a frozen per-batch timestamp string (reference's
    * datetime.now() captured once — SURVEY §7.4 risk 5).
    */
  def runIncrement(
      spark: SparkSession,
      snapshotPath: String,
      feed: DataFrame,
      spec: FeedSpec,
      loadTs: String,
      endOfTime: String = "2099-12-31 00:00:00",
      partitionBy: Seq[String] = Nil
  ): AuditCounts = {
    val conformed = conformFeed(feed, spec)
    val snapshot = SnapshotSink.readSnapshot(
      spark,
      snapshotPath,
      org.apache.spark.sql.types.StructType(
        conformed.schema.fields ++ Seq(
          org.apache.spark.sql.types.StructField(Scd2.ActiveFlag, org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField(Scd2.StartDate, org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField(Scd2.EndDate, org.apache.spark.sql.types.StringType)
        )
      )
    )
    val routed = route(conformed, snapshot)
    SnapshotSink.upsert(
      spark,
      snapshotPath,
      routed,
      SsiCol,
      lit(loadTs),
      lit(endOfTime),
      validCol = Some(ValidCol),
      partitionBy = partitionBy
    )
  }

  /** [[runIncrement]] against the bucketed snapshot layout — the
    * O(delta)-per-load shape a 100 TB mart needs.
    */
  def runIncrementBucketed(
      spark: SparkSession,
      snapshotPath: String,
      feed: DataFrame,
      spec: FeedSpec,
      loadTs: String,
      endOfTime: String = "2099-12-31 00:00:00",
      numBuckets: Int = 32
  ): AuditCounts =
    loadIncrementBucketed(
      spark, snapshotPath, conformFeed(feed, spec), loadTs, endOfTime,
      Some(ValidCol), numBuckets)
}
