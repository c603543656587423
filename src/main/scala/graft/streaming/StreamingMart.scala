package graft.streaming

import graft.jobs.{BatchPipeline, FeedSpec}
import graft.sinks.SnapshotSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming feed -> SCD2 mart: each micro-batch runs the full CDC/SCD2
  * increment (dedup -> fingerprint -> route -> merge) against the
  * snapshot via foreachBatch. This closes the reference's streaming arc
  * end-to-end — the polled feed lands in the mart with versioning, not
  * just the archive (ETL/XML_Streaming.py feeds
  * ETL/XML_Batch_Processing.py; here the same contract is one streaming
  * query).
  *
  * Semantics:
  *   - each micro-batch is one SCD2 increment with a frozen per-batch
  *     load timestamp (`loadTsForBatch(batchId)`) — T4: a late or
  *     re-sent record routes UPDATE/DUPLICATE exactly as a batch load
  *     would, so replays after checkpoint recovery are no-ops;
  *   - the batch is tiny relative to the snapshot, so the routing probe
  *     and the merge close-out stay broadcast joins (PLANS.md CDC shape);
  *   - the mart lives in the bucketed O(delta) layout by default: each
  *     micro-batch reads and rewrites only the key buckets it touches —
  *     the per-batch cost is delta-proportional, never O(mart). An
  *     existing flat-layout mart is honored as-is (detectLayout — the
  *     stream can resume over a mart seeded by the legacy batch path
  *     without corrupting it); `numBuckets <= 0` forces the flat layout
  *     for a new mart.
  */
object StreamingMart {
  def start(
      input: DataFrame,
      spec: FeedSpec,
      snapshotPath: String,
      checkpointDir: String,
      loadTsForBatch: Long => String,
      intervalSeconds: Int = 10,
      numBuckets: Int = 32,
      // override the processing-time cadence — Trigger.AvailableNow
      // turns one call into a drain-everything-then-stop increment (the
      // reference's "periodic batch process over the archive" mode,
      // ETL/XML_Batch_Processing.py run as a cron): offsets persist in
      // the checkpoint, so successive AvailableNow runs each load only
      // the files that arrived since the previous run
      trigger: Option[Trigger] = None
  ): StreamingQuery =
    input.writeStream
      .trigger(trigger.getOrElse(Trigger.ProcessingTime(s"$intervalSeconds seconds")))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val bucketed =
            SnapshotSink.detectLayout(spark, snapshotPath).getOrElse(numBuckets > 0)
          if (bucketed)
            BatchPipeline.runIncrementBucketed(
              spark,
              snapshotPath,
              batch,
              spec,
              loadTs = loadTsForBatch(batchId),
              numBuckets = math.max(numBuckets, 1)
            )
          else
            BatchPipeline.runIncrement(
              spark,
              snapshotPath,
              batch,
              spec,
              loadTs = loadTsForBatch(batchId)
            )
          ()
        }
      }
      .start()
}
