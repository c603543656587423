package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion of the reference's polled XML feed (T1-T3, K2).
  *
  * The reference runs a driver-side `while True: fetch → filter → insert
  * → sleep(10)` loop (ETL/XML_Streaming.py:85-107). Here the same
  * contract is a genuine Structured Streaming job:
  *
  *   - source: any streaming DataFrame of (stream_record_id, payload)
  *     (file source, rate source, MemoryStream in tests, or a custom
  *     DataSource V2 wrapping the REST poll)
  *   - watermark filter: `stream_record_id > watermark` replicates the
  *     at-least-once incremental cursor (T2); replays are tolerated
  *     because consumers dedup by latest archive_id (T3)
  *   - sink: append-only parquet archive via foreachBatch, each row
  *     stamped with a monotonically increasing archive_id laid out as
  *     [batchId:19 | partitionId:20 | rowInPartition:24] (63 bits — the
  *     sign bit stays clear so ids order correctly as signed longs) —
  *     unique and batch-ordered without any driver-side counter, global
  *     coordination, or shuffle. Bounds: 512K batches, 1M partitions,
  *     16M rows per partition per batch; every field overflow FAILS
  *     LOUDLY (require / raise_error) rather than silently bleeding
  *     into the neighboring field and corrupting dedup-by-max
  *
  * Offsets/exactly-once bookkeeping come from the checkpoint dir; the
  * `recoverWatermark` bootstrap (MAX(archive_id) on restart) is kept for
  * parity with the reference's recovery semantics.
  */
object ArchiveStream {
  val ArchiveIdCol = "archive_id"

  /** T2: watermark recovery — highest archived stream_record_id, or -1. */
  def recoverWatermark(spark: SparkSession, archiveDir: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val path = new org.apache.hadoop.fs.Path(archiveDir)
    // a dir that exists but holds no data files (pre-created for the
    // mart's file-stream source, or a crash before the first append) is
    // the same bootstrap state as a missing dir — watermark -1
    if (!fs.exists(path) ||
        !fs.listStatus(path).exists(s => s.isFile && !s.getPath.getName.startsWith("_")))
      return -1L
    val row = spark.read.parquet(archiveDir).agg(max(col("stream_record_id"))).head()
    if (row.isNullAt(0)) -1L else row.getLong(0)
  }

  /** One micro-batch's archive append: stamp archive ids, append to
    * parquet. Public as the unit the chaos/recovery specs compose — the
    * crash window between this append and the checkpoint commit is
    * exactly where at-least-once duplicates come from, and the
    * consumer-side dedup ([[latestPerStreamRecord]]) must absorb them.
    */
  def archiveBatch(batch: DataFrame, batchId: Long, archiveDir: String): Unit = {
    // monotonically_increasing_id packs partitionId at bit 33, so
    // naively adding batchId*2^32 collides across batches (batch 2,
    // partition 0 == batch 0, partition 1). Explicit bit fields:
    // [batchId:19 | partitionId:20 | rowInPartition:24] = 63 bits.
    require(
      batchId < (1L << 19),
      s"archive_id batchId field overflow: $batchId >= 2^19"
    )
    // lower 33 bits of monotonically_increasing_id are the
    // per-partition row counter; the layout grants it 24 bits, so
    // anything past 16M rows/partition/batch must abort the batch,
    // not silently bleed into the partitionId field
    val rowInPartition =
      monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))
    val guardedRow = when(
      rowInPartition >= (1L << 24),
      raise_error(
        concat(
          lit("archive_id rowInPartition field overflow (>=2^24): "),
          rowInPartition.cast("string")
        )
      ).cast("long")
    ).otherwise(rowInPartition)
    batch
      .withColumn(
        ArchiveIdCol,
        lit(batchId << 44) +
          shiftleft(spark_partition_id().cast("long"), 24) +
          guardedRow
      )
      .write
      .mode("append")
      .parquet(archiveDir)
    ()
  }

  /** Start the archive query: filter past-watermark rows, stamp archive
    * ids, append to parquet every `intervalSeconds` (0 = trigger
    * back-to-back as data arrives — the drain-a-bounded-feed mode; the
    * batch boundaries a caller establishes with `processAllAvailable`
    * barriers are identical either way, only the idle wait between
    * micro-batches goes away).
    */
  def start(
      input: DataFrame,
      archiveDir: String,
      checkpointDir: String,
      watermark: Long,
      intervalSeconds: Int = 10
  ): StreamingQuery =
    input
      .where(col("stream_record_id") > watermark)
      .writeStream
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        archiveBatch(batch, batchId, archiveDir)
      }
      .start()

  /** T3: consumer-side dedup — latest archive row per stream record
    * (replaces the reference's correlated MAX subquery,
    * ETL/XML_Batch_Processing.py:395-397).
    */
  def latestPerStreamRecord(archive: DataFrame): DataFrame =
    graft.operators.Dedup.latestByVersion(archive, "stream_record_id", ArchiveIdCol)
}

/** A pollable micro-batch source for REST-style feeds, built on
  * MemoryStream for in-process use and tests. At production scale the
  * same `fetch` contract backs a DataSource V2 MicroBatchStream; the
  * consumer-side pipeline is identical either way.
  */
object PollSource {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  final case class StreamRecord(stream_record_id: Long, payload: String)

  /** Create a MemoryStream and a `poll(fetch)` function that pushes the
    * next batch of records (reference fetch_records,
    * ETL/XML_Streaming.py:57-62).
    */
  def create(spark: SparkSession): (MemoryStream[StreamRecord], Seq[StreamRecord] => Unit) = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[StreamRecord]
    (stream, recs => if (recs.nonEmpty) { stream.addData(recs); () })
  }
}
