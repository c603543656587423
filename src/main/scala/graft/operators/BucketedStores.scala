package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Shared compaction for the bucketed incremental stores
  * ([[IncrementalDedup]]'s band-signature store, [[AnnIndex]]'s encoded
  * posting store). Every bucketed append writes `nBuckets` new files
  * (one per bucket per batch), so a year of daily batches reads 365
  * small files per bucket; compaction rewrites the table through a
  * staging table with the SAME bucket spec, collapsing each bucket to
  * one file while the bucket layout (and with it the no-reshuffle join
  * and cell-pruned scan plans) survives.
  *
  * Crash discipline: catalog swaps have no atomic rename-over, so the
  * swap is rename-ASIDE first (mirroring SnapshotSink's .bak rule) —
  * every crash point leaves both the old data (as <table>__old or the
  * original name) and the compacted data (as the staging table)
  * catalog-registered and recoverable by a rename; nothing is dropped
  * until the new table is in place under the real name. A PRIOR crashed
  * compaction's aside table is reclaimed (files deleted) before its
  * catalog entry is dropped, or the full pre-compaction data copy
  * would leak forever.
  */
private[operators] object BucketedStores {

  /** Rewrite `table` in place, one file per bucket. The table must be
    * bucketed; its own bucket columns and sort columns are reused, and
    * its own column order is preserved.
    */
  def compact(spark: SparkSession, table: String): Unit = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalStateException(s"cannot compact '$table': not a bucketed table")
    )
    val bucketCols = spec.bucketColumnNames.toSeq
    val sortCols   = if (spec.sortColumnNames.nonEmpty) spec.sortColumnNames.toSeq else bucketCols
    val columns    = meta.schema.fieldNames.toSeq
    val oldPath    = new org.apache.hadoop.fs.Path(meta.location)
    val tmpTable   = s"${table}__compact"
    // derive the staging location from the STABLE base name (strip any
    // prior compaction suffix) — deriving from the current location would
    // stack a suffix per compaction until the path segment overflows the
    // filesystem's name limit
    val baseName = oldPath.getName.replaceAll("__compact_[0-9a-f]{8}$", "")
    val tmpPath = new org.apache.hadoop.fs.Path(
      oldPath.getParent,
      s"${baseName}__compact_${java.util.UUID.randomUUID().toString.take(8)}"
    )
    // one sorted writer per bucket: repartition on the bucket keys with
    // numPartitions == numBuckets so each task owns one output bucket.
    // Read the FILES, not the table: reading via the catalog lets the
    // planner elide this repartition (the bucketed scan claims to
    // satisfy it) and then DisableUnnecessaryBucketedScan drops the
    // bucketed read anyway — leaving arbitrary file splits and a
    // tasks-x-buckets file explosion. A plain parquet scan forces the
    // real shuffle, whose hash IS the bucket-id function, so each task
    // holds exactly one output bucket.
    spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
    spark.read
      .parquet(oldPath.toString)
      .select(columns.map(col): _*)
      .repartition(spec.numBuckets, bucketCols.map(col): _*)
      .write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(spec.numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .option("path", tmpPath.toString)
      .saveAsTable(tmpTable)
    val asideTable = s"${table}__old"
    // a PRIOR crashed compaction may have left the aside table (and its
    // full pre-compaction data copy) behind — reclaim the files before
    // dropping the external entry, or the copy leaks forever
    if (spark.catalog.tableExists(asideTable)) {
      val stale = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(asideTable))
          .location)
      spark.sql(s"DROP TABLE $asideTable")
      if (stale != oldPath && stale != tmpPath)
        stale.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(stale, true)
    }
    spark.sql(s"ALTER TABLE $table RENAME TO $asideTable")
    spark.sql(s"ALTER TABLE $tmpTable RENAME TO $table")
    spark.sql(s"DROP TABLE $asideTable")
    val fs = oldPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(oldPath, true)
    ()
  }
}
