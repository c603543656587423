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

  /** Per-table append/compaction serialization for same-JVM writers.
    * The compaction swap (write staging → rename aside → rename in →
    * delete old path) is NOT safe to interleave with a concurrent
    * append: an append that resolves the table location before the swap
    * writes its files into the old path, which the swap then deletes —
    * a silently lost batch. Holding one lock object per table around
    * the whole append+compact sequence makes same-JVM appenders
    * (the Spark driver is the only writer in a normal deployment)
    * strictly serial per store. [[compact]] itself takes the same lock
    * (reentrant from the append paths' enclosing `synchronized`), so a
    * caller-scheduled manual compaction — the `maxFilesPerBucket = 0`
    * mode where the caller owns scheduling — serializes against
    * concurrent appends too, instead of re-opening the lost-batch
    * hazard through the side door. CROSS-PROCESS writers are outside
    * this lock's reach and outside the store's contract: the store API
    * is single-writer-per-table at any instant (standard for
    * non-transactional catalog tables; lakehouse-format log protocols
    * are what lifts it, not this sink).
    *
    * The key is the CATALOG identity, not the raw string: Spark's
    * catalog is case-insensitive and accepts qualified names, so
    * `MyStore`, `mystore`, and `default.mystore` must map to ONE lock
    * object — the name is parsed, qualified against the session's
    * current database, and lowercased before the map lookup.
    */
  private val tableLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def lockFor(spark: SparkSession, table: String): Object = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val db    = ident.database.getOrElse(spark.sessionState.catalog.getCurrentDatabase)
    val key   = s"${db.toLowerCase}.${ident.table.toLowerCase}"
    tableLocks.computeIfAbsent(key, _ => new Object)
  }

  /** Default auto-compaction trigger for the incremental stores'
    * append paths: compact when any bucket accumulates more than this
    * many files. At one file per bucket per append, 16 bounds a
    * bucket's read amplification to 16 small files between rewrites
    * while amortizing each full-table rewrite over 16 appends — a year
    * of daily appends compacts ~23 times instead of reading 365 files
    * per posting-list bucket (or zero times, when nobody remembers the
    * manual call — the round-11 gap this policy closes).
    */
  val AutoCompactMaxFilesPerBucket = 16

  private val BucketIdInName = raw"_(\d{5})(?:\.|_)".r

  /** Max data-file count in any single bucket of `table`, parsed from
    * the bucketed writer's file names (`part-NNNNN-<uuid>_BBBBB.c000…`
    * — BBBBB is the bucket id). Non-data files (_SUCCESS, markers) do
    * not carry a bucket id and are ignored. A driver-side listing of
    * one directory — cheap relative to the append that precedes it.
    */
  def maxFilesPerBucket(spark: SparkSession, table: String): Int = {
    val path = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .location)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0
    else
      fs.listStatus(path)
        .iterator
        .filter(_.isFile)
        .flatMap(st => BucketIdInName.findFirstMatchIn(st.getPath.getName).map(_.group(1)))
        .toSeq
        .groupBy(identity)
        .valuesIterator
        .map(_.size)
        .maxOption
        .getOrElse(0)
  }

  /** The append-path policy: compact iff some bucket exceeds
    * `maxFiles` files. Returns whether compaction ran.
    */
  def compactIfNeeded(
      spark: SparkSession,
      table: String,
      maxFiles: Int = AutoCompactMaxFilesPerBucket
  ): Boolean = {
    require(maxFiles >= 1, s"maxFiles must be >= 1: got $maxFiles")
    val trigger = maxFilesPerBucket(spark, table) > maxFiles
    if (trigger) compact(spark, table)
    trigger
  }

  /** Rewrite `table` in place, one file per bucket. The table must be
    * bucketed; its own bucket columns and sort columns are reused, and
    * its own column order is preserved. Serialized against same-JVM
    * appends via [[lockFor]] (reentrant when called from inside an
    * append's own lock scope).
    */
  def compact(spark: SparkSession, table: String): Unit = lockFor(spark, table).synchronized {
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
