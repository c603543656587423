package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hive-style partitioned parquet lake layout — the physical organization
  * a 100 TB corpus actually lives in. The reference writes flat files and
  * re-scans everything per load (`ETL/CSV_Batch_Processing.py` reads the
  * whole source dir); at scale the table must be partitioned on its
  * coarse access dimensions (load date, language, source) so that
  *
  *   - a query filtering on a partition column prunes AT PLANNING time:
  *     the scan lists only matching `col=value/` directories and its
  *     `PartitionFilters` never touch row data (vs `PushedFilters`,
  *     which still opens every file and relies on row-group stats);
  *   - an incremental load replaces ONLY the partitions it carries
  *     (dynamic partition overwrite), making re-runs of one increment
  *     idempotent without rewriting the rest of the table.
  *
  * Within-partition multi-dimensional locality is the sibling operator
  * [[graft.functions.ZOrder]]; this sink owns the directory-level layout.
  */
object PartitionedLake {
  /** Write `df` partitioned by `partitionCols` (Hive directory layout,
    * one `col=value/` tree per distinct combination). `SaveMode.Overwrite`
    * with the session's default STATIC overwrite mode replaces the whole
    * table — use [[overwritePartitions]] for incremental loads.
    */
  def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Dynamic partition overwrite: replaces exactly the partitions present
    * in `df`, leaving all other partitions of the table untouched. This is
    * the idempotent-increment write shape (re-running a load for one day /
    * one source cannot clobber the rest of the lake). Scoped via the
    * per-writer option so the session-wide conf is not mutated.
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Read the lake back; partition columns are recovered from the
    * directory names by partition discovery. `basePath` keeps the
    * partition columns visible even when callers point at a subtree.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)

  /** Read with schema merge across files: increments may ADD columns
    * over the table's life (schema evolution); `mergeSchema` unions the
    * per-file schemas and nulls the missing columns of older files.
    * Costs a footer read per file at planning — use for evolved tables,
    * not as the default read path.
    */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("basePath", path).option("mergeSchema", "true").parquet(path)

  /** Small-file compaction: rewrite the lake so each partition directory
    * holds ONE file (or `ceil(rows / maxRecordsPerFile)` files for jumbo
    * partitions). Incremental loads leave a file per load per partition;
    * at corpus scale the resulting listing + open cost dominates scans
    * long before row data does, so periodic compaction is part of the
    * lake's lifecycle, not an optimization.
    *
    * `repartition(partitionCols)` hash-clusters every partition's rows
    * into one task, so the writer emits one file per directory (the
    * `maxRecordsPerFile` option then splits only oversized partitions).
    * The rewrite lands in a staging dir and swaps in via the same
    * rename-aside discipline as SnapshotSink.upsert: the old layout is
    * renamed ASIDE before the new one moves in, so every crash point
    * leaves a complete copy recoverable by a rename (readers of `path`
    * never observe a half-written table).
    */
  def compact(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 0L
  ): Unit = {
    import org.apache.spark.sql.functions.col
    val staging = path + ".compacting"
    val writer = read(spark, path)
      .repartition(partitionCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
    (if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer).parquet(staging)

    val fs  = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    if (fs.exists(bak)) fs.delete(bak, true) // leftover from a completed prior swap
    fs.rename(dst, bak)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
    fs.delete(bak, true)
  }
}
