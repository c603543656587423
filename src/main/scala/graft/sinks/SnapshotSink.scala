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

  // ---------------------------------------------------------------------
  // Bucketed snapshot layout: O(delta) incremental merge.
  //
  // `upsert` above rewrites the WHOLE mart per load — correct and
  // crash-safe, but O(|mart|) I/O per increment. At a 100 TB mart with a
  // 0.1% daily delta that is the scale killer. The bucketed layout lays
  // the snapshot out as hive partition dirs KEY_BUCKET=<b> where
  // b = pmod(xxhash64(business key), numBuckets): every version of a key
  // lives in exactly one directory, so a load that touches K keys only
  // reads and rewrites the <=K (usually far fewer) partitions containing
  // them — the close-out join, the active-row probe, and the write are
  // all delta-proportional, and untouched partitions' files are never
  // opened, let alone rewritten. The rename-aside crash discipline of
  // `upsert` is kept PER PARTITION (.bak_KEY_BUCKET=<b> aside dirs,
  // restored by recoverBucketSwaps), so every crash point leaves each
  // partition either fully old or fully new; re-running the load
  // converges because already-applied rows route as DUPLICATE.
  // ---------------------------------------------------------------------

  /** Reserved hive-partition column of the bucketed snapshot layout. */
  val BucketCol = "KEY_BUCKET"

  /** Marker file persisting the layout's bucket count. The bucket of a
    * key is a pure function of (key, numBuckets) — if a later load ran
    * with a different count, every key would land in a "wrong" bucket:
    * the pruned probe would miss its active row and re-insert it
    * (silent duplicates). So the count is a property of the DATA, not
    * the config: written once at mart creation, and always preferred
    * over the caller's parameter afterwards. Underscore-prefixed files
    * are invisible to Spark's partition discovery (like _SUCCESS).
    */
  val BucketCountMarker = "_graft_buckets"

  /** The persisted bucket count of the mart at `path`, if any. A
    * malformed/truncated marker fails with a message that names the
    * file and the repair (delete it and re-run — the next load
    * re-validates the count against the on-disk bucket dirs and
    * re-writes it), instead of a bare NumberFormatException pointing
    * nowhere.
    */
  def bucketCountOf(spark: SparkSession, path: String): Option[Int] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val m  = new org.apache.hadoop.fs.Path(path, BucketCountMarker)
    if (!fs.exists(m)) None
    else {
      val in  = fs.open(m)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
      raw.toIntOption match {
        case Some(n) if n >= 1 => Some(n)
        case _ =>
          throw new IllegalStateException(
            s"corrupt bucket-count marker $m (content: '$raw') — " +
              "delete the marker and re-run; the next load re-derives and " +
              "re-validates the count from the KEY_BUCKET= partition dirs")
      }
    }
  }

  /** Marker write is temp-name + rename: a crash mid-write leaves only
    * the invisible temp file, never a truncated marker that would poison
    * every later [[bucketCountOf]].
    */
  private def writeBucketCount(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String,
      numBuckets: Int
  ): Unit = {
    val m = new org.apache.hadoop.fs.Path(path, BucketCountMarker)
    if (!fs.exists(m)) {
      val tmp = new org.apache.hadoop.fs.Path(path, BucketCountMarker + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(s"$numBuckets\n".getBytes("UTF-8"))
      finally out.close()
      if (!fs.rename(tmp, m) && !fs.exists(m))
        throw new IllegalStateException(s"could not commit bucket-count marker $m")
    }
  }

  /** Observed KEY_BUCKET= partition ids of an existing bucketed mart
    * (empty if the dir is absent or has no bucket dirs). */
  private def observedBucketIds(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String
  ): Seq[Int] = {
    val dst = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(dst)) Seq.empty
    else
      fs.listStatus(dst)
        .iterator
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
        .flatMap(st => st.getPath.getName.stripPrefix(s"$BucketCol=").toIntOption)
        .toSeq
  }

  /** Layout of an existing snapshot: Some(true) = bucketed
    * (KEY_BUCKET= partition dirs), Some(false) = flat/legacy, None =
    * no mart yet. Restores crash leftovers of EITHER discipline first
    * (whole-mart .bak for flat, per-partition .bak_ for bucketed) so
    * the answer reflects the recovered state. An existing mart's
    * on-disk layout always outranks configuration — merging with the
    * wrong layout would corrupt it.
    */
  def detectLayout(spark: SparkSession, path: String): Option[Boolean] = {
    val fs  = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    if (!fs.exists(dst) && fs.exists(bak)) fs.rename(bak, dst) // flat mid-swap crash
    if (!fs.exists(dst)) None
    else {
      recoverBucketSwaps(spark, path)
      val entries = fs.listStatus(dst).filterNot { st =>
        val n = st.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }
      if (entries.isEmpty) None
      else Some(entries.exists(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol=")))
    }
  }

  /** Deterministic bucket id of a business key. Stable across loads (no
    * RNG, no session state) — the one invariant the layout depends on.
    */
  def bucketOf(key: Column, numBuckets: Int): Column =
    pmod(xxhash64(key), lit(numBuckets)).cast("int")

  /** Restore partitions left dangling by a crash mid-swap: a lone
    * `.bak_KEY_BUCKET=<b>` dir (old partition renamed aside, new one not
    * yet in place) is renamed back; a `.bak` next to a live partition is
    * a completed swap's leftover and is dropped. Dot-prefixed names are
    * invisible to partition discovery, so readers never see the aside
    * copy as data.
    */
  def recoverBucketSwaps(spark: SparkSession, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val p  = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(p)) {
      fs.listStatus(p).foreach { st =>
        val nm = st.getPath.getName
        if (nm.startsWith(s".bak_$BucketCol=")) {
          val live = new org.apache.hadoop.fs.Path(p, nm.stripPrefix(".bak_"))
          if (!fs.exists(live)) fs.rename(st.getPath, live)
          else fs.delete(st.getPath, true)
        }
      }
    }
  }

  /** Read the bucketed snapshot (or an empty frame when the mart does not
    * exist yet), pruned to `buckets` when given — the prune is a filter
    * on the partition column, so only the matching `KEY_BUCKET=<b>` dirs
    * are listed and scanned (PartitionFilters, not PushedFilters). The
    * partition column is dropped from the result: callers see the same
    * payload+SCD2 shape `readSnapshot` returns.
    */
  def readSnapshotBucketed(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      buckets: Option[Seq[Int]] = None
  ): DataFrame = {
    recoverBucketSwaps(spark, path)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val empty =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) empty
    else if (buckets.exists(_.isEmpty)) empty
    else {
      val full = org.apache.spark.sql.types.StructType(
        schema.fields :+ org.apache.spark.sql.types.StructField(
          BucketCol, org.apache.spark.sql.types.IntegerType))
      val df = spark.read.schema(full).option("basePath", path).parquet(path)
      buckets
        .map(bs => df.where(col(BucketCol).isin(bs.map(b => b: Any): _*)))
        .getOrElse(df)
        .drop(BucketCol)
    }
  }

  /** O(delta) merge into a bucketed snapshot: rewrites ONLY the
    * partitions whose bucket contains a routed INSERT/UPDATE key; every
    * other partition's files are left byte-identical (BucketedSnapshotSpec
    * pins this). The routed delta is materialized once up front so the
    * feed's conform/route lineage runs a single time — the merge, the
    * audit, and the touched-bucket discovery all read the delta parquet,
    * not the upstream pipeline.
    */
  def upsertBucketed(
      spark: SparkSession,
      path: String,
      routed: DataFrame,
      key: String,
      loadTs: Column,
      endOfTime: Column,
      validCol: Option[String] = None,
      numBuckets: Int = 32
  ): AuditCounts = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    // the mart's persisted bucket count outranks the parameter — a count
    // change mid-life would silently re-bucket every key (see marker doc).
    // A bucketed mart WITHOUT a marker (created before the marker
    // existed) must not silently trust the parameter either: a wrong
    // count would probe wrong buckets, miss active rows, and re-insert
    // them as duplicates — then pin the wrong count forever. The dirs
    // themselves are the only surviving evidence, so validate the
    // parameter against them (every observed id must be addressable)
    // before adopting and persisting it.
    val effBuckets = bucketCountOf(spark, path).getOrElse {
      val fsProbe   = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      val observed = observedBucketIds(fsProbe, path)
      if (observed.nonEmpty && observed.max >= numBuckets)
        throw new IllegalStateException(
          s"bucketed mart at $path has no $BucketCountMarker marker and its " +
            s"on-disk bucket ids reach ${observed.max}, which numBuckets=$numBuckets " +
            "cannot address — merging would mis-route keys and duplicate rows. " +
            "Re-run with the count the mart was built with (>= " +
            s"${observed.max + 1}), or rebuild the mart to migrate.")
      numBuckets
    }
    val base = routed.drop(CdcRouter.RouterCol).schema
    require(
      !base.fieldNames.contains(BucketCol),
      s"payload column '$BucketCol' collides with the bucketed layout's partition column")
    val scdFields = Seq(
      org.apache.spark.sql.types.StructField(Scd2.ActiveFlag, org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField(Scd2.StartDate, org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(Scd2.EndDate, org.apache.spark.sql.types.StringType)
    ).filterNot(f => base.fieldNames.contains(f.name))
    val payloadSchema = org.apache.spark.sql.types.StructType(base.fields ++ scdFields)

    val fs    = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val delta = path + ".delta"
    val tmp   = path + ".staging"
    fs.delete(new org.apache.hadoop.fs.Path(delta), true)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)

    routed.write.mode(SaveMode.Overwrite).parquet(delta)
    val deltaDf  = spark.read.parquet(delta)
    val incoming = CdcRouter.dropDuplicates(deltaDf)
    // bounded driver-side list: <= numBuckets ints regardless of delta size
    val touched = incoming
      .select(bucketOf(col(key), effBuckets).as("__b"))
      .distinct()
      .collect()
      .map(_.getInt(0))
      .sorted
      .toSeq
    val counts = audit(incoming, validCol)

    if (touched.nonEmpty) {
      val current = readSnapshotBucketed(spark, path, payloadSchema, Some(touched))
      val merged = Scd2
        .merge(current, deltaDf, key, loadTs, endOfTime)
        .withColumn(BucketCol, bucketOf(col(key), effBuckets))
      // Copy-on-write: the merge output carries the FULL content of every
      // touched bucket (history + close-outs + new versions), and the
      // per-bucket swap below REPLACES the bucket dir — so a bucket holds
      // exactly the files of its latest rewrite (one, via the repartition
      // on the bucket column), no matter how many loads touch it. File
      // count per bucket is bounded by construction, not by a compactor
      // (BucketedSnapshotSpec pins this across repeated loads).
      merged
        .repartition(touched.size, col(BucketCol))
        .write
        .mode(SaveMode.Overwrite)
        .partitionBy(BucketCol)
        .parquet(tmp)

      val dst = new org.apache.hadoop.fs.Path(path)
      if (!fs.exists(dst)) fs.mkdirs(dst)
      writeBucketCount(fs, path, effBuckets)
      touched.foreach { b =>
        val src  = new org.apache.hadoop.fs.Path(tmp, s"$BucketCol=$b")
        val pdst = new org.apache.hadoop.fs.Path(dst, s"$BucketCol=$b")
        val pbak = new org.apache.hadoop.fs.Path(dst, s".bak_$BucketCol=$b")
        if (fs.exists(src)) {
          if (fs.exists(pbak)) fs.delete(pbak, true)
          if (fs.exists(pdst)) fs.rename(pdst, pbak)
          fs.rename(src, pdst)
          fs.delete(pbak, true)
        }
      }
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(delta), true)
    counts
  }

  /** At-scale probe store: the mart as a catalog table BUCKETED by the
    * business key. When the active set outgrows broadcast range, the CDC
    * probe join goes sort-merge — and with the table bucketed on exactly
    * the join key, the mart side reads its pre-hash-partitioned buckets
    * straight into the join with NO exchange; only the (delta-sized)
    * feed shuffles. Same contract as IncrementalDedup.writeStoreBucketed;
    * BucketedMartSpec pins the one-fewer-Exchange plan.
    */
  def writeMartBucketedTable(
      mart: DataFrame,
      table: String,
      path: String,
      key: String,
      nBuckets: Int
  ): Unit =
    mart.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)

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
