package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental ANN index maintenance — the vector-side analogue of
  * [[IncrementalDedup]]'s bucketed signature store.
  *
  * A training-data corpus ingests continuously; retraining the coarse
  * quantizer or PQ codebooks per arriving batch would pay a
  * corpus-scale train pass AND invalidate every previously assigned
  * cell/code (the stored index would have to be rewritten). The
  * standard operating model (FAISS: train once on a sample, add
  * forever) is what this operator implements on Spark:
  *
  *   - quantizer artifacts ([[IvfCentroids]], [[PqCodebooks]]) are
  *     FROZEN, versioned constants, trained offline;
  *   - an arriving batch is encoded against them by
  *     [[Pq.ivfPqEncode]] — cell = argmax centroid dot, codes =
  *     per-subspace argmax, a narrow map stage over the batch only —
  *     and appended to a catalog table BUCKETED BY `cell`;
  *   - because assignment is per-row and artifact-deterministic, the
  *     appended rows are IDENTICAL to what a from-scratch encode of
  *     the grown corpus would produce (the `ann_index_append` oracle
  *     row pins this equality), and searching the appended store
  *     returns exactly the from-scratch index's results
  *     (AnnIndexSpec pins it via [[Pq.ivfPqTopKEncoded]]).
  *
  * Scale shape: per batch, work is O(|batch|) encode + an append of
  * nBuckets files; the stored corpus is never rewritten, re-encoded,
  * or re-shuffled. Bucketing by `cell` co-locates each coarse cell's
  * posting list, so cell-pruned scans (`cell IN probes`) and
  * cell-keyed joins read pre-partitioned buckets. The layout guard
  * ([[requireStoreBucketed]]) fails loudly on spec drift — an
  * append across layouts would silently cost the co-location, every
  * query, forever.
  */
object AnnIndex {

  /** Create (overwrite) the index store: `encoded` as produced by
    * [[Pq.ivfPqEncode]] (idCol + cell + pq0..pq{M-1} + vn), written as
    * a parquet catalog table bucketed and sorted by `cell`.
    */
  def writeStoreBucketed(
      encoded: DataFrame,
      table: String,
      path: String,
      nBuckets: Int
  ): Unit =
    encoded.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, "cell")
      .sortBy("cell")
      .option("path", path)
      .saveAsTable(table)

  /** Fail-loud layout check: `table` must be bucketed into exactly
    * `expectedBuckets` buckets on exactly (cell). Drift would not
    * error on its own — Spark would just plan the co-location away.
    */
  def requireStoreBucketed(spark: SparkSession, table: String, expectedBuckets: Int): Unit = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    meta.bucketSpec match {
      case Some(bs) if bs.numBuckets == expectedBuckets &&
          bs.bucketColumnNames.toSeq == Seq("cell") => ()
      case Some(bs) =>
        throw new IllegalStateException(
          s"ANN index store '$table' bucket layout mismatch: found ${bs.numBuckets} buckets " +
            s"on (${bs.bucketColumnNames.mkString(", ")}), expected $expectedBuckets on (cell) — " +
            "rewrite the store (writeStoreBucketed) instead of appending across layouts")
      case None =>
        throw new IllegalStateException(
          s"ANN index store '$table' is not bucketed — expected $expectedBuckets buckets on (cell)")
    }
  }

  /** Append one encoded batch to the store after the layout guard.
    * insertInto matches columns BY POSITION, so the frame is projected
    * to the table's column order first. Auto-compaction policy
    * (round-12): after the append, if any bucket has accumulated more
    * than `maxFilesPerBucket` files, the store is compacted in place —
    * the store stays bounded without anyone remembering the manual
    * [[compactStoreBucketed]] call. Pass `maxFilesPerBucket = 0` to
    * disable (caller owns compaction scheduling).
    *
    * CALLER CONTRACT (round-13, the auto-compaction trade-off made
    * explicit): a triggered compaction REWRITES the table — its data
    * path changes, so a DataFrame or cached scan resolved over the
    * store BEFORE this call can fail with FileNotFoundException after
    * it. Re-resolve via `spark.table(table)` (or [[readStore]]) after
    * every append. Same-JVM appenders to one table are serialized by a
    * per-table lock (two driver threads cannot interleave an append
    * with the compaction swap and lose a batch — AnnIndexSpec pins it);
    * writers in SEPARATE processes are outside the store's contract:
    * single writer per table at any instant. A crash INSIDE the
    * compaction can transiently leave the table only under
    * `<table>__old` — recoverable by a rename, never silently dropped
    * (see [[BucketedStores]] crash discipline).
    */
  def appendToStoreBucketed(
      encoded: DataFrame,
      table: String,
      expectedBuckets: Int,
      maxFilesPerBucket: Int = BucketedStores.AutoCompactMaxFilesPerBucket
  ): Unit = BucketedStores.lockFor(encoded.sparkSession, table).synchronized {
    requireStoreBucketed(encoded.sparkSession, table, expectedBuckets)
    val order = encoded.sparkSession.table(table).columns.toSeq
    encoded
      .select(order.map(col): _*)
      .write
      .mode("append")
      .format("parquet")
      .insertInto(table)
    if (maxFilesPerBucket > 0)
      BucketedStores.compactIfNeeded(encoded.sparkSession, table, maxFilesPerBucket)
    ()
  }

  /** Compact the store in place: every [[appendToStoreBucketed]] adds
    * nBuckets files (one per bucket per batch) forever, so a year of
    * daily appends reads 365 small files per posting-list bucket.
    * Rewriting through a staging table with the SAME bucket spec
    * collapses each bucket to one file; the bucket layout — and with it
    * the cell-pruned scan and no-reshuffle join plans — survives.
    * Crash-safe via [[BucketedStores.compact]]'s rename-aside swap;
    * AnnIndexSpec pins files-per-bucket == 1 and search-result equality
    * pre/post compaction.
    */
  def compactStoreBucketed(spark: SparkSession, table: String): Unit =
    BucketedStores.compact(spark, table)

  /** Read the store back in [[Pq.ivfPqEncode]]'s column shape — the
    * frame [[Pq.ivfPqTopKEncoded]] searches directly.
    */
  def readStore(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
