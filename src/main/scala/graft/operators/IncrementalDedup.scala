package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus deduplication: deduplicate a NEW batch of documents
  * against an already-ingested corpus WITHOUT re-scanning the corpus text.
  *
  * This is the reference's high-watermark incremental pattern
  * (ETL/JSON_Batch_Processing.py:389 keeps a MAX(record_id) watermark and
  * processes only newer rows; Setup/SQL_DDL_Script.sql:7 persists the
  * running state) lifted to near-dup detection: the persisted state is the
  * corpus' MinHash LSH BAND SIGNATURES — (id, band, sig) rows, ~nBands
  * narrow rows per document — not its text. A daily batch then needs:
  *
  *   1. signatures for the batch only (narrow map stage over the batch);
  *   2. within-batch pairs: the usual groupBy(band, sig) + capped native
  *      in-bucket expansion ([[ApproxDedup.pairsFromBandRows]]);
  *   3. batch-vs-corpus pairs: an equi-JOIN of the batch's band rows
  *      against the stored band rows on (band, sig) — never a self-join
  *      of the store, and the store's text is never touched;
  *   4. append the batch's band rows to the store (the next batch sees
  *      this one as corpus).
  *
  * 100 TB shape: the store grows with the corpus but holds only
  * (long, int, md5) rows — ~50 bytes x nBands per document, i.e. ~0.1 %
  * of a text corpus — and the join is a shuffle on (band, sig) whose
  * batch side is one day's increment, not the corpus. AQE's skew-join
  * handles hot band signatures (mass-duplicated content); production
  * would keep the store as a table BUCKETED by (band, sig) so the
  * store side of the join pre-shuffles once at write time instead of
  * at every batch — the file-based store here partitions by band
  * (pruning) and documents that upgrade path.
  *
  * Re-running an already-ingested batch is IDEMPOTENT for pair discovery:
  * every pair it finds was already found when the batch was first
  * processed (within-batch pairs are unchanged; batch-vs-store pairs
  * against the batch's own stored signatures collapse onto the
  * within-batch pairs via the id_a < id_b normalization and the
  * same-id guard). IncrementalDedupSpec pins this.
  */
object IncrementalDedup {

  /** Band-signature rows (id, band, sig) for a slice of documents — the
    * unit that gets persisted per corpus doc and computed per batch doc.
    * Pure narrow map stage: tokenize, shingle, minhash
    * ([[ApproxDedup.withMinhashSignature]], native kernels), band.
    */
  def bandSignatures(
      docs: DataFrame,
      idCol: String,
      text: Column,
      n: Int,
      nHashes: Int,
      rowsPerBand: Int
  ): DataFrame = {
    val sigs = ApproxDedup.withMinhashSignature(
      docs.select(col(idCol).as("id"), text.as("__text")),
      col("__text"),
      n,
      nHashes
    )
    ApproxDedup.bandRows(sigs, "id", nHashes, rowsPerBand)
  }

  /** Persist band rows as the corpus signature store. Partitioned by
    * `band` so a band-restricted probe prunes files; `overwrite` only
    * replaces bands present in the written frame when dynamic partition
    * overwrite is on, but the store contract here is append-per-batch
    * ([[appendToStore]]) after an initial bootstrap write.
    */
  def writeStore(bandSigs: DataFrame, path: String): Unit =
    bandSigs
      .repartition(col("band"), col("sig"))
      .write
      .mode("overwrite")
      .partitionBy("band")
      .parquet(path)

  /** Append one ingested batch's band rows to the store. */
  def appendToStore(bandSigs: DataFrame, path: String): Unit =
    bandSigs
      .repartition(col("band"), col("sig"))
      .write
      .mode("append")
      .partitionBy("band")
      .parquet(path)

  /** Read the signature store back as (id, band, sig). The partition
    * column `band` round-trips as int; column order is normalized.
    */
  def readStore(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("id"), col("band").cast("int").as("band"), col("sig"))

  /** The at-scale store: a catalog table BUCKETED by the join keys
    * (band, sig) — the bucket spec must equal the join keys EXACTLY for
    * Spark to adopt the scan's partitioning (a subset bucket key, e.g.
    * sig alone, co-locates rows but is not shuffle-compatible with the
    * (band, sig) requirement, and BOTH sides re-shuffle). With the
    * exact spec the store side of every batch-vs-store join reads its
    * pre-hash-partitioned buckets straight into the sort-merge join and
    * only the small daily batch shuffles (adapted to the store's bucket
    * count); the corpus-sized store never re-shuffles, every batch,
    * forever. This is the "pre-shuffle once at write time" upgrade the
    * parquet store's scaladoc promises; BucketedStoreSpec pins the
    * plan (exactly one fewer Exchange than the unbucketed store).
    */
  def writeStoreBucketed(
      bandSigs: DataFrame,
      table: String,
      path: String,
      nBuckets: Int
  ): Unit =
    bandSigs.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, "band", "sig")
      .sortBy("band", "sig")
      .option("path", path)
      .saveAsTable(table)

  /** The store table's catalog bucket spec as (numBuckets, bucketCols),
    * or None for an unbucketed table.
    */
  def storeBucketSpec(spark: SparkSession, table: String): Option[(Int, Seq[String])] = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    meta.bucketSpec.map(bs => (bs.numBuckets, bs.bucketColumnNames.toSeq))
  }

  /** Fail-loud check that `table` is bucketed EXACTLY as the join
    * contract requires: `expectedBuckets` buckets on exactly
    * (band, sig). A store whose layout drifted — different bucket
    * count after a careless rewrite, or a subset bucket key — would
    * not error on its own: Spark silently plans the full store-side
    * shuffle the bucketing exists to eliminate, every batch, forever.
    * The mismatch must surface as an exception, not a slow plan.
    */
  def requireStoreBucketed(spark: SparkSession, table: String, expectedBuckets: Int): Unit =
    storeBucketSpec(spark, table) match {
      case Some((n, cols)) if n == expectedBuckets && cols == Seq("band", "sig") => ()
      case Some((n, cols)) =>
        throw new IllegalStateException(
          s"signature store '$table' bucket layout mismatch: found $n buckets on " +
            s"(${cols.mkString(", ")}), expected $expectedBuckets on (band, sig) — " +
            "the store-side join would silently re-shuffle; rewrite the store " +
            "(writeStoreBucketed) instead of appending across layouts"
        )
      case None =>
        throw new IllegalStateException(
          s"signature store '$table' is not bucketed — expected $expectedBuckets " +
            "buckets on (band, sig)"
        )
    }

  /** Append one batch's band rows to the bucketed store table, after a
    * fail-loud layout check against the bucket count the caller's
    * pipeline was built for ([[requireStoreBucketed]]). insertInto
    * matches columns by POSITION, so the frame is projected to the
    * table's (id, band, sig) order first — a caller-reordered frame
    * would otherwise write sig values into the band column.
    * Auto-compaction policy (round-12, shared with [[AnnIndex]]): after
    * the append, if any bucket has accumulated more than
    * `maxFilesPerBucket` files the store is compacted in place, so file
    * count stays bounded without a manual [[compactStoreBucketed]]
    * call. Pass `maxFilesPerBucket = 0` to disable.
    *
    * CALLER CONTRACT (round-13, shared with
    * [[AnnIndex.appendToStoreBucketed]]): a triggered compaction
    * rewrites the table — DataFrames or cached scans resolved over the
    * store before this call must be re-resolved via `spark.table` after
    * it returns. Same-JVM appenders are serialized per table (a
    * concurrent append can no longer write into a path the compaction
    * swap deletes); cross-process writers are outside the contract —
    * single writer per table at any instant.
    */
  def appendToStoreBucketed(
      bandSigs: DataFrame,
      table: String,
      expectedBuckets: Int,
      maxFilesPerBucket: Int = BucketedStores.AutoCompactMaxFilesPerBucket
  ): Unit = BucketedStores.lockFor(bandSigs.sparkSession, table).synchronized {
    requireStoreBucketed(bandSigs.sparkSession, table, expectedBuckets)
    bandSigs
      .select(col("id"), col("band"), col("sig"))
      .write
      .mode("append")
      .format("parquet")
      .insertInto(table)
    if (maxFilesPerBucket > 0)
      BucketedStores.compactIfNeeded(bandSigs.sparkSession, table, maxFilesPerBucket)
    ()
  }

  def readStoreTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table).select(col("id"), col("band"), col("sig"))

  /** Compact the bucketed store in place: every [[appendToStoreBucketed]]
    * writes `nBuckets` new files (one per bucket per batch), so a year of
    * daily batches reads 365 small files per bucket. Rewriting the table
    * through a staging table with the SAME bucket spec collapses each
    * bucket to one file; the swap is drop + rename, and the bucket
    * layout (and with it the no-reshuffle join plan) survives —
    * BucketedStoreSpec pins files-per-bucket == 1, plan shape, and row
    * equality after compaction.
    */
  def compactStoreBucketed(spark: SparkSession, table: String): Unit =
    BucketedStores.compact(spark, table)

  /** All near-dup candidate pairs INVOLVING the new batch:
    * within-batch LSH pairs UNION batch-vs-store band-join pairs,
    * normalized to (id_a < id_b) and deduplicated ONCE over the union.
    * Store-vs-store pairs are never recomputed — they were emitted when
    * those documents' own batches were ingested.
    */
  def incrementalPairs(
      batchBands: DataFrame,
      storeBands: DataFrame,
      maxBucket: Int = ApproxDedup.DefaultMaxBucket
  ): DataFrame = {
    val within = ApproxDedup.pairsFromBandRows(batchBands, maxBucket, dedup = false)
    val vsStore = batchBands
      .select(col("band"), col("sig"), col("id").as("__batch_id"))
      .join(
        storeBands.select(col("band"), col("sig"), col("id").as("__store_id")),
        Seq("band", "sig")
      )
      // same-id guard: a re-run batch meets its own stored signatures
      .where(col("__batch_id") =!= col("__store_id"))
      .select(
        least(col("__batch_id"), col("__store_id")).as("id_a"),
        greatest(col("__batch_id"), col("__store_id")).as("id_b")
      )
    within.unionByName(vsStore).distinct()
  }
}
