package graft

import graft.operators.{AnnIndex, IvfCentroids, Pq, PqCodebooks, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental ANN index maintenance (AnnIndex + Pq.ivfPqEncode /
  * ivfPqTopKEncoded): appending a batch against frozen quantizer
  * artifacts must be indistinguishable — in stored rows AND in search
  * results — from having built the index over the grown corpus from
  * scratch, and recall after the append must hold the from-scratch
  * floor. The ann_index_append oracle row gates the row equality at
  * sf0.01; this spec adds the search-equivalence and recall halves.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val Cells = IvfCentroids.cells
  private val Books = PqCodebooks.books
  private val M     = PqCodebooks.M

  private def emb =
    Tables.embeddings(spark, Sf).select(col("vec_id"), col("embedding"))

  private def encodedRows(df: DataFrame): Set[(Long, Int, Seq[Int])] =
    df.select(
        col("vec_id"), col("cell"),
        array((0 until M).map(i => col(s"pq$i")): _*).as("codes"))
      .as[(Long, Int, Seq[Int])]
      .collect()
      .toSet

  private def knnRows(df: DataFrame): Set[(Long, Long, Int)] =
    df.select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)]
      .collect()
      .toSet

  test("append == full recompute, search over the appended store == from-scratch, recall floor") {
    val base  = emb.where(col("vec_id") % 10 =!= 0)
    val incr  = emb.where(col("vec_id") % 10 === 0)
    val table = "graft_ann_index_spec"
    val path  = tempDir("graft_ann_index_spec") + "/store"
    AnnIndex.writeStoreBucketed(
      Pq.ivfPqEncode(base, "vec_id", "embedding", Cells, Books), table, path, nBuckets = 4)
    AnnIndex.appendToStoreBucketed(
      Pq.ivfPqEncode(incr, "vec_id", "embedding", Cells, Books), table, expectedBuckets = 4)

    // 1. the appended store equals a from-scratch encode of the grown
    //    corpus, row for row (cells AND codes)
    val stored = AnnIndex.readStore(spark, table)
    assert(encodedRows(stored) ==
      encodedRows(Pq.ivfPqEncode(emb, "vec_id", "embedding", Cells, Books)))

    // 2. searching the appended store returns the from-scratch index's
    //    EXACT results — encoding is per-row deterministic, so where it
    //    happened cannot show in the top-k
    val queries  = emb.where(col("vec_id") % 50 === 0)
    val viaStore = Pq.ivfPqTopKEncoded(
      stored, "vec_id", queries, "embedding", k = 5,
      centroids = Cells, codebooks = Books, nProbe = 8, shortlist = 50)
    val scratch = Pq.ivfPqTopK(
      emb, queries, "vec_id", "embedding", k = 5,
      centroids = Cells, codebooks = Books, nProbe = 8, shortlist = 50)
    val storeSet = knnRows(viaStore)
    assert(storeSet == knnRows(scratch))

    // 3. recall floor vs exact brute force AFTER the append (the
    //    operating guarantee an ingesting pipeline actually consumes)
    val exact  = knnRows(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    val hits   = storeSet.map { case (q, n, _) => (q, n) } intersect
      exact.map { case (q, n, _) => (q, n) }
    val recall = hits.size.toDouble / exact.size
    info(f"IVF-PQ recall@5 over the appended store: $recall%.3f")
    // measured 0.72 at this sf — the quantizer artifacts are trained on
    // the sf0.01 gate corpus, and sf0.001's 500-vector slice is the
    // hard case for them (same regime as AnnRecallSpec's lsh=0.72 /
    // untrained ivf=0.48 floors here; the ivfpq row itself measures
    // 0.92 at sf0.01). The floor pins NO REGRESSION FROM APPENDING,
    // not absolute quality: test 2 already proves the appended store
    // searches identically to from-scratch.
    assert(recall >= 0.70, f"recall after append regressed: $recall%.3f")
  }

  test("compaction: one file per bucket, layout survives, search results identical") {
    val table = "graft_ann_index_compact"
    val path  = tempDir("graft_ann_index_compact") + "/store"
    val thirds = (0 until 3).map(i => emb.where(col("vec_id") % 3 === i))
    AnnIndex.writeStoreBucketed(
      Pq.ivfPqEncode(thirds(0), "vec_id", "embedding", Cells, Books), table, path, nBuckets = 4)
    thirds.tail.foreach(b =>
      AnnIndex.appendToStoreBucketed(
        Pq.ivfPqEncode(b, "vec_id", "embedding", Cells, Books), table, expectedBuckets = 4))

    val queries = emb.where(col("vec_id") % 50 === 0)
    def search() = knnRows(Pq.ivfPqTopKEncoded(
      AnnIndex.readStore(spark, table), "vec_id", queries, "embedding", k = 5,
      centroids = Cells, codebooks = Books, nProbe = 8, shortlist = 50))
    def files(): Seq[String] = {
      val loc = new java.io.File(new java.net.URI(
        spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
          .location.toString))
      loc.listFiles().toSeq.map(_.getName).filter(_.endsWith(".parquet"))
    }

    val before     = search()
    val rowsBefore = encodedRows(AnnIndex.readStore(spark, table))
    // 3 batches x 4 buckets: multiple files per bucket before compaction
    assert(files().size > 4, s"expected >4 pre-compaction files, got ${files().size}")

    AnnIndex.compactStoreBucketed(spark, table)

    // one file per bucket: bucket id is the _NNNNN suffix in bucketed
    // parquet names (part-<task>-<uuid>_<bucket>.c000...)
    val after    = files()
    val bucketRe = "_(\\d{5})\\.".r
    val byBucket = after.groupBy(f => bucketRe.findFirstMatchIn(f).map(_.group(1)).getOrElse(f))
    assert(byBucket.values.forall(_.size == 1),
      s"expected one file per bucket after compaction, got $byBucket")
    assert(after.size <= 4, s"expected <=4 post-compaction files, got ${after.size}")
    AnnIndex.requireStoreBucketed(spark, table, expectedBuckets = 4)
    assert(encodedRows(AnnIndex.readStore(spark, table)) == rowsBefore)
    assert(search() == before)
    // and the ingest path keeps working against the compacted table
    AnnIndex.appendToStoreBucketed(
      Pq.ivfPqEncode(emb.limit(0), "vec_id", "embedding", Cells, Books), table, expectedBuckets = 4)
  }

  /** Round-12 policy pin: appends alone keep the store's file count
    * bounded — no one has to remember the manual compaction call. With
    * maxFilesPerBucket = 3, post-append counts cycle 2, 3, 1 (an append
    * that lands a 4th file in any bucket triggers the in-place
    * rewrite), so 9 appends never exceed 3 files per bucket; rows and
    * search results stay identical to an uncompacted twin store.
    */
  test("auto-compaction policy bounds files per bucket across many appends, search identical") {
    val maxFiles = 3
    val table    = "graft_ann_index_autocompact"
    val plain    = "graft_ann_index_autocompact_ref"
    val dir      = tempDir("graft_ann_index_autocompact")
    val batches  = (0 until 10).map(i => emb.where(col("vec_id") % 10 === i))
    def enc(b: DataFrame) = Pq.ivfPqEncode(b, "vec_id", "embedding", Cells, Books)
    AnnIndex.writeStoreBucketed(enc(batches(0)), table, s"$dir/store", nBuckets = 4)
    AnnIndex.writeStoreBucketed(enc(batches(0)), plain, s"$dir/ref", nBuckets = 4)

    def filesPerBucket(t: String): Map[String, Int] = {
      val loc = new java.io.File(new java.net.URI(
        spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
          .location.toString))
      val bucketRe = "_(\\d{5})\\.".r
      loc.listFiles().toSeq.map(_.getName).filter(_.endsWith(".parquet"))
        .groupBy(f => bucketRe.findFirstMatchIn(f).map(_.group(1)).getOrElse(f))
        .view.mapValues(_.size).toMap
    }

    var compactionsSeen = 0
    batches.tail.foreach { b =>
      AnnIndex.appendToStoreBucketed(enc(b), table, expectedBuckets = 4, maxFilesPerBucket = maxFiles)
      AnnIndex.appendToStoreBucketed(enc(b), plain, expectedBuckets = 4, maxFilesPerBucket = 0)
      val fpb = filesPerBucket(table)
      assert(fpb.values.forall(_ <= maxFiles),
        s"policy violated: a bucket exceeds $maxFiles files after an append: $fpb")
      if (fpb.values.max == 1) compactionsSeen += 1
    }
    // the trigger actually fired (not vacuously bounded by batch count)
    assert(compactionsSeen >= 2, s"expected >=2 policy-triggered compactions, saw $compactionsSeen")
    // and the uncompacted twin really accumulated more files (the
    // policy, not the writer, is what bounded the store)
    assert(filesPerBucket(plain).values.max > maxFiles)

    assert(encodedRows(AnnIndex.readStore(spark, table)) ==
      encodedRows(AnnIndex.readStore(spark, plain)))
    val queries = emb.where(col("vec_id") % 50 === 0)
    def search(t: String) = knnRows(Pq.ivfPqTopKEncoded(
      AnnIndex.readStore(spark, t), "vec_id", queries, "embedding", k = 5,
      centroids = Cells, codebooks = Books, nProbe = 8, shortlist = 50))
    assert(search(table) == search(plain))
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS $plain")
  }

  test("layout guard fails loudly on bucket-spec drift") {
    val table = "graft_ann_index_guard"
    val path  = tempDir("graft_ann_index_guard") + "/store"
    val enc   = Pq.ivfPqEncode(emb.limit(50), "vec_id", "embedding", Cells, Books)
    AnnIndex.writeStoreBucketed(enc, table, path, nBuckets = 4)
    // wrong bucket count must throw, not silently append across layouts
    val e = intercept[IllegalStateException] {
      AnnIndex.appendToStoreBucketed(enc, table, expectedBuckets = 8)
    }
    assert(e.getMessage.contains("bucket layout mismatch"))
  }
}
