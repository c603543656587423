package graft

import graft.operators.{ApproxDedup, IncrementalDedup}
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val N = 3
  private val NumHashes = 8
  private val RowsPerBand = 2

  private def bands(docs: org.apache.spark.sql.DataFrame) =
    IncrementalDedup.bandSignatures(docs, "id", col("text"), N, NumHashes, RowsPerBand)

  test("bandSignatures: nBands narrow rows per doc, identical docs share every sig") {
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),
      (3L, "h i j k l m n")
    ).toDF("id", "text")
    val b = bands(df).as[(Long, Int, String)].collect()
    assert(b.length == 3 * (NumHashes / RowsPerBand))
    val sigsOf = b.groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(sigsOf(1L) == sigsOf(2L))
    assert((sigsOf(1L) intersect sigsOf(3L)).isEmpty)
  }

  test("incrementalPairs: finds batch-vs-corpus and within-batch pairs, not store-vs-store") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "the quick brown fox jumps over dogs"), // dup inside corpus: NOT re-emitted
      (3L, "completely unrelated corpus document text")
    ).toDF("id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over dogs"), // dup of corpus 1,2
      (11L, "fresh batch content with novel words"),
      (12L, "fresh batch content with novel words")  // dup inside batch
    ).toDF("id", "text")
    val got = IncrementalDedup
      .incrementalPairs(bands(batch), bands(corpus))
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(got == Set((1L, 10L), (2L, 10L), (11L, 12L)))
  }

  test("store round-trip through parquet preserves pair results") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (3L, "completely unrelated corpus document text")
    ).toDF("id", "text")
    val batch = Seq((10L, "the quick brown fox jumps over dogs")).toDF("id", "text")
    val dir = tempDir("sigstore")
    IncrementalDedup.writeStore(bands(corpus), dir)
    val direct  = IncrementalDedup.incrementalPairs(bands(batch), bands(corpus))
    val viaDisk =
      IncrementalDedup.incrementalPairs(bands(batch), IncrementalDedup.readStore(spark, dir))
    assert(viaDisk.as[(Long, Long)].collect().toSet == direct.as[(Long, Long)].collect().toSet)
  }

  test("re-running an ingested batch is idempotent: zero pairs beyond the first run") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (3L, "completely unrelated corpus document text")
    ).toDF("id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over dogs"),
      (11L, "fresh batch content with novel words"),
      (12L, "fresh batch content with novel words")
    ).toDF("id", "text")
    val dir = tempDir("sigstore-rerun")
    IncrementalDedup.writeStore(bands(corpus), dir)
    val firstRun = IncrementalDedup
      .incrementalPairs(bands(batch), IncrementalDedup.readStore(spark, dir))
      .as[(Long, Long)]
      .collect()
      .toSet
    // ingest the batch, then re-run it against the grown store: the
    // same-id guard + (id_a < id_b) normalization collapse every
    // batch-vs-own-signature hit onto an already-known pair
    IncrementalDedup.appendToStore(bands(batch), dir)
    val reRun = IncrementalDedup
      .incrementalPairs(bands(batch), IncrementalDedup.readStore(spark, dir))
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(reRun == firstRun)
    assert(firstRun == Set((1L, 10L), (11L, 12L)))
  }

  test("lshCandidatePairs equals incrementalPairs with an empty store") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "the quick brown fox jumps over dogs"),
      (3L, "completely unrelated corpus document text"),
      (4L, "fresh batch content with novel words")
    ).toDF("id", "text")
    val sigs = ApproxDedup.withMinhashSignature(docs, col("text"), N, NumHashes)
    val lsh = ApproxDedup
      .lshCandidatePairs(sigs, "id", NumHashes, RowsPerBand)
      .as[(Long, Long)]
      .collect()
      .toSet
    val empty = bands(docs).limit(0)
    val inc = IncrementalDedup
      .incrementalPairs(bands(docs), empty)
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(inc == lsh)
  }
}
