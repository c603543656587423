package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-dup ingest gate: batch docs are flagged against the
  * persisted signature store AND earlier same-batch docs; the store
  * grows per batch; replayed signatures don't change flags.
  */
class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val NearA = "the quick brown fox jumps over the lazy dog again and again today"
  private val NearB = "the quick brown fox jumps over the lazy dog again and again tonight"
  private val Fresh = "completely different content about distributed sequence packing pipelines"
  private val Other = "yet another unrelated document on bucketed shuffle free store joins"

  private def run(batches: Seq[Seq[(Long, String)]]): Map[Long, (Boolean, Long)] = {
    implicit val sq = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("neardup").toString
    val stream = MemoryStream[(Long, String)]
    val flags = collection.mutable.Map[Long, (Boolean, Long)]()
    val q = StreamOps.nearDupGate(
      stream.toDS().toDF("doc_id", "text"),
      idCol = "doc_id",
      textCol = "text",
      storePath = s"$tmp/store",
      n = 3,
      nHashes = 8,
      rowsPerBand = 2,
      checkpointDir = s"$tmp/ckpt",
      sink = (df: DataFrame, bid: Long) =>
        df.select(col("doc_id"), col("near_dup"))
          .as[(Long, Boolean)]
          .collect()
          .foreach { case (id, f) => flags(id) = (f, bid) }
    )
    try {
      batches.foreach { b =>
        stream.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    flags.toMap
  }

  test("flags vs store, vs earlier in-batch doc; fresh docs pass") {
    val flags = run(
      Seq(
        Seq(1L -> NearA, 2L -> Other), // seed batch: nothing to collide with
        Seq(3L -> NearB, 4L -> Fresh), // 3 near-dups stored doc 1; 4 fresh
        Seq(5L -> Fresh, 6L -> Fresh) // 5 collides stored 4; 6 collides 5 AND stored 4
      )
    )
    assert(flags(1L)._1 == false && flags(2L)._1 == false)
    assert(flags(3L)._1 == true, s"3 should collide with stored near-dup: $flags")
    assert(flags(4L)._1 == false)
    assert(flags(5L)._1 == true && flags(6L)._1 == true)
  }

  test("lower id in a later batch is still the dup (batch order wins over id order)") {
    val flags = run(
      Seq(
        Seq(100L -> NearA),
        Seq(7L -> NearB) // smaller id than the stored 100 — still flagged
      )
    )
    assert(flags(100L)._1 == false && flags(7L)._1 == true)
  }
}
