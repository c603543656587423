package graft

import graft.jobs.FeedSpec
import graft.operators.Scd2
import graft.streaming.StreamingMart
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming feed -> SCD2 mart end to end: per-batch increments version
  * the snapshot, and replayed records dedupe (T4 as a streaming path).
  */
class StreamingMartSpec extends SparkSpec {
  import spark.implicits._

  final case class FeedRec(id: Long, version: Int, name: String, status: String)

  private val spec = FeedSpec(
    keyCol = "id",
    sourcePrefix = "STR - ",
    tiebreak = Seq(col("version").desc),
    mandatoryCols = Seq("name", "status")
  )

  test("micro-batches run SCD2 increments; replays are no-ops") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[FeedRec]
    val mart   = tempDir("graft_stream_mart") + "/mart"
    val ckpt   = tempDir("graft_stream_ckpt")

    val q = StreamingMart.start(
      stream.toDF(),
      spec,
      mart,
      ckpt,
      loadTsForBatch = b => f"2024-0${b % 8 + 1}%d-01 00:00:00",
      intervalSeconds = 1
    )
    try {
      // batch 0: two keys
      stream.addData(FeedRec(1L, 1, "alpha", "OPEN"), FeedRec(2L, 1, "beta", "OPEN"))
      q.processAllAvailable()
      val s0 = spark.read.parquet(mart)
      assert(s0.count() == 2 && s0.where(col(Scd2.ActiveFlag) === 1).count() == 2)
      assert(
        new java.io.File(mart).listFiles().exists(_.getName.startsWith("KEY_BUCKET=")),
        "streaming mart defaults to the bucketed O(delta) layout")

      // batch 1: k1 updated, k2 re-sent unchanged (DUPLICATE), k3 new
      stream.addData(
        FeedRec(1L, 2, "alpha-v2", "CLOSED"),
        FeedRec(2L, 1, "beta", "OPEN"),
        FeedRec(3L, 1, "gamma", "OPEN")
      )
      q.processAllAvailable()
      val s1 = spark.read.parquet(mart)
      assert(s1.count() == 4) // k1 old+new, k2, k3 — duplicate never written
      val k1 = s1
        .where(col("id") === 1)
        .select("name", Scd2.ActiveFlag, Scd2.EndDate)
        .as[(String, Int, String)]
        .collect()
        .sortBy(_._2)
      assert(k1(0) == ("alpha", 0, "2024-02-01 00:00:00")) // closed by batch 1's loadTs
      assert(k1(1)._1 == "alpha-v2" && k1(1)._2 == 1)

      // batch 2: full replay of batch 1 — everything routes DUPLICATE
      stream.addData(
        FeedRec(1L, 2, "alpha-v2", "CLOSED"),
        FeedRec(3L, 1, "gamma", "OPEN")
      )
      q.processAllAvailable()
      val s2 = spark.read.parquet(mart)
      assert(s2.count() == 4)
      assert(
        s2.where(col(Scd2.ActiveFlag) === 1).groupBy().count().as[Long].head() == 3
      )
    } finally q.stop()
  }
}
