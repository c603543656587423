package graft

import graft.streaming.{ArchiveStream, PollBuffers}

/** The custom DataSource V2 micro-batch source: incremental offsets,
  * multi-batch consumption, and composition with the archive sink.
  */
class PollDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def readPoll(buffer: String) =
    spark.readStream
      .format("graft.streaming.PollDataSource")
      .option("buffer", buffer)
      .load()

  test("readStream over the poll source consumes each record exactly once") {
    PollBuffers.clear("t1")
    PollBuffers.append("t1", Seq(1L -> "a", 2L -> "b"))
    val q = readPoll("t1").writeStream
      .format("memory")
      .queryName("poll_rows")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    PollBuffers.append("t1", Seq(3L -> "c"))
    q.processAllAvailable()
    // no new data: extra trigger must add nothing
    q.processAllAvailable()
    q.stop()
    val got = spark.table("poll_rows").as[(Long, String)].collect().sorted
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("poll source composes with the archive sink end to end") {
    PollBuffers.clear("t2")
    val archiveDir = tempDir("graft_v2_archive")
    val ckpt       = tempDir("graft_v2_ckpt")
    PollBuffers.append("t2", Seq(10L -> "<v>x</v>", 11L -> "<v>y</v>", 10L -> "<v>x2</v>"))
    val q = ArchiveStream.start(readPoll("t2"), archiveDir, ckpt, watermark = -1L, intervalSeconds = 1)
    q.processAllAvailable()
    q.stop()
    val latest = ArchiveStream
      .latestPerStreamRecord(spark.read.parquet(archiveDir))
      .select($"stream_record_id", $"payload")
      .as[(Long, String)]
      .collect()
      .toMap
    assert(latest == Map(10L -> "<v>x2</v>", 11L -> "<v>y</v>"))
  }
}
