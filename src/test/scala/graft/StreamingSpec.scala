package graft

import graft.streaming.{ArchiveStream, PollSource}
import org.apache.spark.sql.functions._

/** T1-T3 + K2: poll-driven streaming ingestion into the append archive,
  * watermark recovery, consumer-side dedup.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("poll -> archive -> watermark recovery -> latest-per-record dedup") {
    val archiveDir = tempDir("graft_archive")
    val ckpt       = tempDir("graft_ckpt")

    val (stream, poll) = PollSource.create(spark)

    // batch 1: records 1..3
    poll((1L to 3L).map(i => PollSource.StreamRecord(i, s"<v>$i-a</v>")))
    val q = ArchiveStream.start(stream.toDF(), archiveDir, ckpt, watermark = 0L, intervalSeconds = 1)
    q.processAllAvailable()

    // batch 2: record 2 re-sent with new payload (at-least-once update) + record 4
    poll(Seq(PollSource.StreamRecord(2, "<v>2-b</v>"), PollSource.StreamRecord(4, "<v>4-a</v>")))
    q.processAllAvailable()
    q.stop()

    val archive = spark.read.parquet(archiveDir)
    assert(archive.count() == 5) // at-least-once: both versions of record 2 kept

    // T2: watermark recovery sees the max stream_record_id
    assert(ArchiveStream.recoverWatermark(spark, archiveDir) == 4L)

    // T3: consumer dedup picks the LATEST archive row per stream record
    val latest = ArchiveStream
      .latestPerStreamRecord(archive)
      .select($"stream_record_id", $"payload")
      .as[(Long, String)]
      .collect()
      .toMap
    assert(latest == Map(1L -> "<v>1-a</v>", 2L -> "<v>2-b</v>", 3L -> "<v>3-a</v>", 4L -> "<v>4-a</v>"))
  }

  test("watermark filter drops already-archived records") {
    val archiveDir = tempDir("graft_archive2")
    val ckpt       = tempDir("graft_ckpt2")
    val (stream, poll) = PollSource.create(spark)
    poll(Seq(PollSource.StreamRecord(5, "old"), PollSource.StreamRecord(10, "new")))
    val q = ArchiveStream.start(stream.toDF(), archiveDir, ckpt, watermark = 5L)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(archiveDir).select($"stream_record_id").as[Long].collect()
    assert(got.toSeq == Seq(10L))
  }

  test("recoverWatermark on missing archive returns -1") {
    assert(ArchiveStream.recoverWatermark(spark, "/tmp/graft_does_not_exist_xyz") == -1L)
  }
}
