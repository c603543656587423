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

  test("T2 hardened: kill mid-stream with data in flight, restart from checkpoint — no gaps, no re-archival, dedup output equals an uninterrupted run") {
    import graft.streaming.PollBuffers
    val archiveDir = tempDir("graft_crash_archive")
    val ckpt       = tempDir("graft_crash_ckpt")
    val buffer     = s"crash_${java.util.UUID.randomUUID().toString.take(8)}"

    def pollStream = spark.readStream
      .format("graft.streaming.PollDataSource")
      .option("buffer", buffer)
      .load()

    // batch A lands and COMMITS (offset 3 reaches the checkpoint)
    PollBuffers.append(buffer, Seq(1L -> "1-a", 2L -> "2-a", 3L -> "3-a"))
    val q1 = ArchiveStream.start(pollStream, archiveDir, ckpt, watermark = 0L, intervalSeconds = 1)
    q1.processAllAvailable()

    // data IN FLIGHT: polled into the buffer (incl. a record-2 replay,
    // the reference's at-least-once update) — then the query dies
    // before it is allowed to drain
    PollBuffers.append(buffer, Seq(2L -> "2-b", 4L -> "4-a", 5L -> "5-a"))
    q1.stop()

    // restart from the SAME checkpoint: the committed offset must hold
    // (no re-read of [0,3)), the in-flight records must drain (no gaps)
    val q2 = ArchiveStream.start(pollStream, archiveDir, ckpt, watermark = 0L, intervalSeconds = 1)
    q2.processAllAvailable()
    q2.stop()

    val archive = spark.read.parquet(archiveDir)
    val countsById = archive
      .groupBy("stream_record_id").count()
      .as[(Long, Long)].collect().toMap

    // no gaps: every polled record is archived
    assert(countsById.keySet == Set(1L, 2L, 3L, 4L, 5L), s"archive has gaps: $countsById")
    // no re-archival of the committed batch: 1 and 3 appear EXACTLY once
    // (2 appears twice because the SOURCE re-sent it — that is the
    // at-least-once contract, not a recovery defect)
    assert(countsById(1L) == 1 && countsById(3L) == 1,
      s"restart re-archived committed records: $countsById")
    assert(countsById(2L) == 2, s"the record-2 replay must be archived: $countsById")

    // consumer dedup over the interrupted run == an UNINTERRUPTED run
    // over the same poll sequence (single query lifetime, fresh dirs)
    val archiveDir2 = tempDir("graft_crash_archive_ref")
    val ckpt2       = tempDir("graft_crash_ckpt_ref")
    val buffer2     = s"crashref_${java.util.UUID.randomUUID().toString.take(8)}"
    PollBuffers.append(buffer2, Seq(1L -> "1-a", 2L -> "2-a", 3L -> "3-a"))
    val qr = ArchiveStream.start(
      spark.readStream.format("graft.streaming.PollDataSource").option("buffer", buffer2).load(),
      archiveDir2, ckpt2, watermark = 0L, intervalSeconds = 1)
    qr.processAllAvailable()
    PollBuffers.append(buffer2, Seq(2L -> "2-b", 4L -> "4-a", 5L -> "5-a"))
    qr.processAllAvailable()
    qr.stop()

    def latestMap(dir: String): Map[Long, String] = ArchiveStream
      .latestPerStreamRecord(spark.read.parquet(dir))
      .select($"stream_record_id", $"payload")
      .as[(Long, String)].collect().toMap

    val interrupted   = latestMap(archiveDir)
    val uninterrupted = latestMap(archiveDir2)
    assert(interrupted == uninterrupted,
      s"crash+restart diverged from the uninterrupted run: $interrupted vs $uninterrupted")
    assert(interrupted == Map(1L -> "1-a", 2L -> "2-b", 3L -> "3-a", 4L -> "4-a", 5L -> "5-a"))

    PollBuffers.clear(buffer); PollBuffers.clear(buffer2)
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
