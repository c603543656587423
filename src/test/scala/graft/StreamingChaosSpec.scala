package graft

import graft.jobs.{BatchPipeline, FeedSpec}
import graft.streaming.{ArchiveStream, PollBuffers}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Chaos test of the full streaming arc — PollDataSource (the real
  * DataSource V2 micro-batch source) -> archive sink -> SCD2 mart —
  * with a crash injected in the EXACT at-least-once window: after the
  * archive parquet append, before the checkpoint commit. The restarted
  * query must replay the uncommitted batch from the source (duplicating
  * archive rows — that's the contract, not a bug), and the consumer-side
  * dedup + SCD2 routing must land the mart in EXACTLY the state of a
  * never-crashed run (reference semantics: ETL/XML_Streaming.py:78-81 —
  * at-least-once producer, dedup-by-latest consumer).
  */
class StreamingChaosSpec extends SparkSpec {
  import spark.implicits._

  private val PoisonId = 999L

  private def readPoll(buffer: String) =
    spark.readStream
      .format("graft.streaming.PollDataSource")
      .option("buffer", buffer)
      .load()

  /** Start the archive chain over `buffer`; when `chaos`, the first batch
    * carrying the poison record crashes AFTER its archive append.
    */
  private def startChain(
      buffer: String,
      archiveDir: String,
      ckptDir: String,
      chaos: Boolean,
      crashed: java.util.concurrent.atomic.AtomicBoolean
  ): StreamingQuery =
    readPoll(buffer).writeStream
      .trigger(Trigger.ProcessingTime("1 seconds"))
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        ArchiveStream.archiveBatch(b, id, archiveDir)
        // poison check FIRST: compareAndSet must only consume its one
        // shot on the batch that actually carries the poison record
        if (chaos && !b.where(col("stream_record_id") === PoisonId).isEmpty &&
            crashed.compareAndSet(false, true)) {
          throw new RuntimeException("chaos: crash between archive append and checkpoint commit")
        }
      }
      .start()

  /** Consumer tail: latest archive row per stream record -> one SCD2
    * increment into the bucketed mart.
    */
  private def loadMart(archiveDir: String, martDir: String): Unit = {
    val latest = ArchiveStream
      .latestPerStreamRecord(spark.read.parquet(archiveDir))
      .select(col("stream_record_id"), col("payload"), col(ArchiveStream.ArchiveIdCol))
    BatchPipeline.loadIncrementBucketed(
      spark,
      martDir,
      BatchPipeline.conformFeed(
        latest,
        FeedSpec(
          keyCol = "stream_record_id",
          sourcePrefix = "STREAM - ",
          tiebreak = Seq(col(ArchiveStream.ArchiveIdCol).desc),
          mandatoryCols = Seq("payload")
        )
      ),
      loadTs = "2024-06-01 00:00:00",
      numBuckets = 8
    )
    ()
  }

  private def martRows(martDir: String): Set[(String, String, Int)] =
    spark.read.parquet(martDir)
      .select(col(BatchPipeline.SsiCol), col("payload"), col("ACTIVE_FLAG"))
      .as[(String, String, Int)]
      .collect()
      .toSet

  test("crash after archive append + checkpoint restart: mart equals the never-crashed run") {
    val batch1 = Seq(1L -> "<v>a1</v>", 2L -> "<v>b1</v>", 3L -> "<v>c1</v>")
    val batch2 = Seq(1L -> "<v>a2</v>", PoisonId -> "<v>p1</v>") // 1 updated, poison new
    val batch3 = Seq(2L -> "<v>b2</v>", 4L -> "<v>d1</v>")       // post-restart traffic

    def runChain(tag: String, chaos: Boolean): (String, String) = {
      val buffer  = s"chaos_$tag"
      val archive = tempDir(s"chaos_archive_$tag")
      val ckpt    = tempDir(s"chaos_ckpt_$tag")
      val mart    = tempDir(s"chaos_mart_$tag") + "/mart"
      PollBuffers.clear(buffer)
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)

      val q1 = startChain(buffer, archive, ckpt, chaos, crashed)
      PollBuffers.append(buffer, batch1)
      q1.processAllAvailable()
      PollBuffers.append(buffer, batch2)
      if (chaos) {
        // the poison batch throws between append and commit; the QUERY dies
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q1.processAllAvailable()
        }
        assert(ex.getMessage.contains("chaos") || Option(ex.getCause).exists(_.getMessage.contains("chaos")))
        assert(crashed.get(), "chaos hook never fired")
        // restart from the SAME checkpoint: the uncommitted batch replays
        // from the poll source (at-least-once), then new traffic flows
        val q2 = startChain(buffer, archive, ckpt, chaos = false, crashed)
        PollBuffers.append(buffer, batch3)
        q2.processAllAvailable()
        q2.stop()
      } else {
        q1.processAllAvailable()
        PollBuffers.append(buffer, batch3)
        q1.processAllAvailable()
        q1.stop()
      }
      loadMart(archive, mart)
      (archive, mart)
    }

    val (chaosArchive, chaosMart) = runChain("crashy", chaos = true)
    val (cleanArchive, cleanMart) = runChain("clean", chaos = false)

    // the crash REALLY produced at-least-once duplicates in the archive…
    val chaosRows = spark.read.parquet(chaosArchive).count()
    val cleanRows = spark.read.parquet(cleanArchive).count()
    assert(chaosRows > cleanRows,
      s"expected replayed archive rows after the crash ($chaosRows vs $cleanRows)")
    // …which the consumer dedup hides: latest-per-record sets are equal
    def latestSet(dir: String) = ArchiveStream
      .latestPerStreamRecord(spark.read.parquet(dir))
      .select(col("stream_record_id"), col("payload"))
      .as[(Long, String)].collect().toSet
    assert(latestSet(chaosArchive) == latestSet(cleanArchive))

    // and the SCD2 mart is EXACTLY the never-crashed run's state
    val got = martRows(chaosMart)
    assert(got == martRows(cleanMart))
    assert(got == Set(
      ("STREAM - 1", "<v>a2</v>", 1),
      ("STREAM - 2", "<v>b2</v>", 1),
      ("STREAM - 3", "<v>c1</v>", 1),
      ("STREAM - 4", "<v>d1</v>", 1),
      (s"STREAM - $PoisonId", "<v>p1</v>", 1)
    ))
  }

  test("feed polls are bounded: chunkedPolls never exceeds MAX_RECORDS and preserves order") {
    import graft.jobs.StreamingE2e
    val polls = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    // 12001 records across a 5000 cap -> 3 polls of 5000/5000/2001
    val n = StreamingE2e.chunkedPolls((1 to 12001).iterator, 5000)(polls += _)
    assert(n == 3 && polls.size == 3)
    assert(polls.map(_.size) == Seq(5000, 5000, 2001))
    assert(polls.forall(_.size <= StreamingE2e.MaxRecordsPerPoll))
    assert(polls.flatten.toSeq == (1 to 12001))
    // empty feed issues zero polls (a drain with no new data must not
    // push an empty batch into the stream)
    assert(StreamingE2e.chunkedPolls(Iterator.empty[Int], 5000)(polls += _) == 0)
  }
}
