package graft.jobs

import graft.streaming.{ArchiveStream, PollSource, StreamingMart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Oracle-gated end-to-end run of the STREAMING operating mode — the
  * reference's full streaming arc in one deterministic lifecycle
  * (`ETL/XML_Streaming.py:57-107` feeding
  * `ETL/XML_Batch_Processing.py:394-402`):
  *
  *   poll feed -> watermark filter -> parquet archive (ArchiveStream)
  *     -> file-stream over the archive -> per-increment dedup
  *     (latest archive_id per stream record, T3) -> CDC route ->
  *     SCD2 mart (StreamingMart), run to completion.
  *
  * The batch CORRECTNESS gate covers every operator in isolation; this
  * row makes the streaming lifecycle itself oracle-checked — watermark
  * drops, checkpoint-lost restart recovery (T2), within-run replays
  * (latest wins, T3), and late-arriving mutations versioning the mart
  * (T4) all shift at least one row of the final mart if broken.
  *
  * Deterministic feed, derived from the `events` table with
  * T = max(event_id) div 2, L = ids <= T, H = ids > T
  * (the cursor contract — ids arrive non-decreasing across runs — is
  * what the reference's MAX(id) watermark assumes):
  *
  *   archive run 1 (fresh dir, watermark -1):
  *     batch A1: L, id%3==0, payload v1        -> MART DRAIN 1 (ts1)
  *     batch A2: L, id%3!=0 v1  ++  L, id%9==0 v2 (mutated replay)
  *               ++ L, id%6==0 && id%9!=0 v1 (byte-identical replay)
  *                                             -> MART DRAIN 2 (ts2)
  *   restart (checkpoint LOST — watermark bootstraps from the archive:
  *   recoverWatermark = max archived id = max L id):
  *     batch B1: H v1  ++  L, id%5==0 v3 poison replays — the watermark
  *               filter must drop every poison row (ids <= watermark)
  *                                             -> MART DRAIN 3 (ts3)
  *     batch B2: H, id%7==0 v2
  *     batch B3: H, id%11==0 v4 — drained TOGETHER with B2, so a %77 key
  *               carries two versions in one mart increment and the
  *               in-batch dedup must pick v4 (higher archive_id)
  *                                             -> MART DRAIN 4 (ts4)
  *
  * Expected final mart (the DuckDB oracle states this in closed form):
  *   L, %3==0, %9==0 : (v1, closed ts1->ts2), (v2, active ts2)
  *   L, %3==0, %9!=0 : (v1, active ts1)      [%6 replays route DUPLICATE]
  *   L, %3!=0        : (v1, active ts2)
  *   H, %7==0 | %11==0 : (v1, closed ts3->ts4),
  *                       (%11==0 ? v4 : v2, active ts4)
  *   H, otherwise    : (v1, active ts3)
  *
  * Scale shape: the archive is an append-only parquet log; the mart
  * feed is Structured Streaming's file source over it (checkpointed
  * offsets, AvailableNow drains = the reference's periodic batch
  * process); each increment is the bucketed O(delta) SCD2 load. No
  * driver-side data collects — the only driver values are the two
  * bounded scalars the reference itself keeps (max event id, recovered
  * watermark).
  */
object StreamingE2e {

  private val Ts = Vector(
    "2024-01-01 00:00:00",
    "2024-02-01 00:00:00",
    "2024-03-01 00:00:00",
    "2024-04-01 00:00:00"
  )

  private def spec = FeedSpec(
    keyCol = "stream_record_id",
    sourcePrefix = "XML - ",
    tiebreak = Seq(col("archive_id").desc),
    mandatoryCols = Seq("status", "note"),
    nonPayloadCols = Seq("archive_id")
  )

  private val archiveSchema = StructType(Seq(
    StructField("stream_record_id", LongType),
    StructField("status", StringType),
    StructField("note", StringType),
    StructField("archive_id", LongType)
  ))

  /** The reference's poll contract: every fetch returns AT MOST this
    * many records (Setup/Streaming_API_Setup.py:50, MAX_RECORDS=5000).
    * The feed simulator must honor the same bound — a poll whose size
    * scales with sf would be the one driver-side collect in the
    * lifecycle that grows with the data.
    */
  val MaxRecordsPerPoll = 5000

  /** Chunk a record stream into bounded polls: `poll` is invoked with
    * at most `maxPerPoll` records per call, in stream order. Pure
    * (StreamingChaosSpec pins per-poll boundedness + order); returns
    * the number of polls issued.
    */
  def chunkedPolls[A](records: Iterator[A], maxPerPoll: Int)(poll: Seq[A] => Unit): Int = {
    require(maxPerPoll >= 1, s"maxPerPoll must be >= 1, got $maxPerPoll")
    var n = 0
    records.grouped(maxPerPoll).foreach { chunk => poll(chunk); n += 1 }
    n
  }

  /** The deterministic feed records for one (predicate, variant) slice.
    * Streams to the driver via toLocalIterator — one PARTITION resident
    * at a time, never the whole slice — because MemoryStream (the
    * in-process poll endpoint) is driver-fed by nature: the slice plays
    * the role of the reference's REST response body. [[chunkedPolls]]
    * then re-bounds delivery to the reference's MAX_RECORDS per poll.
    * The archive and mart sides stay fully distributed.
    */
  private def slice(
      events: DataFrame,
      pred: org.apache.spark.sql.Column,
      variant: String
  ): Iterator[PollSource.StreamRecord] = {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val status = variant match {
      case "v1" => col("event_type")
      case "v2" => concat(col("event_type"), lit("_m"))
      case "v4" => concat(col("event_type"), lit("_mm"))
      case _    => concat(col("event_type"), lit("_x3")) // v3 poison
    }
    events
      .where(pred)
      .select(
        col("event_id"),
        status.as("status"),
        concat(lit("u"), col("user_id").cast("string")).as("note")
      )
      .toLocalIterator()
      .asScala
      .map { case Row(id: Long, st: String, nt: String) =>
        // payload rides MemoryStream as "<status>|<note>"; unpack splits
        // on the FIRST '|', so a separator inside status would silently
        // corrupt every downstream hash — refuse instead
        require(!st.contains("|"), s"status must not contain '|': '$st'")
        PollSource.StreamRecord(id, st + "|" + nt)
      }
  }

  def run(spark: SparkSession, dir: String, workDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(workDir), true)
    val archiveDir = s"$workDir/archive"
    val martDir    = s"$workDir/mart"
    val martCkpt   = s"$workDir/mart_ckpt"
    fs.mkdirs(new org.apache.hadoop.fs.Path(archiveDir))

    val events = graft.Tables.events(spark, dir)
    // the reference keeps exactly this bounded scalar driver-side (its
    // feed generator's max id); everything data-sized stays distributed
    val maxId = events.agg(max(col("event_id"))).head().getLong(0)
    val t     = maxId / 2
    val lo    = col("event_id") <= t
    val hi    = col("event_id") > t

    // payload rides MemoryStream as one string; unpack to (status, note)
    // before archiving so the archive carries the business schema
    def unpack(df: DataFrame): DataFrame = df.select(
      col("stream_record_id"),
      substring_index(col("payload"), "|", 1).as("status"),
      substring_index(col("payload"), "|", -1).as("note")
    )

    def drainMart(loadTs: String): Unit = {
      // one mart increment PER DRAIN is this lifecycle's contract (B2+B3
      // must version a %77 key inside a single increment): pin the file
      // source's batch sizing explicitly so an inherited session-level
      // maxFilesPerTrigger can never split a drain into two increments
      // sharing a load timestamp
      val feed = spark.readStream
        .schema(archiveSchema)
        .option("maxFilesPerTrigger", Int.MaxValue)
        .parquet(archiveDir)
      val q = StreamingMart.start(
        feed, spec, martDir, martCkpt,
        loadTsForBatch = _ => loadTs,
        numBuckets = 8,
        trigger = Some(Trigger.AvailableNow())
      )
      q.awaitTermination()
    }

    // ---- archive run 1: fresh dir, watermark -1 ----
    val (stream1, poll1) = PollSource.create(spark)
    val w1 = ArchiveStream.recoverWatermark(spark, archiveDir)
    require(w1 == -1L, s"fresh archive must bootstrap watermark -1, got $w1")
    val q1 = ArchiveStream.start(
      unpack(stream1.toDF()), archiveDir, s"$workDir/ckpt1", w1, intervalSeconds = 0)
    try {
      chunkedPolls(slice(events, lo && col("event_id") % 3 === 0, "v1"), MaxRecordsPerPoll)(poll1)
      q1.processAllAvailable()
      drainMart(Ts(0))
      // the three A2 slices carry DISJOINT key sets, so the poll
      // boundaries the chunker introduces cannot reorder versions of one
      // key; cross-version ordering (v1 vs v2 of %9 keys) rides the
      // strictly increasing archive batch ids as before
      chunkedPolls(
        slice(events, lo && col("event_id") % 3 =!= 0, "v1") ++
          slice(events, lo && col("event_id") % 9 === 0, "v2") ++
          slice(events, lo && col("event_id") % 6 === 0 && col("event_id") % 9 =!= 0, "v1"),
        MaxRecordsPerPoll)(poll1)
      q1.processAllAvailable()
    } finally q1.stop()
    drainMart(Ts(1))

    // ---- archive run 2: checkpoint lost, watermark bootstrapped from
    //      the archive itself (T2) ----
    val (stream2, poll2) = PollSource.create(spark)
    val w2 = ArchiveStream.recoverWatermark(spark, archiveDir)
    val q2 = ArchiveStream.start(
      unpack(stream2.toDF()), archiveDir, s"$workDir/ckpt2", w2, intervalSeconds = 0)
    try {
      chunkedPolls(
        slice(events, hi, "v1") ++
          slice(events, lo && col("event_id") % 5 === 0, "v3"), // poison: must be watermark-dropped
        MaxRecordsPerPoll)(poll2)
      q2.processAllAvailable()
      drainMart(Ts(2))
      chunkedPolls(slice(events, hi && col("event_id") % 7 === 0, "v2"), MaxRecordsPerPoll)(poll2)
      q2.processAllAvailable()
      chunkedPolls(slice(events, hi && col("event_id") % 11 === 0, "v4"), MaxRecordsPerPoll)(poll2)
      q2.processAllAvailable()
    } finally q2.stop()
    drainMart(Ts(3))

    spark.read.parquet(martDir).select(
      col(BatchPipeline.SsiCol),
      col("stream_record_id"),
      col("status"),
      col("note"),
      col(BatchPipeline.HashCol),
      col(BatchPipeline.ValidCol),
      col(graft.operators.Scd2.ActiveFlag),
      col(graft.operators.Scd2.StartDate),
      col(graft.operators.Scd2.EndDate)
    )
  }
}
