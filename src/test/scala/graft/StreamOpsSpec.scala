package graft

import graft.multimodal.Multimodal
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts: tumbling event-time windows with watermark") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val out = StreamOps.windowedCounts(
      stream.toDF().toDF("ts", "v"),
      "ts",
      windowDuration = "1 hour",
      delayThreshold = "30 minutes",
      aggCols = Seq(count(lit(1)).as("n"), sum($"v").as("sum_v"))
    )
    val q = out.writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode("update")
      .start()
    stream.addData(
      (ts("2024-01-01 10:05:00"), 1L),
      (ts("2024-01-01 10:40:00"), 2L),
      (ts("2024-01-01 11:10:00"), 10L)
    )
    q.processAllAvailable()
    q.stop()
    val got = spark
      .table("win_counts")
      .select(date_format($"window_start", "HH:mm").as("w"), $"n", $"sum_v")
      .as[(String, Long, Long)]
      .collect()
      .map { case (w, n, s) => w -> ((n, s)) }
      .toMap
    assert(got("10:00") == (2L, 3L))
    assert(got("11:00") == (1L, 10L))
  }

  test("dedupFirstSeen: replays across batches are dropped") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val deduped =
      StreamOps.dedupFirstSeen[Long, (Long, String)](stream.toDS(), _._1, stateTtl = None)
    val q = deduped.writeStream
      .format("memory")
      .queryName("first_seen")
      .outputMode("append")
      .start()
    stream.addData((1L, "a1"), (2L, "b1"))
    q.processAllAvailable()
    stream.addData((1L, "a2-replay"), (3L, "c1")) // 1 replays in a later batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("first_seen").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a1", 2L -> "b1", 3L -> "c1"))
  }

  test("funnelStages: ordered advancement across batches, in-batch disorder sorted, no regressions") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val out = StreamOps.funnelStages(
      stream.toDS(), stages = Seq("view", "click", "purchase"), stateTtl = None)
    val q = out.writeStream.format("memory").queryName("funnel").outputMode("append").start()

    // batch 1: user 1 does click-then-view OUT OF ORDER in one batch (ts
    // sort fixes it -> advances to 2); user 2 starts with click only (no
    // view yet -> no advance)
    stream.addData((1L, "click", ts(5)), (1L, "view", ts(1)), (2L, "click", ts(2)))
    q.processAllAvailable()
    // batch 2: user 1 purchases (-> stage 3); a replayed view for user 1
    // must NOT regress or re-emit; user 2 finally views (-> stage 1)
    stream.addData((1L, "purchase", ts(9)), (1L, "view", ts(1)), (2L, "view", ts(7)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("funnel").as[(Long, Int, Timestamp)].collect().toSet
    assert(got == Set(
      (1L, 1, ts(1)), (1L, 2, ts(5)), (1L, 3, ts(9)),
      (2L, 1, ts(7))
    ))
  }

  test("funnelStages: a later-batch next-stage event with an EARLIER event time cannot advance") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val out = StreamOps.funnelStages(
      stream.toDS(), stages = Seq("view", "click"), stateTtl = None)
    val q = out.writeStream.format("memory").queryName("funnel_late").outputMode("append").start()

    stream.addData((1L, "view", ts(5)))
    q.processAllAvailable()
    // click at 10:01 arrives AFTER the 10:05 view advanced — a
    // time-inverted progression the batch twin (ts > fv) rejects; the
    // stream state must reject it too (no batch-boundary dependence)
    stream.addData((1L, "click", ts(1)))
    q.processAllAvailable()
    // a properly-ordered click then advances
    stream.addData((1L, "click", ts(9)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("funnel_late").as[(Long, Int, Timestamp)].collect().toSet
    assert(got == Set((1L, 1, ts(5)), (1L, 2, ts(9))))
  }

  test("funnelStages: sub-millisecond stage progression advances at full micros precision") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    // two stage events inside the SAME millisecond, 250us apart — the
    // batch twin compares whole timestamps, so the stream must advance
    // (a millis-truncated comparison would see equal times and stall)
    def us(u: Int): Timestamp = {
      val t = Timestamp.valueOf("2024-01-01 10:00:00")
      t.setNanos(u * 1000); t
    }
    val out = StreamOps.funnelStages(
      stream.toDS(), stages = Seq("view", "click", "purchase"), stateTtl = None)
    val q = out.writeStream.format("memory").queryName("funnel_us").outputMode("append").start()

    // same batch: view at +250us, click at +500us — strictly after at micros
    stream.addData((1L, "view", us(250)), (1L, "click", us(500)))
    q.processAllAvailable()
    // later batch: purchase at +750us, still inside the same millisecond
    stream.addData((1L, "purchase", us(750)))
    q.processAllAvailable()
    // replayed click at +500us (== state's last-advance micros) is a no-op
    stream.addData((1L, "click", us(500)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("funnel_us").as[(Long, Int, Timestamp)].collect().toSet
    assert(got == Set((1L, 1, us(250)), (1L, 2, us(500)), (1L, 3, us(750))))
  }

  test("sessionCounts: session_window merges events within the gap, splits across it") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val out = StreamOps.sessionCounts(
      stream.toDF().toDF("user_id", "ts"),
      keyCol = "user_id",
      tsCol = "ts",
      gapDuration = "10 minutes",
      delayThreshold = "5 minutes"
    )
    // sessions can MERGE as events arrive, so session_window supports
    // only append output: a session is emitted once the watermark
    // passes its close
    val q = out.writeStream
      .format("memory")
      .queryName("sess_counts")
      .outputMode("append")
      .start()
    stream.addData(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:05:00")), // within gap -> same session
      (1L, ts("2024-01-01 10:30:00")), // 25 min later -> new session
      (2L, ts("2024-01-01 10:02:00"))
    )
    q.processAllAvailable()
    // push the watermark (12:00 - 5 min delay) past every session close
    // so the finalized sessions surface in append mode
    stream.addData((9L, ts("2024-01-01 12:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark
      .table("sess_counts")
      .select($"user_id", date_format($"session_start", "HH:mm").as("s"), $"n")
      .as[(Long, String, Long)]
      .collect()
      .map { case (u, s, n) => (u, s) -> n }
      .toMap
    assert(got == Map(
      (1L, "10:00") -> 2L, // two merged events, window extends to 10:05+gap
      (1L, "10:30") -> 1L,
      (2L, "10:02") -> 1L
    ))
  }

  test("streamStreamLookbackJoin: pairs within the lookback only, across micro-batches") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val views  = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.streamStreamLookbackJoin(
      clicks.toDF().toDF("k", "cts", "click"),
      views.toDF().toDF("k", "vts", "view"),
      keyCol = "k",
      leftTsCol = "cts",
      rightTsCol = "vts",
      lookback = "10 minutes",
      delayThreshold = "5 minutes"
    )
    val q = out.writeStream
      .format("memory")
      .queryName("ss_join")
      .outputMode("append")
      .start()
    // views land in an EARLIER micro-batch than the clicks that join them
    views.addData(
      (1L, ts("2024-01-01 10:00:00"), "v1"),
      (1L, ts("2024-01-01 09:45:00"), "v0-too-old"),
      (2L, ts("2024-01-01 10:02:00"), "v2")
    )
    q.processAllAvailable()
    clicks.addData(
      (1L, ts("2024-01-01 10:05:00"), "c1"), // joins v1 (5 min back), not v0 (20 min)
      (2L, ts("2024-01-01 10:01:00"), "c2"), // v2 is AFTER the click -> no match
      (3L, ts("2024-01-01 10:06:00"), "c3")  // keyless -> no row (inner join)
    )
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_join").select($"click", $"view").as[(String, String)].collect().toSet
    assert(got == Set(("c1", "v1")))
  }

  test("hot-key sustained stream: lookback-join state stays watermark-bounded, not stream-length") {
    // the skew analogue of StreamingChaosSpec: ONE key hammered for many
    // micro-batches. Watermark eviction must keep the join's state store
    // flat at ~O(watermark + lookback window) rows — if state tracked
    // stream LENGTH instead, a hot key would grow it without bound.
    implicit val sq = spark.sqlContext
    val left  = MemoryStream[(Long, Timestamp, String)]
    val right = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.streamStreamLookbackJoin(
      left.toDF().toDF("k", "cts", "l"),
      right.toDF().toDF("k", "vts", "r"),
      keyCol = "k", leftTsCol = "cts", rightTsCol = "vts",
      lookback = "5 minutes", delayThreshold = "5 minutes"
    )
    val q = out.writeStream
      .format("memory").queryName("hotkey_join").outputMode("append").start()
    def stateRows: Long =
      Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.map(_.numRowsTotal))
        .sum
    val t0 = ts("2024-01-01 10:00:00").getTime
    val nBatches = 40
    val perBatch = 5
    var midState = 0L
    for (b <- 0 until nBatches) {
      val rows = (0 until perBatch).map { i =>
        (1L, new Timestamp(t0 + b * 60000L + i * 1000L), s"b$b-$i") // one hot key, ts advancing
      }
      left.addData(rows.map { case (k, t, v) => (k, t, v) }: _*)
      right.addData(rows.map { case (k, t, v) => (k, t, v) }: _*)
      q.processAllAvailable()
      if (b == nBatches / 2 - 1) midState = stateRows
    }
    val endState = stateRows
    q.stop()
    val streamed = nBatches.toLong * perBatch * 2
    assert(endState > 0, "state metrics must be observable")
    // flat, not growing: the second half of the stream added nothing net
    assert(endState <= midState + perBatch * 2,
      s"state grew with stream length: mid=$midState end=$endState")
    // and bounded well below everything streamed
    assert(endState < streamed / 2, s"state=$endState of $streamed streamed rows")
  }

  test("hot-key sustained stream: dedupWithinWatermark holds one state row per live key") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.dedupWithinWatermark(
      stream.toDF().toDF("k", "ts", "payload"),
      tsCol = "ts", delayThreshold = "5 minutes", keys = Seq("k"))
    val q = out.writeStream
      .format("memory").queryName("hotkey_dedup").outputMode("append").start()
    val t0 = ts("2024-01-01 10:00:00").getTime
    for (b <- 0 until 40) {
      // the same key re-sent every batch with advancing event time
      stream.addData((1L, new Timestamp(t0 + b * 60000L), s"b$b"))
      q.processAllAvailable()
    }
    val endState = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
    q.stop()
    assert(endState > 0 && endState <= 8,
      s"dedup state must stay ~O(keys within watermark), got $endState rows after 40 batches")
  }

  test("dedupWithinWatermark: replays inside the delay are dropped, state is event-time bounded") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.dedupWithinWatermark(
      stream.toDF().toDF("k", "ts", "payload"),
      tsCol = "ts",
      delayThreshold = "10 minutes",
      keys = Seq("k")
    )
    val q = out.writeStream
      .format("memory")
      .queryName("wm_dedup")
      .outputMode("append")
      .start()
    stream.addData(
      (1L, ts("2024-01-01 10:00:00"), "first"),
      (2L, ts("2024-01-01 10:01:00"), "only")
    )
    q.processAllAvailable()
    // replay of key 1 within the watermark delay -> dropped
    stream.addData((1L, ts("2024-01-01 10:04:00"), "replay"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wm_dedup").select($"k", $"payload").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "first", 2L -> "only"))
  }

  test("enrichStatic: stateless stream-static left join; dim is a fixed snapshot") {
    implicit val sq = spark.sqlContext
    val dimDir = tempDir("stream-dim")
    Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "name")
      .write.mode("overwrite").parquet(dimDir)

    val stream = MemoryStream[(Long, Long)]
    val out = StreamOps.enrichStatic(
      stream.toDF().toDF("user_id", "v"),
      spark.read.parquet(dimDir),
      keyCol = "user_id"
    )
    val q = out.writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      stream.addData((1L, 10L), (3L, 30L)) // 3 has no dim row
      q.processAllAvailable()
      val batch1 = spark.table("enriched").select($"user_id", $"v", $"name")
        .as[(Long, Long, Option[String])].collect().toSet
      assert(batch1 == Set((1L, 10L, Some("alice")), (3L, 30L, None)))

      // later batches join statelessly (no watermark, nothing buffered);
      // a dim file landing mid-query is NOT seen — the plain-parquet dim
      // listing resolved at query start (per-batch refresh = foreachBatch
      // re-read or a transactional table format)
      Seq((3L, "carol")).toDF("user_id", "name").write.mode("append").parquet(dimDir)
      stream.addData((2L, 20L), (3L, 31L))
      q.processAllAvailable()
      val batch2 = spark.table("enriched").as[(Long, Long, Option[String])].collect().toSet
      assert(batch2.contains((2L, 20L, Some("bob"))))
      assert(batch2.contains((3L, 31L, None)))
    } finally q.stop()
  }

  test("multimodal resize: real PNG in/out, nearest-neighbor pixels, refreshed metadata") {
    val packed = Multimodal.pack(Seq((1L, "payload-one")).toDF("id", "data"), "id", "data", "image", "img/fake")
    val img    = Multimodal.toImagePayload(packed, w = 4, h = 4)
    val row    = Multimodal.resize(img, w = 2, h = 2).head()
    val payload = row.getAs[Array[Byte]]("payload")
    // output is a genuine PNG (magic bytes) with refreshed metadata
    assert(payload.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Int]("n_bytes") == payload.length)
    assert(meta.getAs[String]("mime") == "image/png")
    // decoded 2x2 = nearest-neighbor picks of the source md5 pixels (0, 2, 8, 10)
    val digest = java.security.MessageDigest
      .getInstance("MD5").digest("payload-one".getBytes("UTF-8"))
    val Some((w, h, lum)) = Multimodal.decodeLuminance(payload)
    assert((w, h) == (2, 2))
    val expected = Seq(0, 2, 8, 10).map(p => ((digest(p) & 0xff) / 255.0).toFloat)
    assert(lum.toSeq == expected)
    // deterministic: same input -> same bytes
    val again = Multimodal.resize(img, 2, 2).head().getAs[Array[Byte]]("payload")
    assert(payload.sameElements(again))
  }

  test("multimodal sampleFrames: structural PNG demux, sampled frames decode to per-frame pixels") {
    val packed = Multimodal.pack(Seq((5L, "clip-one")).toDF("id", "data"), "id", "data", "video", "vid/raw")
    val video  = Multimodal.toVideoPayload(packed, w = 4, h = 4, nFrames = 7)
    val payload = video.head().getAs[Array[Byte]]("payload")
    // the container is 7 variable-length real PNGs; the structural demux
    // must recover exactly 7 contiguous extents covering every byte
    val extents = Multimodal.pngFrameExtents(payload)
    assert(extents.size == 7)
    assert(extents.head._1 == 0 && extents.last._2 == payload.length)
    assert(extents.sliding(2).forall { case Seq(a, b) => a._2 == b._1; case _ => true })

    val frames = Multimodal.sampleFrames(video, stride = 3).orderBy("frame_no").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 3, 6))
    // every sampled frame is a complete PNG that DECODES to the md5-seeded
    // pixels of exactly that frame index
    frames.foreach { r =>
      val f     = r.getInt(1)
      val bytes = r.getAs[Array[Byte]]("frame")
      val md    = java.security.MessageDigest.getInstance("MD5")
      md.update("clip-one".getBytes("UTF-8"))
      md.update(s"#frame-$f".getBytes("UTF-8"))
      val digest = md.digest()
      val Some((w, h, lum)) = Multimodal.decodeLuminance(bytes)
      assert((w, h) == (4, 4))
      assert(lum.toSeq == digest.map(b => ((b & 0xff) / 255.0).toFloat).toSeq)
    }

    // a truncated tail keeps the complete prefix; non-PNG payloads demux to nothing
    assert(Multimodal.pngFrameExtents(payload.dropRight(3)).size == 6)
    assert(Multimodal.pngFrameExtents("not a png".getBytes("UTF-8")).isEmpty)
    val nonVideo = Multimodal.pack(Seq((9L, "plain")).toDF("id", "data"), "id", "data", "text", "text/plain")
    assert(Multimodal.sampleFrames(nonVideo, stride = 1).count() == 0)
  }

  test("approxDistinctByKey: sketch state accumulates across batches, replays absorbed") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val out = StreamOps.approxDistinctByKey[String](stream.toDS(), lgK = 12, stateTtl = None)
    val q = out.toDF("k", "est").writeStream
      .format("memory").queryName("adk").outputMode("update").start()
    // batch 1: a sees 200 distinct values, b sees 50
    stream.addData((0 until 200).map(i => ("a", s"v$i")) ++ (0 until 50).map(i => ("b", s"v$i")): _*)
    q.processAllAvailable()
    // batch 2: a replays all 200 (must NOT inflate) plus 100 new; b untouched
    stream.addData((0 until 300).map(i => ("a", s"v$i")): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("adk").as[(String, Long)].collect().toSeq
    // HLL is exact at these cardinalities (coupon mode below ~512 for
    // lgK 12), so the change stream is exactly: a->200, b->50, a->300;
    // b emits nothing in batch 2 (no rows touched its state)
    assert(rows.sorted === Seq(("a", 200L), ("a", 300L), ("b", 50L)))
  }
}
