package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators beyond the reference's poll loop: the
  * Structured-Streaming-native capabilities a scaled deployment of this
  * pipeline needs (the reference has no event-time semantics at all —
  * SURVEY §2.10: "late" data just becomes a new SCD2 version).
  *
  *   - `windowedCounts`: watermarked tumbling-window aggregation. State
  *     is bounded by the watermark: windows older than `delayThreshold`
  *     are finalized and evicted, so the job runs forever at constant
  *     memory per key-window.
  *   - `dedupFirstSeen`: cross-batch exactly-once dedup via
  *     flatMapGroupsWithState — emits the FIRST occurrence of each key
  *     and drops replays (the at-least-once archive's consumer-side
  *     guarantee, T3, upgraded to streaming state). State per key is one
  *     boolean + timeout timestamp, evicted by processing-time timeout.
  */
object StreamOps {
  /** Tumbling event-time window counts with a watermark.
    *
    * @param events   streaming frame with an event-time column
    * @param tsCol    event-time column (TimestampType)
    * @param windowDuration  e.g. "1 hour"
    * @param delayThreshold  watermark lateness bound, e.g. "10 minutes"
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      windowDuration: String,
      delayThreshold: String,
      aggCols: Seq[org.apache.spark.sql.Column] = Seq(count(lit(1)).as("n"))
  ): DataFrame =
    events
      .withWatermark(tsCol, delayThreshold)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("*")
      )
      .drop("window")

  /** Cross-batch first-seen dedup. With `stateTtl` set, keys expire from
    * state after that much processing-time inactivity (bounded state — an
    * expired key seen again is re-emitted, which callers accept for
    * TTL >> replay horizon; same contract as any TTL'd dedup cache).
    * TTL requires a real trigger interval: under the default
    * as-fast-as-possible trigger, timeout evaluation schedules continuous
    * empty micro-batches (and `processAllAvailable` never settles), so
    * pass None for unbounded state in tests/short-lived jobs.
    */
  def dedupFirstSeen[K: Encoder, V: Encoder](
      ds: Dataset[V],
      key: V => K,
      stateTtl: Option[String] = Some("1 hour")
  ): Dataset[V] = {
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, V](
        OutputMode.Append(),
        timeoutConf
      ) { (_: K, rows: Iterator[V], state: GroupState[Boolean]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else if (state.exists) {
          // key already emitted in an earlier batch -> drop replays
          stateTtl.foreach(state.setTimeoutDuration)
          Iterator.empty
        } else if (rows.hasNext) {
          state.update(true)
          stateTtl.foreach(state.setTimeoutDuration)
          Iterator.single(rows.next()) // first occurrence only
        } else Iterator.empty
      }
  }

  /** Streaming ordered-funnel tracker — the stateful-streaming twin of
    * the batch funnel query (t_funnel_stages): per key, advance through
    * `stages` IN ORDER as matching events arrive, emitting one
    * (key, stageReached, eventTs) row per ADVANCE — funnel progression
    * as a change stream. The batch twin's contract holds exactly: each
    * stage must occur STRICTLY AFTER the previous stage's event time,
    * enforced against state (stage, lastAdvanceMicros) — so a
    * next-stage event arriving in a LATER micro-batch with an EARLIER
    * event time cannot advance (no time-inverted funnels), and batch
    * boundaries never change the outcome. Within a batch events sort by
    * (event time, stage position); replays and stragglers are no-ops.
    * State per key is (int, long) + optional processing-time TTL — one
    * fixed-size record per tracked key regardless of event volume, the
    * property a 100 TB event stream needs from its funnel state.
    */
  def funnelStages[K](
      ds: Dataset[(K, String, java.sql.Timestamp)],
      stages: Seq[String],
      stateTtl: Option[String] = Some("1 hour")
  )(implicit
      kEnc: Encoder[K],
      outEnc: Encoder[(K, Int, java.sql.Timestamp)]
  ): Dataset[(K, Int, java.sql.Timestamp)] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    implicit val stEnc: Encoder[(Int, Long)] = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Long), (K, Int, java.sql.Timestamp)](
        OutputMode.Append(),
        timeoutConf
      ) { (key: K, rows: Iterator[(K, String, java.sql.Timestamp)], state: GroupState[(Int, Long)]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          // FULL timestamp precision: Timestamp.getTime truncates to
          // millis, but the batch twin compares whole timestamps — two
          // stage events inside the same millisecond (distinct micros,
          // correctly ordered) must still advance. Epoch micros carry
          // the sub-milli fraction from getNanos.
          def micros(ts: java.sql.Timestamp): Long =
            ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
          var (cur, lastUs) = state.getOption.getOrElse((0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, Int, java.sql.Timestamp)]
          // (ts, stage position) sort: at equal timestamps the earlier
          // stage processes first; strict ts progression below makes the
          // outcome independent of how events split across batches
          rows.toSeq
            .sortBy(r => (micros(r._3), stages.indexOf(r._2) match { case -1 => Int.MaxValue; case i => i }))
            .foreach { r =>
              val us = micros(r._3)
              if (cur < stages.length && r._2 == stages(cur) && (cur == 0 || us > lastUs)) {
                cur += 1
                lastUs = us
                out += ((key, cur, r._3))
              }
            }
          if (cur > 0) state.update((cur, lastUs))
          stateTtl.foreach(state.setTimeoutDuration)
          out.iterator
        }
      }
  }

  /** Streaming gap-based sessionization — the `session_window` twin of
    * the batch [[graft.operators.Sessionize]] operator. Sessions for a
    * key merge while events arrive within `gapDuration` of each other;
    * the watermark finalizes (and evicts) a session once event time
    * passes its close + `delayThreshold`, so state stays bounded by the
    * number of OPEN sessions, not the stream's history.
    */
  def sessionCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapDuration: String,
      delayThreshold: String
  ): DataFrame =
    events
      .withWatermark(tsCol, delayThreshold)
      .groupBy(col(keyCol), session_window(col(tsCol), gapDuration))
      .agg(count(lit(1)).as("n"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n")
      )

  /** Stream-stream equi-join bounded by an event-time range: each left
    * event pairs with right events of the same key whose timestamp lies
    * in `[leftTs - lookback, leftTs]`. Both sides carry watermarks and
    * the join condition bounds their time skew, so Spark can size the
    * join state buffers finitely and evict rows as the watermarks
    * advance — the required shape for an unbounded two-stream join
    * (an unconstrained stream-stream join would buffer both streams
    * forever).
    */
  def streamStreamLookbackJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      lookback: String,
      delayThreshold: String
  ): DataFrame = {
    val l = left.withWatermark(leftTsCol, delayThreshold)
    val r = right.withWatermark(rightTsCol, delayThreshold)
    l.join(
      r,
      l(keyCol) === r(keyCol) &&
        r(rightTsCol) >= l(leftTsCol) - expr(s"INTERVAL $lookback") &&
        r(rightTsCol) <= l(leftTsCol)
    ).drop(r(keyCol))
  }

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * against a STATIC dimension frame — the Structured-Streaming twin of
    * the batch broadcast-dim enrich (SURVEY §2.4 J2 / U2–U4 lookups,
    * reference `ETL/XML_Streaming.py`'s consumer-side dimension decode).
    * Stateless: unlike a stream-stream join nothing is buffered, so no
    * watermark is required. The static subplan re-executes per
    * micro-batch, but a plain-parquet dimension's file listing is
    * resolved ONCE at query start — the dim is a fixed snapshot for the
    * query's lifetime (pinned in StreamOpsSpec; per-batch dim refresh is
    * a transactional-table-format capability, or re-read the dim inside
    * `foreachBatch` where each batch plans a fresh static side).
    * `broadcastDim` pins the scale shape: a small dim ships to executors
    * once per batch and the (unbounded) stream side never shuffles.
    *
    * Only stream-left join types are stateless-legal here: "inner" drops
    * unmatched events, "left_outer" keeps them with null dim columns
    * (right/full outer against a static right would need the static side
    * to wait on stream completion — rejected by Spark).
    */
  def enrichStatic(
      stream: DataFrame,
      dim: DataFrame,
      keyCol: String,
      joinType: String = "left_outer",
      broadcastDim: Boolean = true
  ): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    stream.join(d, Seq(keyCol), joinType)
  }

  /** Watermark-bounded streaming dedup: drops key replays that arrive
    * within the watermark delay of the first occurrence, with state
    * evicted as the watermark advances (Spark's
    * `dropDuplicatesWithinWatermark`). The bounded-state complement to
    * [[dedupFirstSeen]]: eviction is driven by EVENT time rather than a
    * processing-time TTL, so a replay horizon expressed in stream time
    * (the archive re-send window, SURVEY §2.10 T3) maps onto
    * `delayThreshold` directly.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      tsCol: String,
      delayThreshold: String,
      keys: Seq[String]
  ): DataFrame =
    events
      .withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming NEAR-dup ingest gate: per micro-batch, flag documents
    * whose MinHash band signatures collide with the persisted corpus
    * store ([[graft.operators.IncrementalDedup]]) or with an earlier
    * (lower-id) document of the same batch, then append the batch's
    * signatures to the store — the "is this new document a near-copy of
    * ANYTHING ingested so far" gate, running continuously at ingest.
    *
    * foreachBatch, not a stream-stream join: the store is both an input
    * and an output of every batch (self-referential state Structured
    * Streaming cannot express as a join), and the flag must see the
    * WHOLE corpus history, not a watermarked window of it. Per batch:
    * one narrow signature stage over batch docs, one band-bucket join
    * against the store (store side pre-partitioned by band), one append
    * of batch-sized signature rows.
    *
    * Crash contract (at-least-once + idempotent flagging): a replayed
    * batch re-meets its own stored signatures, which the same-id guard
    * ignores, so flags are unchanged on replay; the store accumulates
    * duplicate (id, band, sig) rows, which change no collision answer
    * (membership, not counts) and are reclaimed by store compaction.
    *
    * `sink` receives the flagged batch: original columns plus
    * `near_dup` (boolean) and the micro-batch id.
    */
  /** Streaming per-key approximate distinct count — the streaming twin
    * of [[graft.operators.IncrementalDistinct]]: state per key is ONE
    * serialized DataSketches HLL sketch (~2^lgK bytes, constant
    * regardless of stream volume), updated per micro-batch, emitting
    * (key, estimate) after every batch that touches the key — a
    * cardinality change stream ("distinct users per campaign so far").
    *
    * The sketch state is what makes unbounded-cardinality streaming
    * distinct possible at all: exact dedup state grows with the value
    * universe; the sketch does not, and replays are absorbed (HLL
    * insertion is idempotent — the at-least-once contract holds with
    * NO dedup pass). Estimates are deterministic for a given multiset
    * history; cross-batch accumulation equals a single-batch build
    * (spec-pinned), so batch boundaries never change the answer.
    */
  def approxDistinctByKey[K: Encoder](
      ds: Dataset[(K, String)],
      lgK: Int = 12,
      stateTtl: Option[String] = None
  ): Dataset[(K, Long)] = {
    import org.apache.datasketches.hll.HllSketch
    import org.apache.datasketches.memory.Memory
    implicit val stateEnc: Encoder[Array[Byte]] = Encoders.BINARY
    implicit val outEnc: Encoder[(K, Long)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.scalaLong)
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], (K, Long)](
        OutputMode.Update(),
        timeoutConf
      ) { (key: K, rows: Iterator[(K, String)], state: GroupState[Array[Byte]]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val sk =
            if (state.exists) HllSketch.heapify(Memory.wrap(state.get))
            else new HllSketch(lgK)
          var touched = false
          rows.foreach { case (_, v) => if (v != null) { sk.update(v); touched = true } }
          if (touched) {
            state.update(sk.toUpdatableByteArray)
            stateTtl.foreach(state.setTimeoutDuration)
            Iterator.single((key, Math.round(sk.getEstimate)))
          } else Iterator.empty
        }
      }
  }

  def nearDupGate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      storePath: String,
      n: Int,
      nHashes: Int,
      rowsPerBand: Int,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit
  ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val bands = graft.operators.IncrementalDedup
          .bandSignatures(batch, idCol, col(textCol), n, nHashes, rowsPerBand)
          .cache()
        try {
          val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
          val haveStore = fs.exists(new org.apache.hadoop.fs.Path(storePath))
          // vs-store: the BATCH doc is the dup, whatever the id order
          val vsStore =
            if (haveStore)
              bands
                .select(col("band"), col("sig"), col("id").as("__bid"))
                .join(
                  graft.operators.IncrementalDedup
                    .readStore(spark, storePath)
                    .select(col("band"), col("sig"), col("id").as("__sid")),
                  Seq("band", "sig")
                )
                .where(col("__bid") =!= col("__sid"))
                .select(col("__bid").as("id"))
            else bands.select(col("id")).where(lit(false)) // typed-empty: no store yet
          // within-batch: survivor election by min id — id_b is the dup
          val within = graft.operators.ApproxDedup
            .pairsFromBandRows(bands, graft.operators.ApproxDedup.DefaultMaxBucket)
            .select(col("id_b").as("id"))
          val dupIds = vsStore.unionByName(within).distinct()
          val flagged = batch.join(
            dupIds.withColumn("near_dup", lit(true)).withColumnRenamed("id", idCol),
            Seq(idCol),
            "left_outer"
          )
          sink(
            flagged.withColumn("near_dup", coalesce(col("near_dup"), lit(false))),
            batchId
          )
          if (haveStore) graft.operators.IncrementalDedup.appendToStore(bands, storePath)
          else graft.operators.IncrementalDedup.writeStore(bands, storePath)
        } finally {
          bands.unpersist()
          ()
        }
      }
      .start()
}
