package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (as-of) join: each event row is enriched with the
  * version row that was ACTIVE at the event's timestamp — the natural
  * companion of the SCD2 mart (the reference's "historic probe",
  * `ETL/DB_Lookup.py:24-54` + `Setup/SQL_DDL_Script.sql:136-163`, asks
  * this for ONE point in time; this operator answers it per event row).
  *
  * Spark-first formulation — NOT a range join: a theta-join on
  * `e.key = v.key AND e.ts >= v.from` degenerates to a per-key nested
  * loop (every event x every version of its key). Instead:
  *
  *   1. tag both sides and UNION them into one (key, ts, isVersion,
  *      payload) stream;
  *   2. one hash shuffle by key, sort by (ts, isVersion DESC) — versions
  *      sort before events at equal timestamps, so a version taking
  *      effect exactly at the event instant is visible to it;
  *   3. `last(versionPayload, ignoreNulls).over(unboundedPreceding ..
  *      currentRow)` carries the most recent version forward;
  *   4. keep only event rows.
  *
  * Cost: ONE shuffle of |events| + |versions| narrow rows and one sort —
  * the same shape as any windowed dedup, linear in input, independent of
  * versions-per-key. At 100 TB this is the difference between a pass and
  * a quadratic blowup on hot keys.
  *
  * Contract: `(vKeyCol, vTsCol)` must be unique in `versions` (dedup
  * with `Dedup.latestPerKey` first if not) — ties would make "the"
  * active version ambiguous on any engine. Events with no version at or
  * before their timestamp get NULL version fields (left-join semantics,
  * mirroring DuckDB's `ASOF LEFT JOIN`).
  */
object AsOfJoin {
  /** Tagged-union staging shared by every direction variant. With
    * `carryVersionTs` the fill struct leads with the version timestamp
    * (field `__vts`, pre-normalized to session-tz TIMESTAMP — the raw
    * parquet NTZ flavor cannot cast to DOUBLE for distance compares).
    */
  private def staged(
      events: DataFrame,
      versions: DataFrame,
      keyCol: String,
      tsCol: String,
      vKeyCol: String,
      vTsCol: String,
      carryVersionTs: Boolean = false
  ): (DataFrame, Seq[String]) = {
    val vPayloadCols = versions.columns.filterNot(c => c == vKeyCol || c == vTsCol).toSeq
    require(vPayloadCols.nonEmpty, "versions must carry at least one payload column")
    val epType = StructType(events.schema.fields)
    val vCarry =
      if (carryVersionTs)
        struct(
          col(vTsCol).cast(org.apache.spark.sql.types.TimestampType).as("__vts") +:
            vPayloadCols.map(col): _*)
      else struct(vPayloadCols.map(col): _*)
    val vpType = versions.select(vCarry).schema.head.dataType

    val v = versions.select(
      col(vKeyCol).as("__k"),
      col(vTsCol).as("__ts"),
      lit(1).as("__isv"),
      vCarry.as("__vp"),
      lit(null).cast(epType).as("__ep")
    )
    val e = events.select(
      col(keyCol).as("__k"),
      col(tsCol).as("__ts"),
      lit(0).as("__isv"),
      lit(null).cast(vpType).as("__vp"),
      struct(events.columns.map(col): _*).as("__ep")
    )
    (v.unionByName(e), vPayloadCols)
  }

  /** The growing-frame forward fill: descending timestamp sort with an
    * unboundedPreceding..currentRow frame. Spark evaluates a GROWING
    * frame incrementally (O(n) per partition); the naive formulation —
    * ascending sort with currentRow..unboundedFollowing — re-scans to
    * the partition end per row (O(n^2)), which on a hot key is exactly
    * the blowup this module exists to avoid. At equal timestamps the
    * version sorts BEFORE the event (isv DESC under ts DESC) so the
    * event's frame includes it (inclusive forward semantics).
    */
  private def nextFill(c: Column): (Column, org.apache.spark.sql.expressions.WindowSpec) = {
    val w = Window
      .partitionBy("__k")
      .orderBy(col("__ts").desc, col("__isv").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (last(c, ignoreNulls = true), w)
  }

  /** The backward fill shared by every at-or-before variant: ascending
    * growing frame, versions before events at equal timestamps
    * (inclusive at-or-before semantics).
    */
  private def prevFill(c: Column): (Column, org.apache.spark.sql.expressions.WindowSpec) = {
    val w = Window
      .partitionBy("__k")
      .orderBy(col("__ts").asc, col("__isv").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (last(c, ignoreNulls = true), w)
  }

  /** Exact event-time in MICROSECOND longs — distance compares must not
    * go through doubles (a 2024-era epoch has ~0.5 us double ULP, which
    * can flip an inclusive tolerance boundary or a nearest tie).
    */
  private def micros(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  def enrich(
      events: DataFrame,
      versions: DataFrame,
      keyCol: String,
      tsCol: String,
      vKeyCol: String,
      vTsCol: String
  ): DataFrame = {
    val (union, vPayloadCols) = staged(events, versions, keyCol, tsCol, vKeyCol, vTsCol)
    val (fill, w) = prevFill(col("__vp"))

    union
      .withColumn("__active", fill.over(w))
      .where(col("__isv") === 0)
      .select(col("__ep.*") +: vPayloadCols.map(c => col("__active").getField(c).as(c)): _*)
  }

  /** Forward as-of: each event gets the EARLIEST version at or after its
    * timestamp (pandas merge_asof direction='forward'; DuckDB
    * `ASOF LEFT JOIN ... ON e.ts <= v.ts`). Same single-shuffle tagged
    * union as [[enrich]], with the fill running over the DESCENDING
    * growing frame ([[nextFill]]) so the pass stays O(n) per partition.
    * Events after the last version get NULLs (left-join semantics).
    */
  def enrichForward(
      events: DataFrame,
      versions: DataFrame,
      keyCol: String,
      tsCol: String,
      vKeyCol: String,
      vTsCol: String
  ): DataFrame = {
    val (union, vPayloadCols) = staged(events, versions, keyCol, tsCol, vKeyCol, vTsCol)
    val (fill, w) = nextFill(col("__vp"))

    union
      .withColumn("__active", fill.over(w))
      .where(col("__isv") === 0)
      .select(col("__ep.*") +: vPayloadCols.map(c => col("__active").getField(c).as(c)): _*)
  }

  /** Nearest as-of: each event gets the version with the smallest
    * absolute timestamp distance, ties resolved BACKWARD (the at-or-
    * before version wins — merge_asof direction='nearest' semantics).
    * Still ONE hash exchange: both directional fills run as two GROWING-
    * frame Window passes over the same key partitioning (the second
    * pass re-sorts within partitions, no reshuffle — and no shrinking
    * frame, see [[nextFill]]), then a codegen'd comparison picks the
    * closer side. The version timestamp rides inside the fill struct so
    * the distance needs no join back.
    *
    * Timestamps compare as INSTANTS in the session time zone (NTZ
    * inputs are interpreted as session-local — this library pins UTC
    * everywhere, where instant and wall-clock distance coincide).
    */
  def enrichNearest(
      events: DataFrame,
      versions: DataFrame,
      keyCol: String,
      tsCol: String,
      vKeyCol: String,
      vTsCol: String
  ): DataFrame = {
    val (union, vPayloadCols) =
      staged(events, versions, keyCol, tsCol, vKeyCol, vTsCol, carryVersionTs = true)

    val (pfill, wb) = prevFill(col("__vp"))
    val (nfill, wf) = nextFill(col("__vp"))

    val eTs   = micros(col("__ts"))
    val prevD = eTs - micros(col("__prev").getField("__vts"))
    val nextD = micros(col("__next").getField("__vts")) - eTs
    union
      .withColumn("__prev", pfill.over(wb))
      .withColumn("__next", nfill.over(wf))
      .where(col("__isv") === 0)
      .withColumn(
        "__best",
        when(col("__prev").isNull, col("__next"))
          .when(col("__next").isNull, col("__prev"))
          .when(nextD < prevD, col("__next")) // strict: ties go backward
          .otherwise(col("__prev"))
      )
      .select(col("__ep.*") +: vPayloadCols.map(c => col("__best").getField(c).as(c)): _*)
  }

  /** Backward as-of with a staleness bound (merge_asof `tolerance`): a
    * version older than `toleranceSeconds` at the event instant is
    * rejected — the event gets NULLs instead of stale enrichment (the
    * guard every real-time feature store wants: "the price, unless it's
    * more than an hour old"). Same plan as [[enrich]] plus one codegen'd
    * distance filter on the carried version timestamp.
    */
  def enrichTolerant(
      events: DataFrame,
      versions: DataFrame,
      keyCol: String,
      tsCol: String,
      vKeyCol: String,
      vTsCol: String,
      toleranceSeconds: Long
  ): DataFrame = {
    require(toleranceSeconds >= 0, s"tolerance must be >= 0, got $toleranceSeconds")
    val (union, vPayloadCols) =
      staged(events, versions, keyCol, tsCol, vKeyCol, vTsCol, carryVersionTs = true)

    val (fill, w) = prevFill(col("__vp"))
    val prevD = micros(col("__ts")) - micros(col("__prev").getField("__vts"))

    union
      .withColumn("__prev", fill.over(w))
      .where(col("__isv") === 0)
      .withColumn("__best", when(prevD <= toleranceSeconds * 1000000L, col("__prev")))
      .select(col("__ep.*") +: vPayloadCols.map(c => col("__best").getField(c).as(c)): _*)
  }

  /** Skew-hardened as-of join: identical semantics to [[enrich]] (spec-
    * pinned equal on every fixture), but the forward-fill window
    * partitions by (key, TIME BUCKET) instead of key alone.
    *
    * [[enrich]]'s one weakness at scale is the same hot-key failure mode
    * the salted CDC router fixes for J1: `Window.partitionBy(key)` lands
    * every row of a mass-default key (the "unknown user" every real feed
    * has) on ONE task. Fixed-width time bucketing bounds a partition by
    * `bucketSeconds` of ONE key's traffic — a hot key spreads over its
    * whole time range — at the cost of a carry-in pass:
    *
    *   1. per (key, bucket): the LAST version in that bucket (one
    *      partial-aggregated max of (ts, payload) structs — versions
    *      only, narrow);
    *   2. carry-in per (key, bucket): the most recent version payload
    *      from any STRICTLY earlier bucket — a window over the compact
    *      per-bucket summary (≤ one row per bucket per key, so the
    *      per-key partition is bounded by the time range / bucket width,
    *      NOT by row count — hot keys are safe here);
    *   3. within each (key, bucket): the same tagged-union forward-fill
    *      as [[enrich]]; events with no in-bucket version at or before
    *      them fall back to the carry-in.
    *
    * Versions in an earlier bucket always have ts < the event's (bucket
    * floors are monotone), and equal-ts version-before-event ordering
    * only matters within a bucket, where the (ts, isVersion DESC) sort
    * preserves it — so the composition is exactly [[enrich]]'s contract.
    * Like [[enrich]], the contract REQUIRES unique (key, ts) on the
    * version side; a violating frame is ambiguous on either path (here
    * the max_by pick is additionally run-order-dependent), so dedup
    * with `Dedup.latestPerKey` first.
    *
    * Cost: ~4 shuffles vs 1 (versions agg, event-bucket distinct, carry
    * window, main window+join) — the price of bounding every partition.
    * Pick `bucketSeconds` so one bucket of the hottest key fits a task
    * (e.g. daily buckets for a feed with ≤ tens of millions of rows per
    * key-day).
    */
  def enrichBucketed(
      events: DataFrame,
      versions: DataFrame,
      keyCol: String,
      tsCol: String,
      vKeyCol: String,
      vTsCol: String,
      bucketSeconds: Long
  ): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val vPayloadCols = versions.columns.filterNot(c => c == vKeyCol || c == vTsCol).toSeq
    require(vPayloadCols.nonEmpty, "versions must carry at least one payload column")
    val epType = StructType(events.schema.fields)
    val vpType = StructType(versions.schema.fields.filter(f => vPayloadCols.contains(f.name)))

    def bucketOf(ts: Column): Column =
      floor(ts.cast("timestamp").cast("double") / bucketSeconds.toDouble).cast("long")

    val v = versions
      .select(
        col(vKeyCol).as("__k"),
        col(vTsCol).as("__ts"),
        lit(1).as("__isv"),
        struct(vPayloadCols.map(col): _*).as("__vp"),
        lit(null).cast(epType).as("__ep")
      )
      .withColumn("__b", bucketOf(col("__ts")))
    val e = events
      .select(
        col(keyCol).as("__k"),
        col(tsCol).as("__ts"),
        lit(0).as("__isv"),
        lit(null).cast(vpType).as("__vp"),
        struct(events.columns.map(col): _*).as("__ep")
      )
      .withColumn("__b", bucketOf(col("__ts")))

    // last version per (key, bucket): max_by orders by ts ALONE, so the
    // payload struct never needs to be orderable (maps etc. stay legal,
    // exactly as in [[enrich]]); (key, ts) uniqueness makes it unambiguous
    val perBucketLast = v
      .groupBy(col("__k"), col("__b"))
      .agg(max_by(col("__vp"), col("__ts")).as("__last"))
    val evBuckets = e
      .select(col("__k"), col("__b"))
      .distinct()
      .withColumn("__last", lit(null).cast(vpType))
    // carry-in = most recent version from strictly earlier buckets; the
    // frame is ONE row per (key, bucket), so the per-key window is
    // bounded by the bucket count, never by the hot key's row count.
    // The combine sees at most one non-null __last per (key, bucket)
    // (versions side is already grouped), so first(ignoreNulls) is
    // deterministic.
    val wc = Window
      .partitionBy(col("__k"))
      .orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = perBucketLast
      .unionByName(evBuckets)
      .groupBy(col("__k"), col("__b"))
      .agg(first(col("__last"), ignoreNulls = true).as("__last"))
      .withColumn("__carryp", last(col("__last"), ignoreNulls = true).over(wc))
      .select(col("__k"), col("__b"), col("__carryp"))

    val w = Window
      .partitionBy(col("__k"), col("__b"))
      .orderBy(col("__ts").asc, col("__isv").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    v.unionByName(e)
      .withColumn("__active", last(col("__vp"), ignoreNulls = true).over(w))
      .where(col("__isv") === 0)
      .join(carry, Seq("__k", "__b"), "left")
      .withColumn("__best", coalesce(col("__active"), col("__carryp")))
      .select(col("__ep.*") +: vPayloadCols.map(c => col("__best").getField(c).as(c)): _*)
  }
}
