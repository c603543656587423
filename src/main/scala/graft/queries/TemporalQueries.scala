package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, Sessionize, Skew}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-join / sessionization / skew-resistant-aggregation queries —
  * warehouse operations the reference system's SCD2 mart implies (the
  * historic probe, `ETL/DB_Lookup.py:24-54`, generalized to per-event
  * point-in-time) plus the event-log shaping steps of a training-data
  * pipeline. Portability rules as in [[RelationalQueries]] (timestamps
  * out as strings, sums out as BIGINT, exact integer gap arithmetic).
  */
object TemporalQueries {
  private val SessionGapSeconds = 3600L
  private val SaltBuckets = 32

  /** One version row per (custkey, orderdate) with a deterministic
    * tiebreak (max orderkey) — the unique-(key, ts) version side the
    * as-of contract requires, shared by every as-of direction query.
    */
  private def orderVersions(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val vw = Window
      .partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    Tables
      .orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_orderpriority"))
      .withColumn("__rn", row_number().over(vw))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** SQL twin of [[orderVersions]], as the opening `WITH vers` CTE. */
  private val VersSqlCte =
    """WITH vers AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority
      |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
      |        FROM orders) WHERE rn = 1)""".stripMargin

  val qs: Seq[Q] = Seq(
    // ---- as-of join: event -> latest order version at event time ----
    Q(
      "t_asof_enrich",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
        // one version row per (custkey, orderdate): deterministic
        // tiebreak (max orderkey) — the as-of contract requires unique
        // (key, ts) on the version side
        val vers = orderVersions(s, dir)
        AsOfJoin
          .enrich(ev, vers, "user_id", "ts", "o_custkey", "o_orderdate")
          .select(
            col("event_id"),
            col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
            col("o_orderkey").as("asof_orderkey"),
            col("o_orderpriority").as("asof_priority")
          )
      },
      Some(s"""$VersSqlCte
             |SELECT e.event_id, e.user_id,
             |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             |       v.o_orderkey AS asof_orderkey,
             |       v.o_orderpriority AS asof_priority
             |FROM events e ASOF LEFT JOIN vers v
             |  ON e.user_id = v.o_custkey AND e.ts >= v.o_orderdate""".stripMargin)
    ),

    // ---- forward as-of join: event -> EARLIEST order version at or
    //      after event time (merge_asof direction='forward') — the
    //      mirror frame of t_asof_enrich over the same single-shuffle
    //      tagged union ----
    Q(
      "t_asof_forward",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
        val vers = orderVersions(s, dir)
        AsOfJoin
          .enrichForward(ev, vers, "user_id", "ts", "o_custkey", "o_orderdate")
          .select(
            col("event_id"),
            col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
            col("o_orderkey").as("next_orderkey"),
            col("o_orderpriority").as("next_priority")
          )
      },
      Some(s"""$VersSqlCte
             |SELECT e.event_id, e.user_id,
             |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             |       v.o_orderkey AS next_orderkey,
             |       v.o_orderpriority AS next_priority
             |FROM events e ASOF LEFT JOIN vers v
             |  ON e.user_id = v.o_custkey AND e.ts <= v.o_orderdate""".stripMargin)
    ),

    // ---- nearest as-of join: closest version in either direction,
    //      ties backward — completes the merge_asof direction triple.
    //      Both directional fills share ONE hash exchange (two Window
    //      passes, in-partition re-sort only). ----
    Q(
      "t_asof_nearest",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
        val vers = orderVersions(s, dir)
        AsOfJoin
          .enrichNearest(ev, vers, "user_id", "ts", "o_custkey", "o_orderdate")
          .select(
            col("event_id"),
            col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
            col("o_orderkey").as("near_orderkey"),
            col("o_orderpriority").as("near_priority")
          )
      },
      Some(s"""$VersSqlCte,
             |b AS (SELECT e.event_id, e.user_id, e.ts,
             |             v.o_orderdate AS bts, v.o_orderkey AS bk, v.o_orderpriority AS bp
             |      FROM events e ASOF LEFT JOIN vers v
             |        ON e.user_id = v.o_custkey AND e.ts >= v.o_orderdate),
             |f AS (SELECT e.event_id,
             |             v.o_orderdate AS fts, v.o_orderkey AS fk, v.o_orderpriority AS fp
             |      FROM events e ASOF LEFT JOIN vers v
             |        ON e.user_id = v.o_custkey AND e.ts <= v.o_orderdate)
             |SELECT b.event_id, b.user_id,
             |       strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             |       CASE WHEN b.bts IS NULL THEN f.fk
             |            WHEN f.fts IS NULL THEN b.bk
             |            WHEN (epoch_us(f.fts) - epoch_us(b.ts)) < (epoch_us(b.ts) - epoch_us(b.bts)) THEN f.fk
             |            ELSE b.bk END AS near_orderkey,
             |       CASE WHEN b.bts IS NULL THEN f.fp
             |            WHEN f.fts IS NULL THEN b.bp
             |            WHEN (epoch_us(f.fts) - epoch_us(b.ts)) < (epoch_us(b.ts) - epoch_us(b.bts)) THEN f.fp
             |            ELSE b.bp END AS near_priority
             |FROM b JOIN f USING (event_id)""".stripMargin)
    ),

    // ---- tolerance-banded as-of: each purchase enriched with the
    //      user's latest signup-session event, UNLESS it is staler than
    //      the 2-day tolerance — the feature-store freshness guard
    //      (merge_asof tolerance). Versions and probes both come from
    //      the event log so the staleness distribution actually
    //      straddles the bound. ----
    Q(
      "t_asof_tolerance",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val vw = Window
          .partitionBy(col("user_id"), col("ts"))
          .orderBy(col("signup_event").desc)
        val signups = ev
          .where(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), col("event_id").as("signup_event"))
          .withColumn("__rn", row_number().over(vw))
          .where(col("__rn") === 1)
          .drop("__rn")
        val purchases = ev
          .where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        AsOfJoin
          .enrichTolerant(
            purchases, signups, "user_id", "ts", "user_id", "ts",
            toleranceSeconds = 2L * 86400)
          .select(
            col("event_id"),
            col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
            col("signup_event")
          )
      },
      Some("""WITH signups AS (
             |  SELECT user_id, ts, event_id AS signup_event
             |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
             |        FROM events WHERE event_type = 'signup') WHERE rn = 1),
             |purchases AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             |b AS (SELECT p.event_id, p.user_id, p.ts, s.ts AS sts, s.signup_event
             |      FROM purchases p ASOF LEFT JOIN signups s
             |        ON p.user_id = s.user_id AND p.ts >= s.ts)
             |SELECT event_id, user_id,
             |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             |       CASE WHEN sts IS NOT NULL
             |                 AND epoch_us(ts) - epoch_us(sts) <= CAST(172800 AS BIGINT) * 1000000
             |            THEN signup_event END AS signup_event
             |FROM b""".stripMargin)
    ),

    // ---- skew-hardened as-of join on a HOT-KEY fixture: 75% of events
    //      collapse onto one user (the mass-default-key shape), and the
    //      bucketed variant — windows over (key, day bucket) + carry-in —
    //      must produce exactly the plain as-of semantics the DuckDB
    //      ASOF LEFT JOIN defines. TemporalOpsSpec additionally pins
    //      enrichBucketed == enrich row-for-row. ----
    Q(
      "t_asof_enrich_skew",
      (s, dir) => {
        val ev = Tables
          .events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"))
          // hot fixture: 3 of every 4 events land on user 7
          .withColumn("user_id", when(col("event_id") % 4 =!= 0, lit(7L)).otherwise(col("user_id")))
        val vers = orderVersions(s, dir)
        AsOfJoin
          .enrichBucketed(ev, vers, "user_id", "ts", "o_custkey", "o_orderdate",
            bucketSeconds = 86400L)
          .select(
            col("event_id"),
            col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
            col("o_orderkey").as("asof_orderkey"),
            col("o_orderpriority").as("asof_priority")
          )
      },
      Some("""WITH ev AS (
             |  SELECT event_id,
             |         CASE WHEN event_id % 4 != 0 THEN 7 ELSE user_id END AS user_id,
             |         ts
             |  FROM events),
             |vers AS (
             |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority
             |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
             |        FROM orders) WHERE rn = 1)
             |SELECT e.event_id, e.user_id,
             |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             |       v.o_orderkey AS asof_orderkey,
             |       v.o_orderpriority AS asof_priority
             |FROM ev e ASOF LEFT JOIN vers v
             |  ON e.user_id = v.o_custkey AND e.ts >= v.o_orderdate""".stripMargin)
    ),

    // ---- gap-based sessionization over the event log ----
    Q(
      "t_event_sessionize",
      (s, dir) =>
        Sessionize
          .withSessionIds(
            Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts")),
            keyCol = "user_id",
            tsCol = "ts",
            tiebreak = "event_id",
            gapSeconds = SessionGapSeconds
          )
          .select(
            col("event_id"),
            col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
            col("session_seq")
          ),
      Some(s"""WITH x AS (
             |  SELECT event_id, user_id, ts,
             |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${SessionGapSeconds * 1000000L}
             |              THEN 1 ELSE 0 END AS isnew
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT event_id, user_id,
             |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             |       CAST(sum(isnew) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
             |FROM x""".stripMargin)
    ),

    // ---- event-transition matrix (first-order Markov counts): adjacent
    //      event-type pairs per user via ONE lag window — the sequence-
    //      model statistic (what follows what) without materializing
    //      sequences. One user_id exchange for the lag, then the pair
    //      counts partial-aggregate on a |types|^2-bounded key space.
    //      Transition probabilities leave as exact per-row micro ratios
    //      (count arithmetic, no floats). ----
    Q(
      "t_event_transitions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        val pairs = Tables
          .events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .where(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
        val wFrom = Window.partitionBy(col("prev_type"))
        pairs
          .withColumn("from_total", sum(col("n")).over(wFrom))
          .select(
            col("prev_type"),
            col("next_type"),
            col("n"),
            floor(col("n") * 1000000L / col("from_total")).cast("long").as("p_micro")
          )
      },
      Some("""WITH pairs AS (
             |  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
             |  FROM (SELECT event_type, ts, event_id, user_id,
             |          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             |        FROM events)
             |  WHERE prev_type IS NOT NULL
             |  GROUP BY 1, 2)
             |SELECT prev_type, next_type, n,
             |  CAST(floor(n * 1000000 / CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT)) AS BIGINT) AS p_micro
             |FROM pairs""".stripMargin)
    ),

    // ---- rolling DISTINCT (7-day active users): count-distinct does
    //      not decompose over sliding windows, so the exact form uses
    //      COVERAGE EXPANSION — dedup to (user, active-day), explode
    //      each activity onto the 7 window-end days it covers, then one
    //      plain distinct-count per day. Linear x7 instead of a 7-way
    //      self-join or a per-day re-scan; the (user, day) dedup bounds
    //      the explode input at one row per user-day regardless of raw
    //      event volume. ----
    Q(
      "t_rolling_distinct_users",
      (s, dir) => {
        val act = Tables
          .events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        act
          .select(
            col("user_id"),
            explode(sequence(col("day"), date_add(col("day"), 6))).as("wday"))
          .groupBy(col("wday"))
          .agg(countDistinct(col("user_id")).as("active_7d"))
          .select(date_format(col("wday"), "yyyy-MM-dd").as("window_end_day"), col("active_7d"))
      },
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |cov AS (
             |  SELECT user_id, day + to_days(CAST(o.o AS INT)) AS wday
             |  FROM act, unnest(generate_series(0, 6)) AS o(o))
             |SELECT strftime(wday, '%Y-%m-%d') AS window_end_day,
             |       CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
             |FROM cov GROUP BY 1""".stripMargin)
    ),

    // ---- interval concurrency via sweep-line: each order is an
    //      interval [orderdate, orderdate + f(priority) days); peak
    //      simultaneous open orders per customer = the max of a running
    //      sum over the +1/-1 boundary event stream. The sweep
    //      partitions by customer (intervals only interact within a
    //      key), so every partition is bounded by one key's orders and
    //      the whole operator is one exchange + two Window passes —
    //      the relational form of interval/overlap algebra, no
    //      interval self-join. Starts sort before ends at the same
    //      instant (delta DESC), making the interval closed on both
    //      boundary ties. ----
    Q(
      "t_peak_concurrency",
      (s, dir) => {
        val pdays = (substring(col("o_orderpriority"), 1, 1).cast("int") * 10)
        val iv2 = Tables
          .orders(s, dir)
          .withColumn("pd", pdays)
          .select(
            col("o_custkey"),
            col("o_orderdate").as("s_ts"),
            (col("o_orderdate") + expr("make_dt_interval(pd, 0, 0, 0)")).as("e_ts")
          )
        val deltas = iv2
          .select(col("o_custkey"), col("s_ts").as("ts"), lit(1).as("delta"))
          .unionByName(iv2.select(col("o_custkey"), col("e_ts").as("ts"), lit(-1).as("delta")))
        val wRun = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("ts").asc, col("delta").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wPeak = Window.partitionBy(col("o_custkey"))
        deltas
          .withColumn("run", sum(col("delta")).over(wRun))
          .withColumn("peak", max(col("run")).over(wPeak))
          .where(col("run") === col("peak"))
          .groupBy(col("o_custkey"))
          .agg(
            first(col("peak")).cast("int").as("peak"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_peak_ts")
          )
      },
      Some("""WITH iv AS (
             |  SELECT o_custkey, o_orderdate AS s_ts,
             |         o_orderdate + to_days(CAST(substr(o_orderpriority, 1, 1) AS INT) * 10) AS e_ts
             |  FROM orders),
             |d AS (SELECT o_custkey, s_ts AS ts, 1 AS delta FROM iv
             |      UNION ALL SELECT o_custkey, e_ts, -1 FROM iv),
             |r AS (SELECT o_custkey, ts,
             |        sum(delta) OVER (PARTITION BY o_custkey ORDER BY ts, delta DESC
             |                         ROWS UNBOUNDED PRECEDING) AS run
             |      FROM d),
             |p AS (SELECT o_custkey, max(run) AS peak FROM r GROUP BY 1)
             |SELECT r.o_custkey, CAST(p.peak AS INT) AS peak,
             |       strftime(min(r.ts), '%Y-%m-%d %H:%M:%S') AS first_peak_ts
             |FROM r JOIN p USING (o_custkey) WHERE r.run = p.peak
             |GROUP BY 1, 2""".stripMargin)
    ),

    // ---- session path analysis: the ordered event-type sequence of
    //      each session, counted corpus-wide. Builds on the SAME
    //      sessionization as t_event_sessionize; the per-session
    //      ordered gather (array_sort of (ts, event_id, type) structs —
    //      the deterministic-collect idiom from p11) is bounded by the
    //      session gap, never by a user's lifetime event count. Path
    //      frequencies then aggregate on the path string (map-side
    //      partial agg; |distinct paths| << |sessions|). ----
    Q(
      "t_session_paths",
      (s, dir) => {
        val sess = Sessionize.withSessionIds(
          Tables
            .events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
          keyCol = "user_id",
          tsCol = "ts",
          tiebreak = "event_id",
          gapSeconds = SessionGapSeconds
        )
        sess
          .groupBy(col("user_id"), col("session_seq"))
          .agg(
            array_sort(
              collect_list(struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
          .select(concat_ws(">", transform(col("evs"), e => e.getField("event_type"))).as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path").asc)
          .limit(20)
      },
      Some(s"""WITH x AS (
             |  SELECT event_id, user_id, ts, event_type,
             |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${SessionGapSeconds * 1000000L}
             |              THEN 1 ELSE 0 END AS isnew
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |se AS (
             |  SELECT user_id, event_type, ts, event_id,
             |         sum(isnew) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                          ROWS UNBOUNDED PRECEDING) AS session_seq
             |  FROM x),
             |p AS (
             |  SELECT user_id, session_seq,
             |         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
             |  FROM se GROUP BY 1, 2)
             |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
             |FROM p GROUP BY 1 ORDER BY n_sessions DESC, path ASC LIMIT 20""".stripMargin)
    ),

    // ---- salted two-stage aggregation (skew-resistant) ----
    // lineitem grouped by l_returnflag: 3 keys for 60k+ rows is exactly
    // the hot-key shape; the salted result must equal the plain GROUP BY
    // (count + exact DECIMAL sum are algebraic).
    Q(
      "a5_salted_agg_skew",
      (s, dir) =>
        Skew
          .saltedAgg(
            Tables.lineitem(s, dir),
            keys = Seq("l_returnflag"),
            saltFrom = Seq("l_orderkey", "l_linenumber"),
            nSalts = SaltBuckets,
            sums = Map("sum_qty" -> col("l_quantity").cast("decimal(18,2)"))
          )
          .select(
            col("l_returnflag"),
            col("n_rows"),
            (col("sum_qty") * 100).cast("long").as("sum_qty_cents")
          ),
      Some("""SELECT l_returnflag,
             |       CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_cents
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),

    // ---- T3 consumer dedup, oracle-checked batch-wise: latest archive
    //      row per stream record (reference's correlated MAX subquery,
    //      ETL/XML_Batch_Processing.py:395-397). The archive fixture
    //      derives replays from events (event_id mod N collides ~3
    //      archive rows onto each stream record, archive_id stays the
    //      monotone event_id) — the WHOLE winning row survives, not
    //      just the max id. ----
    Q(
      "t3_archive_latest",
      (s, dir) => {
        val archive = Tables
          .events(s, dir)
          .select(
            (col("event_id") % 3000).as("stream_record_id"),
            col("event_id").as("archive_id"),
            col("event_type").as("payload")
          )
        graft.streaming.ArchiveStream
          .latestPerStreamRecord(archive)
          .select(col("stream_record_id"), col("archive_id"), col("payload"))
      },
      Some("""WITH archive AS (
             |  SELECT event_id % 3000 AS stream_record_id, event_id AS archive_id,
             |         event_type AS payload
             |  FROM events),
             |m AS (SELECT stream_record_id, max(archive_id) AS archive_id
             |      FROM archive GROUP BY 1)
             |SELECT a.stream_record_id, a.archive_id, a.payload
             |FROM archive a JOIN m USING (stream_record_id, archive_id)""".stripMargin)
    ),

    // ---- interval/range join via time-bucket decomposition: per-user
    //      daily activity spans probed by OTHER users' events. A naive
    //      `ts BETWEEN lo AND hi` join has no equi-key and plans as a
    //      nested loop; RangeJoin turns it into a bucket equi-join
    //      (see RangeJoin scaladoc for the cost model). Spans with zero
    //      overlap survive via the left count-join back. ----
    Q(
      "t_interval_join_bucketed",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val spans = ev
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(min(col("ts")).as("span_start"), max(col("ts")).as("span_end"))
        val probes = ev.select(
          col("event_id").as("p_event_id"),
          col("user_id").as("p_user_id"),
          col("ts").as("p_ts")
        )
        graft.operators.RangeJoin
          .bucketedContainJoin(
            spans,
            probes,
            startCol = "span_start",
            endCol = "span_end",
            tsCol = "p_ts",
            bucketSeconds = 3600L,
            extraPred = col("p_user_id") =!= col("user_id"),
            joinType = "left"
          )
          .groupBy(col("user_id"), col("day"), col("span_start"), col("span_end"))
          .agg(count(col("p_event_id")).as("n_other"))
          .select(
            col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day_s"),
            date_format(col("span_start"), "yyyy-MM-dd HH:mm:ss").as("span_start_s"),
            date_format(col("span_end"), "yyyy-MM-dd HH:mm:ss").as("span_end_s"),
            col("n_other")
          )
      },
      Some("""WITH spans AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |         min(ts) AS span_start, max(ts) AS span_end
             |  FROM events GROUP BY 1, 2)
             |SELECT sp.user_id,
             |       strftime(sp.day, '%Y-%m-%d') AS day_s,
             |       strftime(sp.span_start, '%Y-%m-%d %H:%M:%S') AS span_start_s,
             |       strftime(sp.span_end, '%Y-%m-%d %H:%M:%S') AS span_end_s,
             |       CAST(count(e.event_id) AS BIGINT) AS n_other
             |FROM spans sp LEFT JOIN events e
             |  ON e.ts >= sp.span_start AND e.ts <= sp.span_end
             | AND e.user_id <> sp.user_id
             |GROUP BY 1, 2, 3, 4""".stripMargin)
    ),

    // ---- the SAME result as t_interval_join_bucketed, by sweep/prefix
    //      -sum instead of pair enumeration: the count-shaped consumer's
    //      scale path. The bucketed join materializes every (span,
    //      other-user-event) pair before counting — an intermediate
    //      that grows ~100x at 10x event density; the sweep never
    //      builds it (events-in-span = cum(end) - cum(start) via ONE
    //      window over per-day event timestamps, minus the span's own
    //      event count, which the span agg computes for free). NO join
    //      operator in the plan — TemporalOpsSpec pins it — and cost
    //      is O(n log n) regardless of density. Keep the bucketed join
    //      for pair-EMITTING consumers; counts go this way. ----
    Q(
      "t_interval_count_sweep",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val spans = ev
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(
            min(col("ts")).as("span_start"),
            max(col("ts")).as("span_end"),
            count(lit(1)).as("n_own"))
        graft.operators.RangeJoin
          .sweepContainCount(
            spans,
            ev.select(col("ts").as("p_ts")),
            startCol = "span_start",
            endCol = "span_end",
            tsCol = "p_ts",
            keyCols = Seq("user_id", "day", "span_start", "span_end", "n_own"),
            epoch = to_date(_)
          )
          .select(
            col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day_s"),
            date_format(col("span_start"), "yyyy-MM-dd HH:mm:ss").as("span_start_s"),
            date_format(col("span_end"), "yyyy-MM-dd HH:mm:ss").as("span_end_s"),
            (col("n_in_span") - col("n_own")).as("n_other")
          )
      },
      Some("""WITH spans AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |         min(ts) AS span_start, max(ts) AS span_end
             |  FROM events GROUP BY 1, 2)
             |SELECT sp.user_id,
             |       strftime(sp.day, '%Y-%m-%d') AS day_s,
             |       strftime(sp.span_start, '%Y-%m-%d %H:%M:%S') AS span_start_s,
             |       strftime(sp.span_end, '%Y-%m-%d %H:%M:%S') AS span_end_s,
             |       CAST(count(e.event_id) AS BIGINT) AS n_other
             |FROM spans sp LEFT JOIN events e
             |  ON e.ts >= sp.span_start AND e.ts <= sp.span_end
             | AND e.user_id <> sp.user_id
             |GROUP BY 1, 2, 3, 4""".stripMargin)
    ),

    // ---- the sweep count's GENERAL form: weekly activity spans cross
    //      day epochs, so the same-epoch fast path can't apply; the
    //      cross-epoch variant globalizes each boundary's cumulative
    //      count with a per-epoch prefix-offset table (|days| rows,
    //      broadcast onto the 2-per-interval marker rows). Still no
    //      pair space, still one corpus window — the only join in the
    //      plan is the tiny offsets broadcast. ----
    Q(
      "t_interval_count_sweep_weekly",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val spans = ev
          .groupBy(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
          .agg(
            min(col("ts")).as("span_start"),
            max(col("ts")).as("span_end"),
            count(lit(1)).as("n_own"))
        graft.operators.RangeJoin
          .sweepContainCountGlobal(
            spans,
            ev.select(col("ts").as("p_ts")),
            startCol = "span_start",
            endCol = "span_end",
            tsCol = "p_ts",
            keyCols = Seq("user_id", "week", "span_start", "span_end", "n_own"),
            epoch = to_date(_)
          )
          .select(
            col("user_id"),
            date_format(col("week"), "yyyy-MM-dd").as("week_s"),
            date_format(col("span_start"), "yyyy-MM-dd HH:mm:ss").as("span_start_s"),
            date_format(col("span_end"), "yyyy-MM-dd HH:mm:ss").as("span_end_s"),
            (col("n_in_span") - col("n_own")).as("n_other")
          )
      },
      Some("""WITH spans AS (
             |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week,
             |         min(ts) AS span_start, max(ts) AS span_end
             |  FROM events GROUP BY 1, 2)
             |SELECT sp.user_id,
             |       strftime(sp.week, '%Y-%m-%d') AS week_s,
             |       strftime(sp.span_start, '%Y-%m-%d %H:%M:%S') AS span_start_s,
             |       strftime(sp.span_end, '%Y-%m-%d %H:%M:%S') AS span_end_s,
             |       CAST(count(e.event_id) AS BIGINT) AS n_other
             |FROM spans sp LEFT JOIN events e
             |  ON e.ts >= sp.span_start AND e.ts <= sp.span_end
             | AND e.user_id <> sp.user_id
             |GROUP BY 1, 2, 3, 4""".stripMargin)
    ),

    // ---- interval-OVERLAP join (interval x interval — the general
    //      case of the containment join above): which users' daily
    //      activity spans overlapped, and for how long. Naive overlap
    //      has no equi-key (nested loop, quadratic); bucketedOverlapJoin
    //      equi-joins on time buckets and dedups multi-bucket meetings
    //      with the canonical max(starts)-bucket filter — no distinct
    //      pass. 6h buckets make day-wide spans genuinely multi-bucket,
    //      so the gate exercises the dedup filter, not just the join.
    //      Output is aggregated per user (pair space is dense by
    //      construction — most users are active every day). ----
    Q(
      "t_interval_overlap_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        def spans(p: String) = ev
          .groupBy(col("user_id").as(p + "user"), to_date(col("ts")).as(p + "day"))
          .agg(min(col("ts")).as(p + "start"), max(col("ts")).as(p + "end"))
        val pairs = graft.operators.RangeJoin
          .bucketedOverlapJoin(
            spans("l_"),
            spans("r_"),
            lStart = "l_start",
            lEnd = "l_end",
            rStart = "r_start",
            rEnd = "r_end",
            bucketSeconds = 21600L,
            extraPred = col("l_user") < col("r_user")
          )
          .select(
            col("l_user"),
            col("r_user"),
            (least(expr("unix_micros(l_end)"), expr("unix_micros(r_end)")) -
              greatest(expr("unix_micros(l_start)"), expr("unix_micros(r_start)"))).as("ov_us")
          )
        // symmetric per-user totals: each pair contributes to both ends
        pairs
          .select(explode(array(col("l_user"), col("r_user"))).as("user_id"), col("ov_us"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_overlaps"), sum(col("ov_us")).as("sum_overlap_us"))
      },
      Some("""WITH s AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day, min(ts) AS a, max(ts) AS b
             |  FROM events GROUP BY 1, 2),
             |p AS (
             |  SELECT l.user_id AS ua, r.user_id AS ub,
             |         epoch_us(least(l.b, r.b)) - epoch_us(greatest(l.a, r.a)) AS ov
             |  FROM s l JOIN s r
             |    ON l.user_id < r.user_id AND l.a <= r.b AND r.a <= l.b),
             |e AS (SELECT ua AS user_id, ov FROM p UNION ALL SELECT ub, ov FROM p)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_overlaps,
             |       CAST(sum(ov) AS BIGINT) AS sum_overlap_us
             |FROM e GROUP BY user_id""".stripMargin)
    ),

    // ---- the PAIR-BUDGET contract of the overlap join, oracle-gated:
    //      keep only each left interval's top-5 right matches by
    //      overlap duration (ties rStart asc, rEnd asc, r id asc) —
    //      the bounded-output mode a 100 TB consumer of dense pair
    //      spaces must use. Runs as bucketedOverlapTopK: the pair
    //      stream feeds a bounded-buffer hash AGGREGATE, never a
    //      pair-space sort (the window form measured 230 s at sf1; this
    //      41 s — PLANS.md round 9). The fallback-threshold raise rides
    //      an ISOLATED newSession so the live session's conf is never
    //      mutated. The oracle surface aggregates per user: boundary
    //      ties share ov_us by construction, so count+sum are invariant
    //      to which twin is kept. ----
    Q(
      "t_interval_overlap_capped",
      (s0, dir) => {
        // isolated SQLConf (shared context): this aggregator's per-group
        // state is bounded (<= 5 tuples of 4 longs), so the hash map may
        // safely hold every group — the 128-group default fallback is
        // sized for memory-unbounded collect buffers, not this
        val s = s0.newSession()
        s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (4 << 20).toString)
        val ev = Tables.events(s, dir)
        def spans(p: String) = ev
          .groupBy(col("user_id").as(p + "user"), to_date(col("ts")).as(p + "day"))
          .agg(min(col("ts")).as(p + "start"), max(col("ts")).as(p + "end"))
        // ASYMMETRIC `=!=` routing, reinstated in round 11 after the
        // round-10 symmetric rewrite was finally measured at sf1: the
        // canonical l<r enumeration halves only the POST-FILTER pair
        // stream (the bucket join probes the same pre-filter volume
        // either way) and its generate fan-out costs more than the
        // halved arithmetic saves — sym 112 s vs asym 59 s solo at sf1
        // (tools/bench_overlap_ab_r11.json; PLANS.md round-11 section).
        // bucketedOverlapTopKSym stays available and TemporalOpsSpec
        // still pins its result equality with this path.
        graft.operators.RangeJoin
          .bucketedOverlapTopK(
            spans("l_"),
            spans("r_"),
            lStart = "l_start",
            lEnd = "l_end",
            rStart = "r_start",
            rEnd = "r_end",
            bucketSeconds = 21600L,
            k = 5,
            leftKeys = Seq("l_user", "l_day"),
            rIdCol = "r_user",
            extraPred = col("l_user") =!= col("r_user")
          )
          .groupBy(col("l_user"))
          .agg(count(lit(1)).as("n_kept"), sum(col("ov_us")).as("sum_kept_us"))
      },
      Some("""WITH s AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day, min(ts) AS a, max(ts) AS b
             |  FROM events GROUP BY 1, 2),
             |p AS (
             |  SELECT l.user_id AS lu, l.a AS la, l.b AS lb, r.a AS ra, r.b AS rb,
             |         epoch_us(least(l.b, r.b)) - epoch_us(greatest(l.a, r.a)) AS ov
             |  FROM s l JOIN s r
             |    ON l.user_id <> r.user_id AND l.a <= r.b AND r.a <= l.b),
             |k AS (
             |  SELECT lu, ov, row_number() OVER (
             |    PARTITION BY lu, la, lb ORDER BY ov DESC, ra ASC, rb ASC) AS rn
             |  FROM p)
             |SELECT lu AS l_user, CAST(count(*) AS BIGINT) AS n_kept,
             |       CAST(sum(ov) AS BIGINT) AS sum_kept_us
             |FROM k WHERE rn <= 5 GROUP BY 1""".stripMargin)
    ),

    // ---- time-series gap-fill + forward-fill: densify each user's
    //      event stream to an hourly grid (sequence + explode — a
    //      narrow generator, no driver loop) and carry the last
    //      observed value across the gaps with last(_, ignoreNulls)
    //      over an unbounded-preceding frame. Within-hour collapse is
    //      deterministic (arg-max on event_id). Linear: one hourly agg,
    //      one per-user span agg, one grid join, one fill window —
    //      every stage partitions by user/hour, no all-pairs anywhere. ----
    Q(
      "t_gap_fill_hourly",
      (s, dir) => {
        val ev = Tables
          .events(s, dir)
          .select(
            col("user_id"),
            date_trunc("hour", col("ts")).as("hour"),
            col("event_id"),
            (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents")
          )
        val hourly = ev
          .groupBy(col("user_id"), col("hour"))
          .agg(max_by(col("cents"), col("event_id")).as("obs_cents"))
        val grid = ev
          .groupBy(col("user_id"))
          .agg(min(col("hour")).as("h_lo"), max(col("hour")).as("h_hi"))
          .select(
            col("user_id"),
            explode(sequence(col("h_lo"), col("h_hi"), expr("interval 1 hour"))).as("hour")
          )
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(col("hour"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid
          .join(hourly, Seq("user_id", "hour"), "left")
          .select(
            col("user_id"),
            date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour_s"),
            when(col("obs_cents").isNull, 1).otherwise(0).cast("int").as("is_gap"),
            last(col("obs_cents"), ignoreNulls = true).over(w).as("filled_cents")
          )
      },
      Some("""WITH ev AS (
             |  SELECT user_id, date_trunc('hour', ts) AS hour, event_id,
             |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM events),
             |hourly AS (
             |  SELECT user_id, hour, arg_max(cents, event_id) AS obs_cents
             |  FROM ev GROUP BY 1, 2),
             |grid AS (
             |  SELECT user_id, unnest(generate_series(min(hour), max(hour), INTERVAL 1 HOUR)) AS hour
             |  FROM ev GROUP BY user_id)
             |SELECT g.user_id,
             |       strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour_s,
             |       CAST(CASE WHEN h.obs_cents IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap,
             |       last_value(h.obs_cents IGNORE NULLS) OVER (
             |         PARTITION BY g.user_id ORDER BY g.hour
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
             |FROM grid g LEFT JOIN hourly h
             |  ON g.user_id = h.user_id AND g.hour = h.hour""".stripMargin)
    ),

    // ---- rolling-window aggregation over a daily series: the ROWS
    //      frame (last 7 observations) vs the RANGE frame (last 7
    //      calendar days over an epoch-day integer) — they differ
    //      exactly where days are missing, which the fixture has. One
    //      daily-agg shuffle + ONE window shuffle evaluates both
    //      frames (same partition/sort, two frame specs). Sums are
    //      BIGINT cents — exact in both engines. ----
    Q(
      "t_rolling_daily_sum",
      (s, dir) => {
        val daily = Tables
          .orders(s, dir)
          .select(
            col("o_orderpriority").as("prio"),
            datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")).as("day_num"),
            (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents")
          )
          .groupBy(col("prio"), col("day_num"))
          .agg(sum(col("cents")).as("day_cents"), count(lit(1)).as("n_orders"))
        val base = Window.partitionBy(col("prio")).orderBy(col("day_num"))
        val rows7 = base.rowsBetween(-6, Window.currentRow)
        val range7 = base.rangeBetween(-6, Window.currentRow)
        daily.select(
          col("prio"),
          col("day_num").cast("int").as("day_num"),
          col("day_cents"),
          col("n_orders"),
          sum(col("day_cents")).over(rows7).as("rows7_cents"),
          sum(col("day_cents")).over(range7).as("range7_cents"),
          max(col("day_cents")).over(range7).as("range7_max")
        )
      },
      Some("""WITH daily AS (
             |  SELECT o_orderpriority AS prio,
             |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num,
             |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS day_cents,
             |         CAST(count(*) AS BIGINT) AS n_orders
             |  FROM orders GROUP BY 1, 2)
             |SELECT prio, CAST(day_num AS INT) AS day_num, day_cents, n_orders,
             |  CAST(sum(day_cents) OVER (PARTITION BY prio ORDER BY day_num
             |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rows7_cents,
             |  CAST(sum(day_cents) OVER (PARTITION BY prio ORDER BY day_num
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS range7_cents,
             |  max(day_cents) OVER (PARTITION BY prio ORDER BY day_num
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS range7_max
             |FROM daily""".stripMargin)
    ),

    // ---- rolling 7-day distinct users from PER-DAY HLL SKETCHES — the
    //      unbounded-cardinality sibling of t_rolling_distinct_users:
    //      distinct-count does not decompose over sliding windows, but
    //      per-day sketches union — the rolling metric becomes |days|
    //      sketch rows, not |facts|. Estimates are implementation-
    //      defined, so the gate verifies the 10% bound AS DATA against
    //      the oracle's exact rolling counts (the view_incremental_
    //      distinct discipline). ----
    Q(
      "t_rolling_distinct_hll",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("ts"), col("user_id"))
        val est = graft.operators.IncrementalDistinct
          .rollingDistinctEstimates(ev, "ts", "user_id", nDays = 7)
        val exact = ev
          .select(to_date(col("ts")).as("d"), col("user_id"))
          .distinct()
          .withColumn("day", explode(expr("sequence(d, date_add(d, 6))")))
          .groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
        est
          .join(exact, Seq("day"))
          .select(
            date_format(col("day"), "yyyy-MM-dd").as("day_s"),
            col("n_exact"),
            (abs(col("n_distinct_est") - col("n_exact")) * 100 <= col("n_exact") * 10)
              .as("within_10pct")
          )
      },
      Some("""WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
             |cov AS (SELECT user_id, d + CAST(u.off AS INT) AS day
             |        FROM ud, unnest(generate_series(0, 6)) AS u(off)),
             |roll AS (SELECT day, count(DISTINCT user_id) AS n_exact FROM cov GROUP BY 1),
             |present AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
             |SELECT strftime(day, '%Y-%m-%d') AS day_s,
             |       CAST(n_exact AS BIGINT) AS n_exact,
             |       TRUE AS within_10pct
             |FROM roll JOIN present USING (day)""".stripMargin)
    ),

    // ---- EWMA over the last 8 observations per user, EXACT: weights
    //      are powers of two (128, 64, ..., 1 — decay 0.5), numerator
    //      and denominator carried as integers, the average left as
    //      floor((1e6 * num) / den). FP EWMA accumulates rounding
    //      differently per engine/order; the dyadic-weight form is
    //      bit-reproducible anywhere. Eight lag expressions share ONE
    //      window pass (a single WindowExec over the user exchange) —
    //      the partial-window warmup (fewer than 8 priors) adjusts the
    //      denominator instead of emitting NULL. ----
    Q(
      "t_ewma_dyadic",
      (s, dir) => {
        val ev = Tables
          .events(s, dir)
          .select(
            col("event_id"),
            col("user_id"),
            col("ts"),
            (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents")
          )
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        val terms = (0 to 7).map { k =>
          val wgt = 1L << (7 - k)
          val v = if (k == 0) col("cents") else lag(col("cents"), k).over(w)
          (when(v.isNotNull, v * wgt).otherwise(0L), when(v.isNotNull, lit(wgt)).otherwise(0L))
        }
        ev
          .withColumn("num", terms.map(_._1).reduce(_ + _))
          .withColumn("den", terms.map(_._2).reduce(_ + _))
          .select(
            col("event_id"),
            col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
            col("cents"),
            expr("(1000000 * num) div den").as("ewma_micro")
          )
      },
      Some {
        val num = (0 to 7).map { k =>
          val wgt = 1L << (7 - k)
          val v = if (k == 0) "cents" else s"lag(cents, $k) OVER w"
          s"coalesce($v * $wgt, 0)"
        }.mkString(" + ")
        val den = (0 to 7).map { k =>
          val wgt = 1L << (7 - k)
          val v = if (k == 0) "cents" else s"lag(cents, $k) OVER w"
          s"(CASE WHEN $v IS NOT NULL THEN $wgt ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH ev AS (
           |  SELECT event_id, user_id, ts,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           |  FROM events),
           |t AS (
           |  SELECT event_id, user_id, ts, cents,
           |    $num AS num,
           |    $den AS den
           |  FROM ev
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
           |SELECT event_id, user_id,
           |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, cents,
           |  CAST((1000000 * num) // den AS BIGINT) AS ewma_micro
           |FROM t""".stripMargin
      }
    ),

    // ---- ordered funnel (view -> click -> purchase): three chained
    //      per-user unbounded window minima — each stage's timestamp is
    //      the earliest qualifying event STRICTLY AFTER the previous
    //      stage. One user_id exchange feeds all three Window passes
    //      plus the final per-user collapse; no self-joins, no arrays
    //      of per-user events materialized (per-user event counts are
    //      unbounded at 100 TB; window state is O(1) here). ----
    Q(
      "t_funnel_stages",
      (s, dir) => {
        val w  = Window.partitionBy(col("user_id"))
        val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
        ev
          .withColumn("fv", min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn(
            "fc",
            min(when(col("event_type") === "click" && col("ts") > col("fv"), col("ts"))).over(w))
          .withColumn(
            "fp",
            min(when(col("event_type") === "purchase" && col("ts") > col("fc"), col("ts"))).over(w))
          .groupBy(col("user_id"))
          .agg(max(col("fv")).as("fv"), max(col("fc")).as("fc"), max(col("fp")).as("fp"))
          .select(
            col("user_id"),
            date_format(col("fv"), "yyyy-MM-dd HH:mm:ss").as("first_view"),
            date_format(col("fc"), "yyyy-MM-dd HH:mm:ss").as("first_click"),
            date_format(col("fp"), "yyyy-MM-dd HH:mm:ss").as("first_purchase"),
            when(col("fp").isNotNull, 3)
              .when(col("fc").isNotNull, 2)
              .when(col("fv").isNotNull, 1)
              .otherwise(0)
              .cast("int")
              .as("funnel_stage")
          )
      },
      Some("""WITH s1 AS (
             |  SELECT user_id, event_type, ts,
             |    min(CASE WHEN event_type = 'view' THEN ts END)
             |      OVER (PARTITION BY user_id) AS fv
             |  FROM events),
             |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > fv THEN ts END)
             |         OVER (PARTITION BY user_id) AS fc FROM s1),
             |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > fc THEN ts END)
             |         OVER (PARTITION BY user_id) AS fp FROM s2)
             |SELECT user_id,
             |  strftime(max(fv), '%Y-%m-%d %H:%M:%S') AS first_view,
             |  strftime(max(fc), '%Y-%m-%d %H:%M:%S') AS first_click,
             |  strftime(max(fp), '%Y-%m-%d %H:%M:%S') AS first_purchase,
             |  CAST(CASE WHEN max(fp) IS NOT NULL THEN 3
             |            WHEN max(fc) IS NOT NULL THEN 2
             |            WHEN max(fv) IS NOT NULL THEN 1 ELSE 0 END AS INT) AS funnel_stage
             |FROM s3 GROUP BY user_id""".stripMargin)
    ),

    // ---- retention cohorts: users grouped by first-seen day, activity
    //      counted per day offset. The per-user first-seen aggregate is
    //      |users|-sized and broadcasts back onto the raw event scan
    //      (verified plan shape: BroadcastHashJoin over Scan), so the
    //      event stream itself shuffles exactly once — for the final
    //      (cohort, offset) distinct-user count. With a too-big-to-
    //      broadcast user dimension the join falls back to shuffles
    //      already partitioned by user_id on the build side. ----
    Q(
      "t_retention_cohorts",
      (s, dir) => {
        val ev    = Tables.events(s, dir).select(col("user_id"), to_date(col("ts")).as("day"))
        val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
        ev
          .join(first, "user_id")
          .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("offset_days"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .select(
            date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
            col("offset_days").cast("int").as("offset_days"),
            col("active_users")
          )
      },
      Some("""WITH f AS (
             |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1)
             |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
             |  CAST(datediff('day', f.cohort, CAST(e.ts AS DATE)) AS INT) AS offset_days,
             |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
             |FROM events e JOIN f USING (user_id)
             |GROUP BY 1, 2""".stripMargin)
    )
  )
}
