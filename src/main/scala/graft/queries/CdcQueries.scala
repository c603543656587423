package graft.queries

import graft.Tables
import graft.functions.Fingerprint
import graft.operators.{CdcRouter, Scd2}
import graft.sinks.{AuditSink, JdbcScd2Sink, SnapshotSink}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's core CDC/SCD2 algorithm (SURVEY §2.11) exercised
  * end-to-end over the `orders` table.
  *
  * Deterministic scenario (same on both engines):
  *   - "historic" active mart rows: orders with even o_orderkey,
  *     fingerprinted over (status, priority)
  *   - incoming feed: ALL orders, fingerprinted the same way except rows
  *     with o_orderkey % 4 == 0 have priority mutated to 'X'
  * so the router must emit: odd keys -> INSERT, keys % 4 == 0 -> UPDATE,
  * remaining even keys -> DUPLICATE.
  */
object CdcQueries {
  private val LoadTs    = "2024-06-01 00:00:00"
  private val InitialTs = "2024-01-01 00:00:00"
  private val EndOfTime = "2099-12-31 00:00:00"

  // one embedded-Derby database PER INVOCATION of jdbc_scd2_mart, shut
  // down (JdbcScd2Sink.shutdownDb) once its snapshot is materialized —
  // a fresh sub-database keeps reps independent, and the explicit
  // shutdown releases each db's page cache and file handles so a long
  // multi-rep bench holds a bounded Derby footprint instead of one
  // booted-forever db per rep (the workspace dir itself is
  // retention-reaped by TmpWorkspace)
  private val jdbcMartRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  private def historic(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .where(col("o_orderkey") % 2 === 0)
      .select(
        concat(lit("ORD - "), col("o_orderkey").cast("string")).as("hssi"),
        Fingerprint.rowHash(Seq(col("o_orderstatus"), col("o_orderpriority"))).as("hhash")
      )

  private def feed(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .select(
        concat(lit("ORD - "), col("o_orderkey").cast("string")).as("ssi"),
        Fingerprint
          .rowHash(
            Seq(
              col("o_orderstatus"),
              when(col("o_orderkey") % 4 === 0, "X").otherwise(col("o_orderpriority"))
            )
          )
          .as("src_hash")
      )

  /** The post-merge SCD2 mart the merge/time-travel queries share.
    *
    * Scd2.merge consumes its routed side TWICE (the update-key broadcast
    * build and the union append), so the routed pipeline — an
    * orders-wide join + fingerprints — would run once per consumer.
    * The REAL load path (BatchPipeline) already hands merge a
    * materialized delta; these oracle-twin rows mirror that by
    * checkpointing the routed frame once, so the plan evaluates the
    * routed subtree a single time (round 15). EAGER: building the mart
    * runs the routed pipeline immediately.
    */
  private def mergedMart(s: SparkSession, dir: String): DataFrame = {
    val snapshot = historic(s, dir).select(
      col("hssi").as("ssi"),
      col("hhash").as("src_hash"),
      lit(1).as(Scd2.ActiveFlag),
      lit(InitialTs).as(Scd2.StartDate),
      lit(EndOfTime).as(Scd2.EndDate)
    )
    Scd2.merge(
      snapshot,
      routed(s, dir)
        .withColumnRenamed("router_group", CdcRouter.RouterCol)
        .localCheckpoint(),
      key = "ssi",
      loadTs = lit(LoadTs),
      endOfTime = lit(EndOfTime)
    )
  }

  private def routed(s: SparkSession, dir: String): DataFrame =
    CdcRouter
      .route(feed(s, dir), historic(s, dir), "ssi", "src_hash", "hssi", "hhash")
      .select(col("ssi"), col("src_hash"), col(CdcRouter.RouterCol).as("router_group"))

  /** Shared SQL CTE prefix building the same hist/feed/routed frames. */
  private val RoutedSql =
    """WITH hist AS (
      |  SELECT 'ORD - ' || CAST(o_orderkey AS VARCHAR) AS hssi,
      |    md5(concat_ws('||', coalesce(o_orderstatus, 'NULL'), coalesce(o_orderpriority, 'NULL'))) AS hhash
      |  FROM orders WHERE o_orderkey % 2 = 0),
      |feed AS (
      |  SELECT 'ORD - ' || CAST(o_orderkey AS VARCHAR) AS ssi,
      |    md5(concat_ws('||', coalesce(o_orderstatus, 'NULL'),
      |      coalesce(CASE WHEN o_orderkey % 4 = 0 THEN 'X' ELSE o_orderpriority END, 'NULL'))) AS src_hash
      |  FROM orders),
      |routed AS (
      |  SELECT ssi, src_hash,
      |    CASE WHEN hssi IS NULL THEN 'INSERT'
      |         WHEN src_hash = hhash THEN 'DUPLICATE'
      |         ELSE 'UPDATE' END AS router_group
      |  FROM feed LEFT JOIN hist ON ssi = hssi)""".stripMargin

  /** RoutedSql extended with the set-based SCD2 merge, ending in a
    * `merged` CTE — the SQL twin of [[mergedMart]].
    */
  private val MergedSqlCtes =
    s"""$RoutedSql,
       |incoming AS (
       |  SELECT ssi, src_hash, 1 AS active_flag,
       |    '$LoadTs' AS start_date, '$EndOfTime' AS end_date
       |  FROM routed WHERE router_group <> 'DUPLICATE'),
       |upd AS (SELECT DISTINCT ssi FROM routed WHERE router_group = 'UPDATE'),
       |snap AS (
       |  SELECT hssi AS ssi, hhash AS src_hash, 1 AS active_flag,
       |    '$InitialTs' AS start_date, '$EndOfTime' AS end_date FROM hist),
       |closed AS (
       |  SELECT s.ssi, s.src_hash,
       |    CASE WHEN u.ssi IS NOT NULL THEN 0 ELSE s.active_flag END AS active_flag,
       |    s.start_date,
       |    CASE WHEN u.ssi IS NOT NULL THEN '$LoadTs' ELSE s.end_date END AS end_date
       |  FROM snap s LEFT JOIN upd u ON s.ssi = u.ssi AND s.active_flag = 1),
       |merged AS (SELECT * FROM closed UNION ALL SELECT * FROM incoming)""".stripMargin

  val qs: Seq[Q] = Seq(
    // ---- §2.11 steps 1-4: probe + route ----
    Q(
      "cdc_router",
      (s, dir) => routed(s, dir),
      Some(s"$RoutedSql\nSELECT ssi, src_hash, router_group FROM routed")
    ),

    // ---- J1 skew hardening: the same probe-and-route under a 100x hot
    //      business key (half the feed collapses onto one key), routed
    //      through the SALTED join — results must equal plain routing;
    //      CdcSkewSpec pins the equality and the salt spread ----
    Q(
      "cdc_router_skew",
      (s, dir) => {
        val feedSkew = Tables
          .lineitem(s, dir)
          .select(
            when(col("l_orderkey") % 2 === 0, "HOT - 0")
              .otherwise(concat(lit("ORD - "), col("l_orderkey").cast("string")))
              .as("bk"),
            Fingerprint.rowHash(Seq(col("l_orderkey"), col("l_linenumber"))).as("fh")
          )
        val histSkew = Tables
          .orders(s, dir)
          .where(col("o_orderkey") % 3 =!= 0)
          .select(
            concat(lit("ORD - "), col("o_orderkey").cast("string")).as("hk"),
            Fingerprint.rowHash(Seq(col("o_orderkey"), lit(1))).as("hh")
          )
          .unionByName(
            s.range(1)
              .select(
                lit("HOT - 0").as("hk"),
                Fingerprint.rowHash(Seq(lit(0L), lit(1))).as("hh")
              )
          )
        CdcRouter
          .routeSalted(feedSkew, histSkew, "bk", "fh", "hk", "hh", nSalts = 8)
          .groupBy(col(CdcRouter.RouterCol).as("router_group"))
          .agg(count(lit(1)).as("n_rows"), count_distinct(col("bk")).as("n_keys"))
      },
      Some("""WITH hist AS (
             |  SELECT 'ORD - ' || CAST(o_orderkey AS VARCHAR) AS hk,
             |    md5(concat_ws('||', coalesce(CAST(o_orderkey AS VARCHAR), 'NULL'), '1')) AS hh
             |  FROM orders WHERE o_orderkey % 3 != 0
             |  UNION ALL
             |  SELECT 'HOT - 0', md5(concat_ws('||', '0', '1'))),
             |feed AS (
             |  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'HOT - 0'
             |         ELSE 'ORD - ' || CAST(l_orderkey AS VARCHAR) END AS bk,
             |    md5(concat_ws('||', coalesce(CAST(l_orderkey AS VARCHAR), 'NULL'),
             |      coalesce(CAST(l_linenumber AS VARCHAR), 'NULL'))) AS fh
             |  FROM lineitem),
             |routed AS (
             |  SELECT bk, CASE WHEN hk IS NULL THEN 'INSERT'
             |       WHEN fh = hh THEN 'DUPLICATE' ELSE 'UPDATE' END AS router_group
             |  FROM feed LEFT JOIN hist ON bk = hk)
             |SELECT router_group, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(DISTINCT bk) AS BIGINT) AS n_keys
             |FROM routed GROUP BY 1""".stripMargin)
    ),

    // ---- S2/P8: historic snapshot probe — filter + rename projection,
    //      predicates pushed into the scan (replaces the reference's
    //      hand-written SQL, ETL/CSV_Batch_Processing.py:30-45) ----
    Q(
      "s2_snapshot_probe",
      (s, dir) =>
        Tables
          .orders(s, dir)
          .where(col("o_orderkey") % 2 === 0 && col("o_orderstatus") === "F")
          .select(
            col("o_orderkey").as("HISTORIC_CSD_ID"),
            concat(lit("ORD - "), col("o_orderkey").cast("string")).as("HISTORIC_SSI"),
            Fingerprint
              .rowHash(Seq(col("o_orderstatus"), col("o_orderpriority")))
              .as("HISTORIC_HASHKEY")
          ),
      Some("""SELECT o_orderkey AS HISTORIC_CSD_ID,
             |'ORD - ' || CAST(o_orderkey AS VARCHAR) AS HISTORIC_SSI,
             |md5(concat_ws('||', coalesce(o_orderstatus, 'NULL'),
             |  coalesce(o_orderpriority, 'NULL'))) AS HISTORIC_HASHKEY
             |FROM orders WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'F'""".stripMargin)
    ),

    // ---- K1/§2.11 step 5: SCD2 merge -> full post-merge snapshot ----
    Q(
      "scd2_merge_snapshot",
      (s, dir) =>
        mergedMart(s, dir).select(
          col("ssi"),
          col("src_hash"),
          col(Scd2.ActiveFlag).as("active_flag"),
          col(Scd2.StartDate).as("start_date"),
          col(Scd2.EndDate).as("end_date")
        ),
      Some(s"""$MergedSqlCtes
              |SELECT * FROM merged""".stripMargin)
    ),

    // ---- K1 relational: the SAME merge contract through the JDBC sink
    //      (the reference's actual persistence boundary — relational
    //      upsert, ETL/CSV_Batch_Processing.py:306-324). Two increments
    //      against embedded Derby: load 1 seeds the historic snapshot
    //      through the merge path (all-INSERT at InitialTs), load 2
    //      applies the routed feed, so the set-based deactivate-UPDATE
    //      close-out executes against live rows. The table read back
    //      must equal the SAME closed form the parquet snapshot row
    //      (scd2_merge_snapshot) is gated on — one oracle, two sinks. ----
    Q(
      "jdbc_scd2_mart",
      (s, dir) => {
        val ws    = TmpWorkspace.scoped(s, "graft_derby_mart", dir)
        val run   = jdbcMartRuns.incrementAndGet()
        val url   = s"jdbc:derby:$ws/db$run;create=true"
        val table = "CSD_DATA_MART"
        val seed = historic(s, dir).select(
          col("hssi").as("ssi"),
          col("hhash").as("src_hash"),
          lit(CdcRouter.Insert).as(CdcRouter.RouterCol)
        )
        // staging-append parallelism A/B lever (round-14): N connections
        // against the target; on embedded Derby every value serializes
        // on the single-writer page latch (the tier-split proof), on a
        // parallel warehouse it is the scale lever. Validated here so a
        // typo is a named config error.
        val stagingParts = sys.env.get("SPARK_GRAFT_JDBC_STAGING_PARTITIONS") match {
          case None => 0
          case Some(v) =>
            v.toIntOption.filter(_ >= 1).getOrElse(
              throw new IllegalArgumentException(
                s"SPARK_GRAFT_JDBC_STAGING_PARTITIONS must be a positive integer, got '$v'"))
        }
        JdbcScd2Sink.merge(s, url, table, seed, "ssi", InitialTs, EndOfTime,
          stagingPartitions = stagingParts)
        val batch = routed(s, dir).withColumnRenamed("router_group", CdcRouter.RouterCol)
        JdbcScd2Sink.merge(s, url, table, batch, "ssi", LoadTs, EndOfTime,
          stagingPartitions = stagingParts)
        // materialize the mart to parquet BEFORE shutting the db down
        // (the JDBC read is lazy — returning it directly would probe a
        // closed database when the caller consumes the frame), then
        // release Derby's page cache/file handles for this invocation
        val out = s"$ws/snap$run"
        JdbcScd2Sink
          .readSnapshot(s, url, table, batch.drop(CdcRouter.RouterCol).schema)
          .select(
            col("ssi"),
            col("src_hash"),
            col(Scd2.ActiveFlag).cast("int").as("active_flag"),
            col(Scd2.StartDate).as("start_date"),
            col(Scd2.EndDate).as("end_date")
          )
          .write
          .mode("overwrite")
          .parquet(out)
        JdbcScd2Sink.shutdownDb(url)
        s.read.parquet(out)
      },
      Some(s"""$MergedSqlCtes
              |SELECT * FROM merged""".stripMargin)
    ),

    // ---- time travel over the merged SCD2 mart: asOf at the initial
    //      load instant must reconstruct the pre-merge snapshot exactly
    //      (incoming rows start later), and asOf AT the merge instant
    //      must show the half-open boundary — closed rows invisible,
    //      their successors visible. A pure codegen'd scan filter per
    //      probe; no shuffle beyond the merge itself. ----
    Q(
      "scd2_asof_timetravel",
      (s, dir) => {
        import s.implicits._
        // ONE merge pass for all probes: the tiny probe frame broadcast-
        // cross-joins the mart and asOf filters on the probe column — a
        // per-probe Scd2.asOf union would re-run the whole merge pipeline
        // once per probe.
        val probes = Seq(InitialTs, LoadTs).toDF("probe_ts")
        Scd2
          .asOf(mergedMart(s, dir).crossJoin(broadcast(probes)), col("probe_ts"))
          .select(
            col("probe_ts"),
            col("ssi"),
            col("src_hash"),
            col(Scd2.ActiveFlag).as("active_flag"),
            col(Scd2.StartDate).as("start_date"),
            col(Scd2.EndDate).as("end_date")
          )
      },
      Some(s"""$MergedSqlCtes,
              |probes(probe_ts) AS (VALUES ('$InitialTs'), ('$LoadTs'))
              |SELECT p.probe_ts, m.ssi, m.src_hash, m.active_flag, m.start_date, m.end_date
              |FROM merged m, probes p
              |WHERE m.start_date <= p.probe_ts AND p.probe_ts < m.end_date""".stripMargin)
    ),

    // ---- SCD2 change feed: "what changed since my last sync" — every
    //      version OPENed or CLOSEd in (InitialTs, LoadTs], tagged, from
    //      two codegen'd scan filters + union over the merged mart.
    //      Zero shuffle; START_DATE-partitioned lakes prune the open
    //      branch. Open-ended sentinel rows never appear as closes. ----
    Q(
      "scd2_change_feed",
      (s, dir) =>
        Scd2
          .changeFeed(mergedMart(s, dir), lit(InitialTs), lit(LoadTs))
          .select(
            col("change_type"),
            col("ssi"),
            col("src_hash"),
            col(Scd2.ActiveFlag).as("active_flag"),
            col(Scd2.StartDate).as("start_date"),
            col(Scd2.EndDate).as("end_date")
          ),
      Some(s"""$MergedSqlCtes
              |SELECT 'OPEN' AS change_type, ssi, src_hash, active_flag, start_date, end_date
              |FROM merged WHERE start_date > '$InitialTs' AND start_date <= '$LoadTs'
              |UNION ALL
              |SELECT 'CLOSE', ssi, src_hash, active_flag, start_date, end_date
              |FROM merged WHERE end_date > '$InitialTs' AND end_date <= '$LoadTs'""".stripMargin)
    ),

    // ---- K3: per-load audit over the routed batch ----
    Q(
      "k1_audit_counts",
      (s, dir) => {
        val r = CdcRouter.dropDuplicates(
          routed(s, dir).withColumnRenamed("router_group", CdcRouter.RouterCol)
        )
        r.agg(
          count(lit(1)).as("total_upsert_count"),
          sum(when(col(CdcRouter.RouterCol) === CdcRouter.Insert, 1).otherwise(0))
            .cast("long")
            .as("insert_count"),
          sum(when(col(CdcRouter.RouterCol) === CdcRouter.Update, 1).otherwise(0))
            .cast("long")
            .as("update_count")
        )
      },
      Some(s"""$RoutedSql
              |SELECT count(*) AS total_upsert_count,
              |CAST(sum(CASE WHEN router_group = 'INSERT' THEN 1 ELSE 0 END) AS BIGINT) AS insert_count,
              |CAST(sum(CASE WHEN router_group = 'UPDATE' THEN 1 ELSE 0 END) AS BIGINT) AS update_count
              |FROM routed WHERE router_group <> 'DUPLICATE'""".stripMargin)
    ),

    // ---- K3 persisted: CSD_DATA_LOADS twin — two loads append audit
    //      rows (validity derived from the business key), the query reads
    //      the persisted table back (Setup/SQL_DDL_Script.sql:92-104) ----
    Q(
      "k2_audit_persist",
      (s, dir) => {
        val out = TmpWorkspace.scoped(s, "graft_audit", dir)
        val fs  = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(out), true) // fresh, deterministic table

        val batch1 = routed(s, dir)
          .withColumnRenamed("router_group", CdcRouter.RouterCol)
          .withColumn(
            "is_valid",
            (substring(col("ssi"), 7, 18).cast("long") % 10 =!= 3).cast("int")
          )
        val c1 = SnapshotSink.audit(CdcRouter.dropDuplicates(batch1), Some("is_valid"))
        AuditSink.record(s, out, 101L, "dag_csv", "SUCCESS",
          "2024-06-01 00:00:00", "2024-06-01 00:05:00", c1)

        val batch2 = batch1.where(col(CdcRouter.RouterCol) === CdcRouter.Update)
        val c2 = SnapshotSink.audit(batch2, Some("is_valid"))
        AuditSink.record(s, out, 102L, "dag_csv", "SUCCESS",
          "2024-06-02 00:00:00", "2024-06-02 00:04:00", c2)

        AuditSink
          .read(s, out)
          .select(
            col("DATA_LOAD_ID"), col("DAG_ID"), col("LOAD_STATUS"),
            col("LOAD_START_DATE"), col("LOAD_END_DATE"),
            col("TOTAL_UPSERT_COUNT"), col("VALID_COUNT"), col("INVALID_COUNT"),
            col("DATA_VALID_PERMILLE")
          )
      },
      Some(s"""$RoutedSql,
              |v AS (SELECT router_group,
              |  CASE WHEN CAST(substr(ssi, 7) AS BIGINT) % 10 <> 3 THEN 1 ELSE 0 END AS is_valid
              |  FROM routed),
              |l1 AS (SELECT count(*) AS total, CAST(sum(is_valid) AS BIGINT) AS valid
              |  FROM v WHERE router_group <> 'DUPLICATE'),
              |l2 AS (SELECT count(*) AS total, CAST(sum(is_valid) AS BIGINT) AS valid
              |  FROM v WHERE router_group = 'UPDATE')
              |SELECT CAST(101 AS BIGINT) AS DATA_LOAD_ID, 'dag_csv' AS DAG_ID,
              |  'SUCCESS' AS LOAD_STATUS, '2024-06-01 00:00:00' AS LOAD_START_DATE,
              |  '2024-06-01 00:05:00' AS LOAD_END_DATE, total AS TOTAL_UPSERT_COUNT,
              |  valid AS VALID_COUNT, total - valid AS INVALID_COUNT,
              |  valid * 1000 // total AS DATA_VALID_PERMILLE FROM l1
              |UNION ALL
              |SELECT CAST(102 AS BIGINT), 'dag_csv', 'SUCCESS', '2024-06-02 00:00:00',
              |  '2024-06-02 00:04:00', total, valid, total - valid,
              |  valid * 1000 // total FROM l2""".stripMargin)
    )
  )
}
