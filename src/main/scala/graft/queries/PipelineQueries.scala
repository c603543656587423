package graft.queries

import graft.jobs.PipelineE2e

/** The orchestrated end-to-end chain as first-class bench/verify rows.
  *
  * `pipeline_e2e` runs the full three-source operating mode — feed ->
  * conform -> route -> SCD2 -> audit, seed + increment per source — and
  * emits the per-source audit/mart summary. Every count is a closed-form
  * function of the orders keyspace (seed = keys k%5 != 0; increment
  * routes k%7 == 0 as UPDATE, k%5 == 0 as INSERT, rest DUPLICATE), so
  * the oracle states those functions directly in SQL; JobMainSpec pins
  * the same algebra against the live run at sf0.1.
  *
  * `pipeline_csv_mart` is the content-level check the summary can't
  * give: it replays the CSV chain and dumps the ENTIRE post-increment
  * mart, and the oracle reconstructs every row (conform decodes, dim
  * ids, SCD2 versioning with close-out dates) analytically from orders.
  * A bug anywhere in conform/route/merge shifts at least one row's
  * value and fails the multiset hash.
  */
object PipelineQueries {
  val qs: Seq[Q] = Seq(
    Q(
      "pipeline_e2e",
      (s, dir) => {
        // per-application workspace with age-based GC of prior runs
        val work = TmpWorkspace.scoped(s, "graft_e2e", dir)
        PipelineE2e.run(s, dir, work)
      },
      Some("""WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
             |c AS (SELECT
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(*) FILTER (WHERE k % 5 <> 0) AS BIGINT) AS n_seed,
             |  CAST(count(*) FILTER (WHERE k % 7 = 0 AND k % 5 <> 0) AS BIGINT) AS n_upd
             |FROM k)
             |SELECT s.source,
             |  n_seed AS seed_rows,
             |  (n - n_seed) + n_upd AS inc_rows,
             |  (n - n_seed) + n_upd AS inc_valid,
             |  n AS active_rows,
             |  n + n_upd AS mart_rows
             |FROM c, (VALUES ('csv'), ('json'), ('xml')) AS s(source)""".stripMargin)
    ),
    Q(
      "pipeline_csv_mart",
      (s, dir) => {
        val work = TmpWorkspace.scoped(s, "graft_e2e_csv", dir)
        PipelineE2e.runCsvMart(s, dir, work)
      },
      // Analytic replay of the whole chain. Seed (load 1001, ts
      // 2024-01-01) covers keys k%5 != 0 with status variant _v1 on
      // k%7 == 0; increment (load 1002, ts 2024-02-01) mutates k%7 == 0
      // to _v2 (UPDATE: seed row closed at inc ts) and inserts k%5 == 0.
      // Rows with k%5 != 0 and k%7 != 0 are byte-identical duplicates —
      // the seed version stays active and untouched.
      Some("""WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS s, o_orderdate AS d FROM orders),
             |base AS (SELECT k, s,
             |  strftime(d, '%Y-%m-%d') || ' 10:30:00' AS idate,
             |  CAST(10 + k % 3 AS INT) AS agent_id,
             |  CAST(CASE WHEN k % 2 = 0 THEN 21 ELSE 22 END AS INT) AS area_id,
             |  CAST(CASE WHEN k % 2 = 0 THEN 31 ELSE 32 END AS INT) AS ctype_id,
             |  CAST(k % 100 + 1 AS INT) AS handle_time,
             |  CAST(k % 37 AS INT) AS work_time,
             |  CAST(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END AS INT) AS fcr,
             |  'SOL_' || CAST(k % 4 AS VARCHAR) AS sol,
             |  CAST(CASE WHEN k % 3 = 0 THEN 5 WHEN k % 3 = 1 THEN 4 ELSE 2 END AS INT) AS rating
             |FROM o),
             |versions AS (
             |  SELECT k,
             |         CASE WHEN k % 7 = 0 THEN s || '_v1' ELSE s END AS istatus,
             |         CAST(1001 AS BIGINT) AS load_id,
             |         CAST(CASE WHEN k % 7 = 0 THEN 0 ELSE 1 END AS INT) AS active,
             |         '2024-01-01 00:00:00' AS start_date,
             |         CASE WHEN k % 7 = 0 THEN '2024-02-01 00:00:00'
             |              ELSE '2099-12-31 00:00:00' END AS end_date
             |  FROM o WHERE k % 5 <> 0
             |  UNION ALL
             |  SELECT k,
             |         CASE WHEN k % 7 = 0 THEN s || '_v2' ELSE s END,
             |         CAST(1002 AS BIGINT), CAST(1 AS INT),
             |         '2024-02-01 00:00:00', '2099-12-31 00:00:00'
             |  FROM o WHERE k % 5 = 0 OR k % 7 = 0)
             |SELECT
             |  'AT&T - ' || CAST(v.k AS VARCHAR) AS SOURCE_SYSTEM_IDENTIFIER,
             |  b.agent_id AS AGENT_ID,
             |  b.area_id AS SUPPORT_AREA_ID,
             |  b.ctype_id AS CUSTOMER_TYPE_ID,
             |  b.idate AS INTERACTION_DATE,
             |  v.istatus AS INTERACTION_STATUS,
             |  b.s AS QUERY_STATUS,
             |  b.handle_time AS HANDLE_TIME,
             |  b.work_time AS WORK_TIME,
             |  b.fcr AS FIRST_CONTACT_RESOLUTION,
             |  b.sol AS SOLUTION_TYPE,
             |  b.rating AS CUSTOMER_RATING,
             |  CAST(1 AS INT) AS IS_VALID_DATA,
             |  v.load_id AS DATA_LOAD_ID,
             |  v.active AS ACTIVE_FLAG,
             |  v.start_date AS START_DATE,
             |  v.end_date AS END_DATE
             |FROM versions v JOIN base b ON b.k = v.k""".stripMargin)
    ),
    Q(
      // The STREAMING lifecycle oracle-gated end to end (T1/T2/T3/T4 —
      // see StreamingE2e's scaladoc for the feed timeline): poll feed ->
      // watermarked archive -> archive file-stream -> per-increment
      // dedup -> SCD2 mart, with a checkpoint-lost restart in the middle
      // and poison replays the watermark must drop. The oracle states
      // the final mart in closed form over the events keyspace.
      "streaming_mart_e2e",
      (s, dir) => {
        val work = TmpWorkspace.scoped(s, "graft_e2e_stream", dir)
        graft.jobs.StreamingE2e.run(s, dir, work)
      },
      Some("""WITH e AS (SELECT event_id AS k, event_type AS et, user_id AS u FROM events),
             |mx AS (SELECT max(k) // 2 AS thr FROM e),
             |v AS (SELECT k, et, u, k <= (SELECT thr FROM mx) AS lo FROM e),
             |r AS (
             |  SELECT k, et AS status, 0 AS af,
             |         '2024-01-01 00:00:00' AS sd, '2024-02-01 00:00:00' AS ed
             |  FROM v WHERE lo AND k % 9 = 0
             |  UNION ALL
             |  SELECT k, et || '_m', 1, '2024-02-01 00:00:00', '2099-12-31 00:00:00'
             |  FROM v WHERE lo AND k % 9 = 0
             |  UNION ALL
             |  SELECT k, et, 1, '2024-01-01 00:00:00', '2099-12-31 00:00:00'
             |  FROM v WHERE lo AND k % 3 = 0 AND k % 9 <> 0
             |  UNION ALL
             |  SELECT k, et, 1, '2024-02-01 00:00:00', '2099-12-31 00:00:00'
             |  FROM v WHERE lo AND k % 3 <> 0
             |  UNION ALL
             |  SELECT k, et, 0, '2024-03-01 00:00:00', '2024-04-01 00:00:00'
             |  FROM v WHERE NOT lo AND (k % 7 = 0 OR k % 11 = 0)
             |  UNION ALL
             |  SELECT k, CASE WHEN k % 11 = 0 THEN et || '_mm' ELSE et || '_m' END, 1,
             |         '2024-04-01 00:00:00', '2099-12-31 00:00:00'
             |  FROM v WHERE NOT lo AND (k % 7 = 0 OR k % 11 = 0)
             |  UNION ALL
             |  SELECT k, et, 1, '2024-03-01 00:00:00', '2099-12-31 00:00:00'
             |  FROM v WHERE NOT lo AND k % 7 <> 0 AND k % 11 <> 0)
             |SELECT 'XML - ' || CAST(r.k AS VARCHAR) AS SOURCE_SYSTEM_IDENTIFIER,
             |       r.k AS stream_record_id,
             |       r.status,
             |       'u' || CAST(v.u AS VARCHAR) AS note,
             |       md5(concat_ws('||', CAST(r.k AS VARCHAR), r.status,
             |                     'u' || CAST(v.u AS VARCHAR))) AS SOURCE_HASH_KEY,
             |       CAST(1 AS INT) AS IS_VALID_DATA,
             |       CAST(r.af AS INT) AS ACTIVE_FLAG,
             |       r.sd AS START_DATE,
             |       r.ed AS END_DATE
             |FROM r JOIN v ON v.k = r.k""".stripMargin)
    )
  )
}
