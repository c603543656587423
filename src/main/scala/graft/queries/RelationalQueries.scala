package graft.queries

import graft.Tables
import graft.conform.{Decode, Durations, Validity}
import graft.functions.Fingerprint
import graft.operators.{CdcRouter, Dedup, Lookup, Scd2}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One verifiable query per operator family of SURVEY.md §2.
  *
  * Each entry is a Spark DataFrame program plus a semantically identical
  * ANSI-SQL oracle (run by the driver in DuckDB over the same parquet).
  * Engine-portability rules used throughout (see round-1 notes):
  *   - money doubles are cast to DECIMAL(18,2) before arithmetic (exact,
  *     identical in both engines); derived money keeps scale 4;
  *   - final projections NEVER emit DECIMAL (or array) columns: the
  *     driver's cross-engine compare renders Spark-parquet and DuckDB
  *     decimals differently. Money leaves the query as BIGINT scaled
  *     integers (cents for scale 2, 1e-4 units for scale 4) — the
  *     arithmetic stays exact decimal internally, only the output
  *     representation changes;
  *   - integer outputs are explicit BIGINT/INT on both sides;
  *   - timestamps are compared as 'yyyy-MM-dd HH:mm:ss' strings or DATEs;
  *   - never cast double->int (Spark truncates, DuckDB rounds);
  *   - md5 fingerprints follow graft.functions.Fingerprint's canon.
  */
object RelationalQueries {
  private val D2 = "decimal(18,2)"
  private def dec(c: Column): Column = c.cast(D2)

  val qs: Seq[Q] = Seq(
    // ---- S/P: scan + projection + derived columns (SURVEY P1/P3) ----
    Q(
      "p1_project_derive",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.select(
          col("l_orderkey"),
          col("l_linenumber"),
          // exact decimal arithmetic, emitted as BIGINT 1e-4 units (the
          // scale-4 value times 10000 is an exact integer)
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("decimal(18,4)")
            .*(lit(10000))
            .cast("long")
            .as("revenue_e4"),
          to_date(col("l_shipdate")).as("ship_date")
        )
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS revenue_e4,
             |CAST(l_shipdate AS DATE) AS ship_date FROM lineitem""".stripMargin)
    ),

    // ---- P5/P7: filters, inequality + null predicates ----
    Q(
      "p5_filter_predicates",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.where(
          col("l_returnflag") =!= "N" &&
            col("l_quantity") >= 30 &&
            to_date(col("l_shipdate")) < lit("1997-01-01")
        ).select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_returnflag <> 'N' AND l_quantity >= 30
             |AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'""".stripMargin)
    ),

    // ---- A4: grouped aggregation (pricing-summary style) ----
    Q(
      "a4_agg_pricing_summary",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.where(to_date(col("l_shipdate")) <= lit("2000-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            // exact decimal sums, emitted as BIGINT cents / 1e-4 units
            sum(dec(col("l_quantity"))).cast(D2).*(lit(100)).cast("long").as("sum_qty_c"),
            sum(dec(col("l_extendedprice"))).cast(D2).*(lit(100)).cast("long").as("sum_base_price_c"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("decimal(28,4)")
              .*(lit(10000))
              .cast("long")
              .as("sum_disc_price_e4"),
            count(lit(1)).as("count_order")
          )
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS sum_qty_c,
             |CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS sum_base_price_c,
             |CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) * 10000 AS BIGINT) AS sum_disc_price_e4,
             |count(*) AS count_order
             |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // ---- J1: left outer equi-join probe with null misses (CDC probe shape) ----
    Q(
      "j1_left_join_probe",
      (s, dir) => {
        val probe = Tables
          .customer(s, dir)
          .where(col("c_custkey") % 10 =!= 0)
          .select(col("c_custkey"), col("c_name"))
        Tables
          .orders(s, dir)
          .join(probe, col("o_custkey") === col("c_custkey"), "left")
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            col("c_name"),
            when(col("c_custkey").isNull, 1).otherwise(0).as("is_miss")
          )
      },
      Some("""WITH probe AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 10 <> 0)
             |SELECT o_orderkey, o_custkey, c_name,
             |CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END AS is_miss
             |FROM orders LEFT JOIN probe ON o_custkey = c_custkey""".stripMargin)
    ),

    // ---- J2/S6: broadcast dimension-lookup enrichment ----
    Q(
      "j2_broadcast_dim_enrich",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val enriched = Lookup.enrich(
          Lookup.enrich(li, Tables.part(s, dir), "l_partkey", "p_partkey", "p_brand", "brand"),
          Tables.supplier(s, dir),
          "l_suppkey",
          "s_suppkey",
          "s_name",
          "supp_name"
        )
        enriched.select(col("l_orderkey"), col("l_linenumber"), col("brand"), col("supp_name"))
      },
      Some("""SELECT l_orderkey, l_linenumber, p_brand AS brand, s_name AS supp_name
             |FROM lineitem
             |LEFT JOIN part ON l_partkey = p_partkey
             |LEFT JOIN supplier ON l_suppkey = s_suppkey""".stripMargin)
    ),

    // ---- W1/P4/P6: window dedup, latest-wins with deterministic tiebreak ----
    Q(
      "w1_window_dedup_latest",
      (s, dir) => {
        val latest = Dedup.latestPerKey(
          Tables.orders(s, dir),
          keys = Seq("o_custkey"),
          tiebreak = Seq(col("o_orderdate").desc, col("o_orderkey").desc)
        )
        latest.select(
          col("o_custkey"),
          col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_date")
        )
      },
      Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date FROM (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders) t WHERE rn = 1""".stripMargin)
    ),

    // ---- A2/J3/T3: latest version per key (max-join formulation) ----
    Q(
      "a2_latest_per_key",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        Dedup
          .latestByVersion(ev, "user_id", "event_id")
          .select(col("user_id"), col("event_id"), col("event_type"))
      },
      Some("""WITH m AS (SELECT user_id, max(event_id) AS event_id FROM events GROUP BY user_id)
             |SELECT e.user_id, e.event_id, e.event_type
             |FROM events e JOIN m USING (user_id, event_id)""".stripMargin)
    ),

    // ---- A1: scalar max (watermark recovery) ----
    Q(
      "a1_max_watermark",
      (s, dir) =>
        Tables
          .events(s, dir)
          .agg(max(col("event_id")).as("max_id"), count(lit(1)).as("n")),
      Some("SELECT max(event_id) AS max_id, count(*) AS n FROM events")
    ),

    // ---- A3: distinct ----
    Q(
      "a3_distinct",
      (s, dir) =>
        Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")
    ),

    // ---- O1/O2: global sort + top-k ----
    Q(
      "o2_topk_orders",
      (s, dir) =>
        Tables
          .orders(s, dir)
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select(col("o_orderkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)
    ),

    // ---- O1: global sort (order itself is exercised by o2's limit;
    //      the hash compare is order-insensitive, so this verifies the
    //      sorted projection's content and that the sort plan executes) ----
    Q(
      "o1_global_sort",
      (s, dir) =>
        Tables
          .supplier(s, dir)
          .orderBy(col("s_nationkey").asc, col("s_suppkey").desc)
          .select(col("s_suppkey"), col("s_nationkey"), col("s_name")),
      Some("SELECT s_suppkey, s_nationkey, s_name FROM supplier")
    ),

    // ---- F6: CASE decode chains (rating / yes-no / rescale) ----
    Q(
      "f6_case_decodes",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val rating = when(col("event_type") === "error", "WORST")
          .when(col("event_type") === "click", "NEUTRAL")
          .when(col("event_type") === "view", "GOOD")
          .when(col("event_type") === "signup", "BEST")
          .otherwise("BAD")
        ev.select(
          col("event_id"),
          Decode.rating5(rating).as("rating_code"),
          Decode.yesNo(when(col("value") >= 50, "yes").otherwise("NO")).as("hi_value"),
          Decode.trueFalse(when(col("event_type") === "error", "true").otherwise("FALSE")).as("is_err"),
          Decode.rescale10to5((col("event_id") % 10 + 1).cast("int")).as("rescaled")
        )
      },
      Some("""SELECT event_id,
             |CASE CASE event_type WHEN 'error' THEN 'WORST' WHEN 'click' THEN 'NEUTRAL'
             |     WHEN 'view' THEN 'GOOD' WHEN 'signup' THEN 'BEST' ELSE 'BAD' END
             |  WHEN 'WORST' THEN 1 WHEN 'BAD' THEN 2 WHEN 'NEUTRAL' THEN 3
             |  WHEN 'GOOD' THEN 4 WHEN 'BEST' THEN 5 END AS rating_code,
             |CASE upper(CASE WHEN value >= 50 THEN 'yes' ELSE 'NO' END)
             |  WHEN 'YES' THEN 1 WHEN 'NO' THEN 0 END AS hi_value,
             |CASE upper(CASE WHEN event_type = 'error' THEN 'true' ELSE 'FALSE' END)
             |  WHEN 'TRUE' THEN 1 WHEN 'FALSE' THEN 0 END AS is_err,
             |CAST(floor(CAST((event_id % 10 + 1) AS INT) / 2) AS INT) AS rescaled
             |FROM events""".stripMargin)
    ),

    // ---- F7/F13: the three source timestamp formats, round-tripped ----
    Q(
      "f7_timestamp_formats",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val csvStr  = date_format(col("ts"), "MMddyyyyHHmmss")
        val jsonStr = date_format(col("ts"), "dd/MM/yyyy HH:mm:ss")
        val xmlStr  = date_format(col("ts"), "yyyyMMddHHmmss")
        ev.select(
          col("event_id"),
          date_format(to_timestamp(csvStr, "MMddyyyyHHmmss"), "yyyy-MM-dd HH:mm:ss").as("from_csv_fmt"),
          date_format(to_timestamp(jsonStr, "dd/MM/yyyy HH:mm:ss"), "yyyy-MM-dd HH:mm:ss").as("from_json_fmt"),
          date_format(to_timestamp(xmlStr, "yyyyMMddHHmmss"), "yyyy-MM-dd HH:mm:ss").as("from_xml_fmt")
        )
      },
      Some("""SELECT event_id,
             |strftime(strptime(strftime(ts, '%m%d%Y%H%M%S'), '%m%d%Y%H%M%S'), '%Y-%m-%d %H:%M:%S') AS from_csv_fmt,
             |strftime(strptime(strftime(ts, '%d/%m/%Y %H:%M:%S'), '%d/%m/%Y %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS from_json_fmt,
             |strftime(strptime(strftime(ts, '%Y%m%d%H%M%S'), '%Y%m%d%H%M%S'), '%Y-%m-%d %H:%M:%S') AS from_xml_fmt
             |FROM events""".stripMargin)
    ),

    // ---- U1: duration "H:MM:SS" -> seconds via built-ins (round-trip) ----
    Q(
      "u1_duration_parse",
      (s, dir) => {
        val ev   = Tables.events(s, dir)
        val secs = (col("event_id") * 37) % 86400
        val dur  = Durations.secondsToHms(secs)
        ev.select(
          col("event_id"),
          secs.as("secs"),
          dur.as("dur"),
          Durations.hmsToSeconds(dur).as("parsed_secs")
        )
      },
      Some("""WITH t AS (SELECT event_id, (event_id * 37) % 86400 AS secs FROM events),
             |d AS (SELECT event_id, secs,
             |  CAST(secs // 3600 AS VARCHAR) || ':' ||
             |  lpad(CAST((secs % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
             |  lpad(CAST(secs % 60 AS VARCHAR), 2, '0') AS dur FROM t)
             |SELECT event_id, secs, dur,
             |  CAST(split_part(dur, ':', 1) AS INT) * 3600 +
             |  CAST(split_part(dur, ':', 2) AS INT) * 60 +
             |  CAST(split_part(dur, ':', 3) AS INT) AS parsed_secs FROM d""".stripMargin)
    ),

    // ---- P2: nested/JSON flatten ----
    Q(
      "p2_json_flatten",
      (s, dir) =>
        Tables
          .events(s, dir)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k")
          ),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events""")
    ),

    // ---- F1-F3: row fingerprint canon ----
    Q(
      "f1_row_fingerprint",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.select(
          col("doc_id"),
          Fingerprint
            .rowHash(Seq(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars")))
            .as("row_hash")
        )
      },
      Some("""SELECT doc_id, md5(concat_ws('||',
             |coalesce(CAST(doc_id AS VARCHAR), 'NULL'), coalesce(text, 'NULL'),
             |coalesce(lang, 'NULL'), coalesce(source, 'NULL'),
             |coalesce(CAST(n_chars AS VARCHAR), 'NULL'))) AS row_hash FROM documents""".stripMargin)
    ),

    // ---- F6/K3: validity flagging + audit counts ----
    Q(
      "k3_validity_audit",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        // inject nulls deterministically (the corpus has none), then flag
        val flagged = d.select(
          Validity
            .flag(Seq(nullif(col("lang"), lit("fr")), nullif(col("source"), lit("src3"))))
            .as("is_valid")
        )
        flagged.agg(
          count(lit(1)).as("total"),
          sum(col("is_valid")).cast("long").as("valid"),
          (count(lit(1)) - sum(col("is_valid"))).cast("long").as("invalid")
        )
      },
      Some("""WITH v AS (SELECT CASE WHEN nullif(lang, 'fr') IS NULL
             |  OR nullif(source, 'src3') IS NULL THEN 0 ELSE 1 END AS is_valid FROM documents)
             |SELECT count(*) AS total, CAST(sum(is_valid) AS BIGINT) AS valid,
             |CAST(count(*) - sum(is_valid) AS BIGINT) AS invalid FROM v""".stripMargin)
    ),

    // ---- §2.7: union of per-source conformed feeds ----
    Q(
      "set_union_sources",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        def feed(sid: Int, prefix: String, status: String): DataFrame =
          o.where(col("o_orderstatus") === status)
            .select(
              lit(sid).as("source_id"),
              concat(lit(prefix), col("o_orderkey").cast("string")).as("ssi"),
              col("o_orderstatus").as("status")
            )
        feed(1, "ORD - ", "F")
          .unionByName(feed(2, "AMZ - ", "O"))
          .unionByName(feed(3, "UBR - ", "P"))
      },
      Some("""SELECT 1 AS source_id, 'ORD - ' || CAST(o_orderkey AS VARCHAR) AS ssi, o_orderstatus AS status FROM orders WHERE o_orderstatus = 'F'
             |UNION ALL
             |SELECT 2, 'AMZ - ' || CAST(o_orderkey AS VARCHAR), o_orderstatus FROM orders WHERE o_orderstatus = 'O'
             |UNION ALL
             |SELECT 3, 'UBR - ' || CAST(o_orderkey AS VARCHAR), o_orderstatus FROM orders WHERE o_orderstatus = 'P'""".stripMargin)
    ),

    // ---- T-window: event-time tumbling aggregation (batch-equivalent) ----
    Q(
      "t_event_hourly_window",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"))
          .agg(
            count(lit(1)).as("n"),
            sum(dec(col("value"))).cast(D2).*(lit(100)).cast("long").as("sum_value_c")
          ),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
             |count(*) AS n,
             |CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS sum_value_c
             |FROM events GROUP BY 1""".stripMargin)
    ),

    // ---- incrementally maintained aggregate view: two append loads
    //      refresh a stored per-status rollup by merging ALGEBRAIC
    //      aggregates (count +, sum +, min/max least/greatest) — the
    //      fact history is never rescanned, view side is group-sized.
    //      The ORACLE aggregates the full table directly, so the gate
    //      proves incremental == direct exactly (prices in integer
    //      cents — no FP accumulation-order term). ----
    Q(
      "view_incremental_rollup",
      (s, dir) => {
        val orders = Tables
          .orders(s, dir)
          .select(
            col("o_orderkey"),
            col("o_orderstatus"),
            round(col("o_totalprice") * 100).cast("long").as("price_c")
          )
        val path = TmpWorkspace.scoped(s, "graft_incview", dir) + "/rollup"
        val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true) // fresh per run
        val g = Seq("o_orderstatus")
        val v = Seq("price_c")
        graft.operators.IncrementalAgg
          .refresh(s, path, orders.where(col("o_orderkey") % 3 =!= 0).drop("o_orderkey"), g, v)
        graft.operators.IncrementalAgg
          .refresh(s, path, orders.where(col("o_orderkey") % 3 === 0).drop("o_orderkey"), g, v)
      },
      Some("""SELECT o_orderstatus,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
             |  CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_price_c,
             |  CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_price_c
             |FROM orders GROUP BY 1""".stripMargin)
    ),

    // ---- incrementally maintained DISTINCT-count view (sketch-backed:
    //      distinct is not algebraic, so the stored state is a per-group
    //      HLL sketch; unions merge register-wise and are IDEMPOTENT —
    //      load 2 deliberately re-sends a slice of load 1 to prove
    //      replays don't inflate, which count/sum maintenance cannot
    //      survive). Estimates are deterministic but implementation-
    //      defined, so the gate verifies the ERROR BOUND as data: a
    //      per-group within-10% flag (≈6 sigma at lgK 12) the oracle
    //      computes from exact counts — any estimate drifting past the
    //      bound, or any group lost by the merge, hash-mismatches. ----
    Q(
      "view_incremental_distinct",
      (s, dir) => {
        val li = Tables
          .lineitem(s, dir)
          .select(col("l_orderkey"), col("l_returnflag"), col("l_partkey"))
        val path = TmpWorkspace.scoped(s, "graft_incdistinct", dir) + "/sketches"
        val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true) // fresh per run
        val g = Seq("l_returnflag")
        graft.operators.IncrementalDistinct
          .refresh(s, path, li.where(col("l_orderkey") % 3 =!= 0), g, "l_partkey")
        val view = graft.operators.IncrementalDistinct
          .refresh(
            s,
            path,
            // the %5 slice overlaps load 1: an at-least-once replay
            li.where(col("l_orderkey") % 3 === 0 || col("l_orderkey") % 5 === 0),
            g,
            "l_partkey"
          )
        val est = graft.operators.IncrementalDistinct.estimates(view, g)
        val exact = li
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_exact"))
        est
          .join(exact, g)
          .select(
            col("l_returnflag"),
            col("n_exact").cast("long").as("n_exact"),
            (abs(col("n_distinct_est") - col("n_exact")) * 100 <= col("n_exact") * 10)
              .as("within_10pct")
          )
      },
      Some("""SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
             |TRUE AS within_10pct FROM lineitem GROUP BY 1""".stripMargin)
    ),

    // ---- DQ: order-free multiset content digest per group — the
    //      replica-diff primitive ("is this copy of the mart the
    //      same?"). Sum (mod 2^60) of 60-bit row-fingerprint hashes:
    //      commutative/associative -> partial-agg map-side, no sort;
    //      sum not xor so duplicate rows accumulate. Exact decimal
    //      accumulation then mod keeps engine overflow semantics out
    //      of the result. Integer-only value columns so the canonical
    //      CAST-to-string agrees across engines. ----
    Q(
      "dq_content_digest",
      (s, dir) =>
        graft.operators.Integrity.contentDigest(
          Tables.lineitem(s, dir),
          groupCols = Seq(col("l_returnflag")),
          valueCols = Seq(
            col("l_orderkey"),
            col("l_partkey"),
            col("l_suppkey"),
            col("l_linenumber"),
            col("l_returnflag"),
            col("l_linestatus")
          )
        ),
      Some(s"""SELECT l_returnflag,
              |  CAST(count(*) AS BIGINT) AS n_rows,
              |  CAST(sum(CAST('0x' || substr(md5(concat_ws('||',
              |      coalesce(CAST(l_orderkey AS VARCHAR), 'NULL'),
              |      coalesce(CAST(l_partkey AS VARCHAR), 'NULL'),
              |      coalesce(CAST(l_suppkey AS VARCHAR), 'NULL'),
              |      coalesce(CAST(l_linenumber AS VARCHAR), 'NULL'),
              |      coalesce(l_returnflag, 'NULL'),
              |      coalesce(l_linestatus, 'NULL'))), 1, 15) AS BIGINT))
              |    % ${graft.operators.Integrity.DigestMod} AS BIGINT) AS digest
              |FROM lineitem GROUP BY 1""".stripMargin)
    ),

    // ---- DQ: one-pass column profiling (null rate / distinct / bounds)
    //      — the audit stage before trusting a feed ----
    Q(
      "dq_profile_columns",
      (s, dir) =>
        graft.operators.Profile.profileColumns(
          Tables.orders(s, dir),
          Seq("o_custkey", "o_orderstatus", "o_orderpriority")
        ),
      Some {
        val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority")
        cols
          .map(c => s"""SELECT '$c' AS "column",
             |CAST(count(*) AS BIGINT) AS n_rows,
             |CAST(count(*) - count($c) AS BIGINT) AS n_null,
             |CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |CAST(min($c) AS VARCHAR) AS min_val,
             |CAST(max($c) AS VARCHAR) AS max_val
             |FROM orders""".stripMargin)
          .mkString("\nUNION ALL\n")
      }
    ),

    // ---- DQ: exact grouped quartiles (distribution profiling beyond
    //      bounds). percentile() sorts within each group — fine for
    //      bounded groups; at 100 TB unbounded-cardinality profiling
    //      switches to approx_percentile, which has no cross-engine
    //      oracle. Micro-grid output: the linear-interpolation step is
    //      the one float op that may differ in the last ulp. ----
    Q(
      "dq_quantiles",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            percentile(col("l_quantity"), lit(0.25)).as("__q1"),
            percentile(col("l_quantity"), lit(0.5)).as("__q2"),
            percentile(col("l_quantity"), lit(0.75)).as("__q3")
          )
          .select(
            col("l_returnflag"),
            round(col("__q1") * 1e6).cast("long").as("q1_micro"),
            round(col("__q2") * 1e6).cast("long").as("q2_micro"),
            round(col("__q3") * 1e6).cast("long").as("q3_micro")
          ),
      Some("""SELECT l_returnflag,
             |CAST(round(quantile_cont(l_quantity, 0.25) * 1000000) AS BIGINT) AS q1_micro,
             |CAST(round(quantile_cont(l_quantity, 0.5) * 1000000) AS BIGINT) AS q2_micro,
             |CAST(round(quantile_cont(l_quantity, 0.75) * 1000000) AS BIGINT) AS q3_micro
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),

    // ---- DQ: referential integrity via LEFT ANTI join — lineitems whose
    //      order is missing from a (deliberately filtered) parent set ----
    Q(
      "dq_orphan_lineitems",
      (s, dir) => {
        val parents = Tables.orders(s, dir).where(col("o_orderkey") % 7 =!= 0)
        Tables
          .lineitem(s, dir)
          .join(parents, col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_orphan"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_orphan FROM lineitem l
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_orderkey % 7 != 0 AND o.o_orderkey = l.l_orderkey)""".stripMargin)
    ),

    // ---- write-time layout: Z-order curve statistics. Each z-bucket of
    //      4^6 cells is an ALIGNED 64x64 tile of the (part, supp) grid —
    //      the exact property that makes per-file min/max stats prune on
    //      EITHER dimension after clustering files by z (plain sort only
    //      prunes its leading column). Both dims' spans per bucket come
    //      out <= 63, and the oracle recomputes the same interleave from
    //      the same generated expression. ----
    Q(
      "layout_zorder_stats",
      (s, dir) => {
        import graft.functions.ZOrder
        Tables
          .lineitem(s, dir)
          .select(
            (col("l_partkey") % 1024).cast("int").as("px"),
            (col("l_suppkey") % 1024).cast("int").as("py")
          )
          .withColumn("z", ZOrder.zValue(col("px"), col("py"), bits = 10))
          .groupBy(expr("z div 4096").as("zbucket"))
          .agg(
            count(lit(1)).as("n"),
            min(col("px")).as("x_lo"),
            max(col("px")).as("x_hi"),
            min(col("py")).as("y_lo"),
            max(col("py")).as("y_hi")
          )
      },
      Some {
        val z = graft.functions.ZOrder.zValueSql("px", "py", bits = 10)
        s"""WITH pts AS (
           |  SELECT CAST(l_partkey % 1024 AS INT) AS px,
           |         CAST(l_suppkey % 1024 AS INT) AS py
           |  FROM lineitem),
           |zs AS (SELECT px, py, $z AS z FROM pts)
           |SELECT z // 4096 AS zbucket,
           |       CAST(count(*) AS BIGINT) AS n,
           |       min(px) AS x_lo, max(px) AS x_hi,
           |       min(py) AS y_lo, max(py) AS y_hi
           |FROM zs GROUP BY 1""".stripMargin
      }
    ),

    // ---- directory-level layout: Hive-partitioned lake round-trip with
    //      an idempotent dynamic-partition-overwrite re-run. The corpus
    //      lands partitioned by lang, one increment (lang='en') is then
    //      RE-written via dynamic overwrite — replacing exactly that
    //      directory, proving increment re-runs cannot clobber siblings —
    //      and the readback filter prunes to the two named partitions at
    //      planning time (PartitionFilters, pinned in PartitionedLakeSpec;
    //      row data of other langs is never opened). ----
    Q(
      "layout_partition_prune",
      (s, dir) => {
        import graft.sinks.PartitionedLake
        val lake = TmpWorkspace.scoped(s, "graft_lake", dir)
        val docs = Tables.documents(s, dir)
        PartitionedLake.write(docs, lake, Seq("lang"))
        // idempotent increment re-run: dynamic overwrite of ONE partition
        // with the same increment must leave the table's answer unchanged
        PartitionedLake.overwritePartitions(
          docs.where(col("lang") === "en"),
          lake,
          Seq("lang")
        )
        PartitionedLake
          .read(s, lake)
          .where(col("lang").isin("en", "zh"))
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      },
      Some("""SELECT lang, source,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents WHERE lang IN ('en', 'zh') GROUP BY 1, 2""".stripMargin)
    ),

    // ---- lake lifecycle: schema evolution + mutating partition
    //      overwrite. The 'en' partition is REPLACED by an increment
    //      that both filters rows and ADDS a column (quality); a
    //      mergeSchema read unions the file schemas, nulling the new
    //      column for untouched partitions. Pins the two lake behaviors
    //      an incremental 100 TB corpus lives by: dynamic overwrite
    //      replaces exactly the carried partitions, and late-added
    //      columns never force a table rewrite. ----
    Q(
      "lake_evolve_overwrite",
      (s, dir) => {
        import graft.sinks.PartitionedLake
        val lake = TmpWorkspace.scoped(s, "graft_lake_evolve", dir)
        val docs = Tables.documents(s, dir).select(
          col("doc_id"), col("lang"), col("source"), col("n_chars"))
        PartitionedLake.write(docs, lake, Seq("lang"))
        PartitionedLake.overwritePartitions(
          docs
            .where(col("lang") === "en" && col("doc_id") % 2 === 0)
            .withColumn("quality", col("n_chars") % 7),
          lake,
          Seq("lang")
        )
        PartitionedLake
          .readMerged(s, lake)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            count(col("quality")).as("n_quality"),
            coalesce(sum(col("quality")), lit(0L)).as("sum_quality")
          )
      },
      Some("""WITH lake AS (
             |  SELECT doc_id, lang, n_chars, CAST(n_chars % 7 AS BIGINT) AS quality
             |  FROM documents WHERE lang = 'en' AND doc_id % 2 = 0
             |  UNION ALL
             |  SELECT doc_id, lang, n_chars, NULL
             |  FROM documents WHERE lang <> 'en')
             |SELECT lang,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |       CAST(count(quality) AS BIGINT) AS n_quality,
             |       CAST(coalesce(sum(quality), 0) AS BIGINT) AS sum_quality
             |FROM lake GROUP BY 1""".stripMargin)
    ),

    // ---- multi-level aggregation: ROLLUP over (returnflag, linestatus).
    //      One Expand + one aggregation shuffle computes all three
    //      grouping levels; grouping_id disambiguates subtotal NULLs
    //      (both engines use the standard leftmost-column-MSB bitmask). ----
    Q(
      "a6_rollup_pricing",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .select(
            col("l_returnflag"),
            col("l_linestatus"),
            col("l_quantity").cast("decimal(18,2)").as("qty")
          )
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping_id().cast("int").as("gid"),
            count(lit(1)).as("n"),
            (sum(col("qty")) * 100).cast("long").as("sum_qty_cents")
          ),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_cents
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)
    ),

    // ---- pivot: order counts + totals spread across status columns.
    //      A fixed value list keeps the schema static; the oracle is the
    //      equivalent conditional aggregation. ----
    Q(
      "a7_pivot_status",
      (s, dir) =>
        Tables
          .orders(s, dir)
          .select(
            col("o_orderpriority"),
            col("o_orderstatus"),
            (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents")
          )
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("O", "F", "P"))
          .agg(sum(col("cents")))
          .select(
            col("o_orderpriority"),
            col("O").as("cents_o"),
            col("F").as("cents_f"),
            col("P").as("cents_p")
          ),
      Some("""SELECT o_orderpriority,
             |  CAST(sum(CASE WHEN o_orderstatus = 'O'
             |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS BIGINT) AS cents_o,
             |  CAST(sum(CASE WHEN o_orderstatus = 'F'
             |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS BIGINT) AS cents_f,
             |  CAST(sum(CASE WHEN o_orderstatus = 'P'
             |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS BIGINT) AS cents_p
             |FROM orders GROUP BY 1""".stripMargin)
    ),

    // ---- top-k per group via an ALGEBRAIC typed Aggregator: the
    //      scale-path alternative to the window idiom (o2/curation_topk).
    //      Partial aggregation reduces each map task to <= k rows per
    //      group before the shuffle — only k-row buffers cross the wire,
    //      where the window shuffles every row into a per-group sort.
    //      Total (value DESC, id ASC) order makes the result identical
    //      to the window oracle. ----
    Q(
      "o2_topk_grouped_agg",
      (s, dir) =>
        graft.operators.TopK
          .perGroup(
            Tables
              .orders(s, dir)
              .select(
                col("o_custkey"),
                (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("price_cents"),
                col("o_orderkey")
              ),
            groupCols = Seq("o_custkey"),
            valueCol = col("price_cents"),
            idCol = col("o_orderkey"),
            k = 3
          )
          .select(
            col("o_custkey"),
            col("rnk"),
            col("value").as("price_cents"),
            col("id").as("o_orderkey")
          ),
      Some("""WITH cents AS (
             |  SELECT o_custkey, o_orderkey,
             |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
             |  FROM orders),
             |ranked AS (
             |  SELECT o_custkey, price_cents, o_orderkey,
             |         CAST(row_number() OVER (PARTITION BY o_custkey
             |           ORDER BY price_cents DESC, o_orderkey ASC) AS INT) AS rnk
             |  FROM cents)
             |SELECT o_custkey, rnk, price_cents, o_orderkey
             |FROM ranked WHERE rnk <= 3""".stripMargin)
    ),

    // ---- DQ: log2-bucketed document-length histogram (the first-look
    //      distribution profile of any text corpus). The bucket
    //      expression is a chain of integer comparisons generated ONCE
    //      and evaluated verbatim by both engines — no floating log. ----
    Q(
      "dq_length_histogram",
      (s, dir) =>
        graft.operators.Profile
          .log2Histogram(Tables.documents(s, dir).select(col("n_chars")), "n_chars"),
      Some {
        val bucket = graft.operators.Profile.log2BucketSql("n_chars")
        s"""SELECT CAST($bucket AS INT) AS bucket,
           |       CAST(count(*) AS BIGINT) AS n,
           |       min(n_chars) AS lo, max(n_chars) AS hi
           |FROM documents GROUP BY 1""".stripMargin
      }
    ),

    // ---- full-lattice aggregation: CUBE over (priority, status) — all
    //      four grouping levels from one Expand + one partial-agg'd
    //      shuffle (4x the input rows into the exchange, not 4 passes
    //      over the table). grouping_id disambiguates subtotal NULLs. ----
    Q(
      "a8_cube_status",
      (s, dir) =>
        Tables
          .orders(s, dir)
          .select(
            col("o_orderpriority"),
            col("o_orderstatus"),
            (dec(col("o_totalprice")) * 100).cast("long").as("cents")
          )
          .cube(col("o_orderpriority"), col("o_orderstatus"))
          .agg(
            grouping_id().cast("int").as("gid"),
            count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents")
          ),
      Some("""SELECT o_orderpriority, o_orderstatus,
             |       CAST(grouping_id(o_orderpriority, o_orderstatus) AS INT) AS gid,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM orders
             |GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin)
    ),

    // ---- unpivot (melt): wide measure columns -> long (metric, value)
    //      rows. A pure Expand — narrow map stage, no shuffle until the
    //      summarizing agg; nulls ride through (Spark unpivot keeps
    //      them, so the oracle is the null-preserving UNION ALL, not
    //      DuckDB's null-dropping UNPIVOT). ----
    Q(
      "p9_unpivot_measures",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .select(
            col("l_orderkey"),
            (dec(col("l_quantity")) * 100).cast("long").as("qty_c"),
            (dec(col("l_extendedprice")) * 100).cast("long").as("price_c"),
            (dec(col("l_discount")) * 100).cast("long").as("disc_c"),
            (dec(col("l_tax")) * 100).cast("long").as("tax_c")
          )
          .unpivot(
            ids = Array(col("l_orderkey")),
            values = Array(col("qty_c"), col("price_c"), col("disc_c"), col("tax_c")),
            variableColumnName = "metric",
            valueColumnName = "v"
          )
          .groupBy(col("metric"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("v")).as("n_vals"),
            sum(col("v")).as("sum_v"),
            min(col("v")).as("min_v"),
            max(col("v")).as("max_v")
          ),
      Some("""WITH cents AS (
             |  SELECT l_orderkey,
             |         CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c,
             |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
             |         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc_c,
             |         CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS tax_c
             |  FROM lineitem),
             |long AS (
             |  SELECT l_orderkey, 'qty_c' AS metric, qty_c AS v FROM cents
             |  UNION ALL SELECT l_orderkey, 'price_c', price_c FROM cents
             |  UNION ALL SELECT l_orderkey, 'disc_c', disc_c FROM cents
             |  UNION ALL SELECT l_orderkey, 'tax_c', tax_c FROM cents)
             |SELECT metric,
             |       CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(count(v) AS BIGINT) AS n_vals,
             |       CAST(sum(v) AS BIGINT) AS sum_v, min(v) AS min_v, max(v) AS max_v
             |FROM long GROUP BY 1""".stripMargin)
    ),

    // ---- window-analytics breadth: lag/lead, ntile, percent_rank,
    //      cume_dist, and a running sum over ONE (custkey, orderdate)
    //      sort — all six functions share a single window shuffle (one
    //      WindowExec pass per frame class, one Exchange total). The
    //      rank ratios leave as half-up-rounded micros via the literal
    //      floor(x*1e6 + 0.5) both engines evaluate identically. ----
    Q(
      "w2_window_analytics",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables
          .orders(s, dir)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            col("o_orderdate"),
            (dec(col("o_totalprice")) * 100).cast("long").as("cents")
          )
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            col("cents"),
            lag(col("cents"), 1).over(w).as("prev_cents"),
            lead(col("cents"), 1).over(w).as("next_cents"),
            ntile(4).over(w).as("quartile"),
            floor(percent_rank().over(w) * 1000000 + 0.5).cast("long").as("pr_micro"),
            floor(cume_dist().over(w) * 1000000 + 0.5).cast("long").as("cd_micro"),
            sum(col("cents")).over(wRun).as("run_cents")
          )
      },
      Some("""WITH cents AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate,
             |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM orders)
             |SELECT o_custkey, o_orderkey, cents,
             |  lag(cents, 1) OVER w AS prev_cents,
             |  lead(cents, 1) OVER w AS next_cents,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS pr_micro,
             |  CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) AS cd_micro,
             |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
             |FROM cents
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)
    ),

    // ---- DQ: bivariate statistics (Pearson correlation, sample
    //      covariance, sample stddev) per group — one partial-agg'd
    //      shuffle, co-moments merged associatively (the single-pass
    //      distributed shape). Doubles leave on the half-up 1e-6 grid
    //      both engines evaluate from the same literal expression;
    //      co-moment accumulation-order noise (~1e-12 relative) sits
    //      far inside the grid. ----
    Q(
      "dq_correlation_stats",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            floor(corr(col("l_quantity"), col("l_extendedprice")) * 1000000 + 0.5)
              .cast("long")
              .as("corr_micro"),
            floor(covar_samp(col("l_quantity"), col("l_discount")) * 1000000 + 0.5)
              .cast("long")
              .as("covar_micro"),
            floor(stddev_samp(col("l_quantity")) * 1000000 + 0.5).cast("long").as("sd_qty_micro")
          ),
      Some("""SELECT l_returnflag,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(floor(corr(l_quantity, l_extendedprice) * 1000000 + 0.5) AS BIGINT) AS corr_micro,
             |       CAST(floor(covar_samp(l_quantity, l_discount) * 1000000 + 0.5) AS BIGINT) AS covar_micro,
             |       CAST(floor(stddev_samp(l_quantity) * 1000000 + 0.5) AS BIGINT) AS sd_qty_micro
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),

    // ---- set operators beyond UNION: INTERSECT / EXCEPT with their
    //      standard set-distinct semantics (both lower to aggregation /
    //      left-anti shapes — one shuffle each on the compare key, no
    //      nested loops). ----
    Q(
      "set_intersect_except",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        def keys(status: String): DataFrame =
          o.where(col("o_orderstatus") === status).select(col("o_custkey"))
        val f = keys("F")
        val op = keys("O")
        f.intersect(op)
          .withColumn("set_op", lit("both"))
          .unionByName(f.except(op).withColumn("set_op", lit("f_only")))
          .unionByName(op.except(f).withColumn("set_op", lit("o_only")))
      },
      Some("""WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
             |o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
             |SELECT o_custkey, 'both' AS set_op FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
             |UNION ALL
             |SELECT o_custkey, 'f_only' FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
             |UNION ALL
             |SELECT o_custkey, 'o_only' FROM (SELECT o_custkey FROM o EXCEPT SELECT o_custkey FROM f)""".stripMargin)
    ),

    // ---- full OUTER join: reconcile two pre-aggregated per-nation
    //      summaries whose key sets only partially overlap (rare-balance
    //      filters force one-sided rows). Both sides aggregate BEFORE
    //      the join, so the full-outer is summary-vs-summary — one
    //      sort-merge exchange over nation-sized inputs, never
    //      fact-vs-fact. USING-key coalescing matches both engines. ----
    Q(
      "j4_full_outer_reconcile",
      (s, dir) => {
        val c = Tables
          .customer(s, dir)
          .where(col("c_acctbal") < -900)
          .groupBy(col("c_nationkey").cast("int").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = Tables
          .supplier(s, dir)
          .where(col("s_acctbal") > 9900)
          .groupBy(col("s_nationkey").cast("int").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sup, Seq("nationkey"), "full_outer")
          .select(
            col("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"),
            when(col("n_cust").isNull, lit("supp_only"))
              .when(col("n_supp").isNull, lit("cust_only"))
              .otherwise(lit("both"))
              .as("side")
          )
      },
      Some("""WITH c AS (
             |  SELECT CAST(c_nationkey AS INT) AS nationkey, CAST(count(*) AS BIGINT) AS n_cust
             |  FROM customer WHERE c_acctbal < -900 GROUP BY 1),
             |s AS (
             |  SELECT CAST(s_nationkey AS INT) AS nationkey, CAST(count(*) AS BIGINT) AS n_supp
             |  FROM supplier WHERE s_acctbal > 9900 GROUP BY 1)
             |SELECT nationkey,
             |       coalesce(c.n_cust, 0) AS n_cust,
             |       coalesce(s.n_supp, 0) AS n_supp,
             |       CASE WHEN c.n_cust IS NULL THEN 'supp_only'
             |            WHEN s.n_supp IS NULL THEN 'cust_only'
             |            ELSE 'both' END AS side
             |FROM c FULL JOIN s USING (nationkey)""".stripMargin)
    ),

    // ---- LEFT SEMI / LEFT ANTI as first-class plans (EXISTS / NOT
    //      EXISTS): existence probes never duplicate the probe side
    //      (a customer with 40 'F' orders counts once — an inner join
    //      would fan out) and the build side carries only the join key
    //      through the exchange. ----
    Q(
      "j5_semi_anti_exists",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val f = Tables.orders(s, dir).where(col("o_orderstatus") === "F").select(col("o_custkey"))
        def counted(d: DataFrame, label: String): DataFrame =
          d.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n")).withColumn("probe", lit(label))
        counted(cust.join(f, cust("c_custkey") === f("o_custkey"), "left_semi"), "has_f")
          .unionByName(
            counted(cust.join(f, cust("c_custkey") === f("o_custkey"), "left_anti"), "no_f")
          )
      },
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, 'has_f' AS probe
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
             |GROUP BY 1
             |UNION ALL
             |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, 'no_f' AS probe
             |FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
             |GROUP BY 1""".stripMargin)
    ),

    // ---- GROUPING SETS with a hand-picked (non-lattice) set list —
    //      the general form under ROLLUP/CUBE: only the requested
    //      levels expand (3 here, vs CUBE's 4), still one Expand + one
    //      partial-agg'd shuffle. ----
    Q(
      "a10_grouping_sets",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .select(
            col("l_returnflag"),
            col("l_linestatus"),
            col("l_quantity").cast("long").as("qty")
          )
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
            col("l_returnflag"),
            col("l_linestatus")
          )
          .agg(
            grouping_id().cast("int").as("gid"),
            count(lit(1)).as("n"),
            sum(col("qty")).as("sum_qty")
          ),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
    ),

    // ---- scalar subquery (orders above the global average price):
    //      the aggregate collapses to ONE row that cross-joins back as
    //      a broadcast — the fact table is scanned once and never
    //      shuffles for the comparison. The threshold leaves as the
    //      floor'd cents integer both engines compute from the same
    //      double division (sum/n < 2^53, exact). ----
    Q(
      "p10_scalar_subquery_filter",
      (s, dir) => {
        val o = Tables
          .orders(s, dir)
          .select(col("o_orderpriority"), (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
        val thr = o.agg(floor(sum(col("cents")).cast("double") / count(lit(1))).cast("long").as("thr_cents"))
        o.join(broadcast(thr))
          .where(col("cents") > col("thr_cents"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_above"), max(col("thr_cents")).as("thr_cents"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderpriority, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |  FROM orders),
             |t AS (SELECT CAST(floor(sum(cents) / count(*)) AS BIGINT) AS thr_cents FROM o)
             |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_above, max(t.thr_cents) AS thr_cents
             |FROM o, t WHERE o.cents > t.thr_cents
             |GROUP BY 1""".stripMargin)
    ),

    // ---- nested-array analytics via higher-order functions: per-order
    //      quantity vectors built ONCE by the aggregation (array_sort of
    //      collect_list fixes the nondeterministic gather order), then
    //      aggregate/filter/zip_with lambdas consume the MATERIALIZED
    //      column — HOF lambdas re-evaluate their argument subtree per
    //      reference, so the array must be staged by the agg, never
    //      derived inline under the lambdas. All-integer outputs keep
    //      the cross-engine compare exact (dot product of longs). ----
    Q(
      "p11_array_hof",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(array_sort(collect_list(col("l_quantity").cast("long"))).as("qs"))
          .select(
            col("l_orderkey"),
            size(col("qs")).as("n_items"),
            aggregate(col("qs"), lit(0L), (acc, x) => acc + x).as("sum_q"),
            size(filter(col("qs"), _ > 25L)).as("n_big"),
            element_at(col("qs"), 1).as("min_q"),
            element_at(col("qs"), -1).as("max_q"),
            aggregate(zip_with(col("qs"), reverse(col("qs")), (a, b) => a * b), lit(0L), (acc, x) => acc + x)
              .as("dot_rev")
          ),
      Some("""WITH qs AS (
             |  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
             |  FROM lineitem GROUP BY 1)
             |SELECT l_orderkey,
             |  CAST(len(qs) AS INT) AS n_items,
             |  CAST(list_sum(qs) AS BIGINT) AS sum_q,
             |  CAST(len(list_filter(qs, x -> x > 25)) AS INT) AS n_big,
             |  qs[1] AS min_q,
             |  qs[-1] AS max_q,
             |  CAST(list_dot_product(qs, list_reverse(qs)) AS BIGINT) AS dot_rev
             |FROM qs""".stripMargin)
    ),

    // ---- MapType surface: the event props JSON envelope parsed as
    //      map<string,long> (executor-side from_json, no schema
    //      inference pass), entries exploded and aggregated per key —
    //      the semi-structured sibling of p2's struct flatten. One
    //      narrow parse+explode stage into one partial-agg'd shuffle
    //      keyed by the (tiny) key vocabulary. ----
    Q(
      "p12_map_entries",
      (s, dir) =>
        Tables
          .events(s, dir)
          .select(
            from_json(
              col("props"),
              org.apache.spark.sql.types.MapType(
                org.apache.spark.sql.types.StringType,
                org.apache.spark.sql.types.LongType)).as("m"))
          .select(explode(col("m")).as(Seq("key", "v")))
          .groupBy(col("key"))
          .agg(
            count(lit(1)).as("n"),
            min(col("v")).as("min_v"),
            max(col("v")).as("max_v"),
            sum(col("v")).as("sum_v")
          ),
      Some("""SELECT u.k AS key,
             |       CAST(count(*) AS BIGINT) AS n,
             |       min(CAST(json_extract(e.props, '$.' || u.k) AS BIGINT)) AS min_v,
             |       max(CAST(json_extract(e.props, '$.' || u.k) AS BIGINT)) AS max_v,
             |       CAST(sum(CAST(json_extract(e.props, '$.' || u.k) AS BIGINT)) AS BIGINT) AS sum_v
             |FROM events e, unnest(json_keys(e.props)) AS u(k)
             |GROUP BY 1""".stripMargin)
    ),

    // ---- window value-functions over the FULL frame: first/last/nth
    //      order per customer from one (custkey, orderdate, orderkey)
    //      sort — three functions, one WindowExec, one Exchange. The
    //      explicit ROWS UNBOUNDED..UNBOUNDED frame is spelled in both
    //      engines (defaults differ: RANGE..CURRENT ROW would make
    //      last_value the current row). ----
    Q(
      "w3_first_last_nth",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables
          .orders(s, dir)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("first_ok"),
            last(col("o_orderkey")).over(w).as("last_ok"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_ok")
          )
      },
      Some("""SELECT o_custkey, o_orderkey,
             |       first_value(o_orderkey) OVER w AS first_ok,
             |       last_value(o_orderkey)  OVER w AS last_ok,
             |       nth_value(o_orderkey, 2) OVER w AS second_ok
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin)
    ),

    // ---- star-schema flagship (TPC-H Q5 shape): 6-table join with
    //      region/nation/customer/supplier as EXPLICIT broadcasts —
    //      the fact chain (orders ⋈ lineitem) is the only shuffled
    //      join; every dim reaches the probe side without an Exchange.
    //      The date filter pushes to the orders scan; the same-nation
    //      (customer = supplier) constraint rides the broadcast probes.
    //      This is the join-reorder / broadcast-planning shape a star
    //      warehouse runs all day at 100 TB. ----
    Q(
      "q5_star_join_revenue",
      (s, dir) => {
        val nat = Tables
          .nation(s, dir)
          .join(
            Tables.region(s, dir).where(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey")
          )
          .select(col("n_nationkey"), col("n_name"))
        val cust = Tables
          .customer(s, dir)
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey"))
        val supp = Tables
          .supplier(s, dir)
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
        Tables
          .orders(s, dir)
          .where(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
          .select(col("o_orderkey"), col("o_custkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(
            Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount")),
            col("o_orderkey") === col("l_orderkey")
          )
          .join(
            broadcast(supp),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey")
          )
          .groupBy(col("n_name"))
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("decimal(28,4)")
              .*(lit(10000))
              .cast("long")
              .as("revenue_e4"),
            count(lit(1)).as("n_items")
          )
      },
      Some("""SELECT n_name,
             |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) * 10000 AS BIGINT) AS revenue_e4,
             |       CAST(count(*) AS BIGINT) AS n_items
             |FROM customer, orders, lineitem, supplier, nation, region
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |  AND r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY n_name""".stripMargin)
    ),

    // ---- mode / most-frequent-value per group: two-stage algebraic
    //      shape — count per (group, value) partial-aggregates map-side,
    //      then max_by picks the winner with an explicit (count, value)
    //      tiebreak so both engines elect the same mode. Never a window
    //      over raw rows. ----
    Q(
      "a11_mode_per_group",
      (s, dir) =>
        Tables
          .orders(s, dir)
          .groupBy(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("o_orderpriority"))
          .agg(
            // tiebreak as one orderable scalar (zero-padded count, then
            // value) — DuckDB's arg_max takes no struct ordering key
            max_by(
              col("o_orderstatus"),
              concat(lpad(col("n").cast("string"), 20, "0"), lit("|"), col("o_orderstatus"))
            ).as("mode_status"),
            max(col("n")).as("n_max")
          ),
      Some("""WITH c AS (
             |  SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
             |  FROM orders GROUP BY 1, 2)
             |SELECT o_orderpriority,
             |       arg_max(o_orderstatus, lpad(CAST(n AS VARCHAR), 20, '0') || '|' || o_orderstatus) AS mode_status,
             |       max(n) AS n_max
             |FROM c GROUP BY 1""".stripMargin)
    ),

    // ---- DQ: Benford first-significant-digit profile — the classic
    //      fabricated-data screen for financial/measure columns. Exact
    //      integers throughout: observed per-mille share by integer
    //      division, Benford expectation inlined as per-mille literals
    //      (round(1000*log10(1+1/d)) — computed once, same constants
    //      both engines), deviation as |obs - exp|. One digit-keyed
    //      agg over a codegen'd substring; 9-row output. ----
    Q(
      "dq_benford_digits",
      (s, dir) => {
        // per-mille Benford expectation: 301,176,125,97,79,67,58,51,46
        val benford = (1 to 9).map(d => d -> math.round(1000.0 * math.log10(1.0 + 1.0 / d)).toInt)
        val expCol = benford.foldLeft(lit(0)) { case (acc, (d, e)) =>
          when(col("digit") === d.toString, e).otherwise(acc)
        }
        val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        val digits = Tables
          .orders(s, dir)
          .select(substring(cents.cast("string"), 1, 1).as("digit"))
          .groupBy(col("digit"))
          .agg(count(lit(1)).as("n"))
        digits
          .crossJoin(broadcast(digits.agg(sum(col("n")).as("total"))))
          .select(
            col("digit"),
            col("n"),
            expr("(1000 * n) div total").as("obs_pm"),
            expCol.cast("long").as("benford_pm")
          )
          .withColumn("dev_pm", abs(col("obs_pm") - col("benford_pm")))
      },
      Some {
        val benford = (1 to 9).map(d => d -> math.round(1000.0 * math.log10(1.0 + 1.0 / d)).toInt)
        val cases = benford.map { case (d, e) => s"WHEN digit = '$d' THEN $e" }.mkString(" ")
        s"""WITH c AS (
           |  SELECT substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS digit
           |  FROM orders),
           |g AS (SELECT digit, count(*) AS n FROM c GROUP BY 1),
           |t AS (SELECT sum(n) AS total FROM g)
           |SELECT digit, CAST(n AS BIGINT) AS n,
           |  CAST((1000 * n) // total AS BIGINT) AS obs_pm,
           |  CAST(CASE $cases ELSE 0 END AS BIGINT) AS benford_pm,
           |  CAST(abs((1000 * n) // total - (CASE $cases ELSE 0 END)) AS BIGINT) AS dev_pm
           |FROM g, t""".stripMargin
      }
    ),

    // ---- DQ: correlation SUFFICIENT STATISTICS per group — exact
    //      integer/decimal sums (n, Σx, Σy, Σxy, Σx², Σy²) from which
    //      Pearson r derives as (nΣxy−ΣxΣy)/√(nΣx²−Σx²)√(nΣy²−Σy²).
    //      corr() itself is FP with engine- and order-dependent
    //      accumulation (never hash-comparable); the sufficient-stats
    //      form is the mergeable, bit-exact thing a 100 TB profiler
    //      actually stores (sums combine across partitions/loads like
    //      IncrementalAgg). Cents-scaled inputs; DECIMAL(38,0) product
    //      sums — no overflow at any realistic scale. ----
    Q(
      "dq_corr_stats",
      (s, dir) => {
        val qc = (col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
        val pc = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
        Tables
          .lineitem(s, dir)
          .select(col("l_returnflag"), qc.as("x"), pc.as("y"))
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            // Product sums exceed int64 (Σy² ≈ 2.4e19 at sf0.1) so they
            // accumulate in DECIMAL(38,0) — but raw decimal output is not
            // hash-canonical across engines (the one r6 gate failure), so
            // the wire format is the canonical digit STRING on both sides.
            sum((col("x") * col("y")).cast("decimal(38,0)")).cast("decimal(38,0)").cast("string").as("sxy"),
            sum((col("x") * col("x")).cast("decimal(38,0)")).cast("decimal(38,0)").cast("string").as("sxx"),
            sum((col("y") * col("y")).cast("decimal(38,0)")).cast("decimal(38,0)").cast("string").as("syy")
          )
      },
      Some("""WITH b AS (
             |  SELECT l_returnflag,
             |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
             |  FROM lineitem)
             |SELECT l_returnflag,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(x) AS BIGINT) AS sx,
             |  CAST(sum(y) AS BIGINT) AS sy,
             |  CAST(CAST(sum(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS VARCHAR) AS sxy,
             |  CAST(CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS VARCHAR) AS sxx,
             |  CAST(CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS VARCHAR) AS syy
             |FROM b GROUP BY 1""".stripMargin)
    ),

    // ---- market-basket association rules: which parts predict which,
    //      as directed rules with exact-integer confidence and lift.
    //      Apriori downward-closure prune (pairs only among
    //      individually frequent items) bounds the per-basket pair
    //      expansion; the top-500 cut under a TOTAL order
    //      (s_pair DESC, ante, cons) keeps the output scale-stable. ----
    Q(
      "mb_assoc_rules",
      (s, dir) => {
        val baskets = Tables
          .lineitem(s, dir)
          .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
        graft.operators.Association
          .pairRules(baskets, "basket", "item", minSupport = 2L)
          .orderBy(col("s_pair").desc, col("ante").asc, col("cons").asc)
          .limit(500)
      },
      Some("""WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
             |n AS (SELECT count(DISTINCT b) AS n_baskets FROM it),
             |supp AS (SELECT i, count(*) AS s FROM it GROUP BY 1),
             |freq AS (SELECT i, s FROM supp WHERE s >= 2),
             |fit AS (SELECT it.b, it.i FROM it JOIN freq ON it.i = freq.i),
             |pr AS (SELECT x.i AS pa, y.i AS pb, count(*) AS s_pair
             |       FROM fit x JOIN fit y ON x.b = y.b AND x.i < y.i
             |       GROUP BY 1, 2 HAVING count(*) >= 2),
             |sc AS (SELECT pa, pb, s_pair, fa.s AS s_a, fb.s AS s_b
             |       FROM pr JOIN freq fa ON fa.i = pa JOIN freq fb ON fb.i = pb),
             |r AS (SELECT pa AS ante, pb AS cons, s_pair, s_a AS s_ante, s_b AS s_cons FROM sc
             |      UNION ALL SELECT pb, pa, s_pair, s_b, s_a FROM sc)
             |SELECT ante, cons, CAST(s_pair AS BIGINT) AS s_pair,
             |  CAST(s_ante AS BIGINT) AS s_ante, CAST(s_cons AS BIGINT) AS s_cons,
             |  CAST((1000000 * s_pair) // s_ante AS BIGINT) AS conf_micro,
             |  CAST((1000000 * s_pair * (SELECT n_baskets FROM n)) // (s_ante * s_cons) AS BIGINT) AS lift_micro
             |FROM r ORDER BY s_pair DESC, ante ASC, cons ASC LIMIT 500""".stripMargin)
    )
  )
}
