package graft.queries

import graft.Tables
import graft.catalog.Catalog
import graft.conform.{SourcePipelines, SyntheticFeeds}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle coverage for the FULL per-source conform pipelines
  * (SourcePipelines.conformJson / conformXml): a deterministic feed is
  * synthesized from `orders`, pushed through the real conform transformer
  * — timestamp parse, F10 WORK_TIME subtraction, F11 string->int casts,
  * U1 duration parse, decodes, dimension lookups, the post-conversion
  * hash canon, validity — and the oracle replays every step in SQL from
  * the SAME Scala constants. This upgrades the F10/F11 conform math from
  * spec-only to oracle-checked (round-1 verdict gap).
  */
object ConformQueries {
  // dimension fixtures shared verbatim between the Spark frames and the
  // oracle's VALUES lists
  val Agents: Seq[(String, Int)]    = Seq("agent_0" -> 10, "agent_1" -> 11, "agent_2" -> 12)
  val Areas: Seq[(String, Int)]     = Seq("Billing" -> 21, "Tech" -> 22)
  val CustTypes: Seq[(String, Int)] = Seq("Corporate" -> 31, "Retail" -> 32)

  private val LoadTs    = "2024-06-01 00:00:00"
  private val EndOfTime = "2099-12-31 00:00:00"

  private def dims(s: SparkSession): SourcePipelines.Dims = {
    import s.implicits._
    SourcePipelines.Dims(
      agents = Agents.toDF("PSEUDO_CODE", "AGENT_ID"),
      supportAreas = Areas.toDF("SUPPORT_AREA_NAME", "SUPPORT_AREA_ID"),
      customerTypes = CustTypes.toDF("CUSTOMER_TYPE_NAME", "CUSTOMER_TYPE_ID")
    )
  }

  private def dimSql: String = {
    def values(rows: Seq[(String, Int)]) =
      rows.map { case (k, v) => s"('$k', CAST($v AS INT))" }.mkString(", ")
    s"""agents(PSEUDO_CODE, AGENT_ID) AS (VALUES ${values(Agents)}),
       |areas(SUPPORT_AREA_NAME, SUPPORT_AREA_ID) AS (VALUES ${values(Areas)}),
       |ctypes(CUSTOMER_TYPE_NAME, CUSTOMER_TYPE_ID) AS (VALUES ${values(CustTypes)})""".stripMargin
  }

  /** md5 row-hash canon over named SQL expressions (Fingerprint.rowHash
    * twin — see f1_row_fingerprint).
    */
  private def sqlRowHash(cols: Seq[String]): String =
    s"md5(concat_ws('||', ${cols.map(c => s"coalesce(CAST($c AS VARCHAR), 'NULL')").mkString(", ")}))"

  /** The mart projection both conform queries emit (deterministic subset
    * of SourcePipelines.MartColumns — HISTORIC_CSD_ID / ROUTER_GROUP are
    * all-NULL pre-routing and add nothing to the compare).
    */
  private val OutCols = Seq(
    "SOURCE_ID", "SOURCE_SYSTEM_IDENTIFIER", "AGENT_ID", "INTERACTION_DATE",
    "SUPPORT_AREA_ID", "INTERACTION_STATUS", "INTERACTION_TYPE", "CUSTOMER_TYPE_ID",
    "HANDLE_TIME", "WORK_TIME", "FIRST_CONTACT_RESOLUTION", "QUERY_STATUS",
    "SOLUTION_TYPE", "CUSTOMER_RATING", "SOURCE_HASH_KEY", "IS_VALID_DATA",
    "DATA_LOAD_ID", "START_DATE", "END_DATE"
  )

  // The deterministic feeds live in conform.SyntheticFeeds (shared with
  // the e2e pipeline harness, which adds the day-2 status mutation);
  // these oracles run them pristine.
  private def jsonFeed(s: SparkSession, dir: String): DataFrame = SyntheticFeeds.json(s, dir)
  private def xmlFeed(s: SparkSession, dir: String): DataFrame  = SyntheticFeeds.xml(s, dir)
  private def csvFeed(s: SparkSession, dir: String): DataFrame  = SyntheticFeeds.csv(s, dir)

  /** The 13 JSON feed columns in frame order — the hash canon covers the
    * POST-conversion values in exactly this order (SURVEY §7.4 risk 1).
    */
  private val JsonHashCols = Seq(
    "INTERACTION_ID", "SUPPORT_CATEGORY", "AGENT_PSEUDO_NAME", "CONTACT_DATE",
    "INTERACTION_STATUS", "INTERACTION_TYPE", "TYPE_OF_CUSTOMER",
    "INTERACTION_DURATION", "TOTAL_TIME", "STATUS_OF_CUSTOMER_INCIDENT",
    "RESOLVED_IN_FIRST_CONTACT", "SOLUTION_TYPE", "RATING"
  )

  private val XmlHashCols = Seq(
    "SUPPORT_IDENTIFIER", "CONTACT_REGARDING", "AGENT_CODE", "DATE_OF_INTERACTION",
    "STATUS_OF_INTERACTION", "TYPE_OF_INTERACTION", "CUSTOMER_TYPE",
    "CONTACT_DURATION", "AFTER_CONTACT_WORK_TIME", "INCIDENT_STATUS",
    "FIRST_CONTACT_RESOLUTION", "SOLUTION", "RATING", "TIME_STAMP"
  )

  /** CSV hashes the RAW 13 columns PRE-parse, in feed order — the one
    * source whose hash canon sees unparsed strings (SURVEY §7.4 risk 1).
    */
  private val CsvHashCols = Seq(
    "TICKET_IDENTIFIER", "SUPPORT_CATEGORY", "AGENT_NAME", "DATE_OF_CALL",
    "CALL_STATUS", "CALL_TYPE", "TYPE_OF_CUSTOMER", "DURATION", "WORK_TIME",
    "TICKET_STATUS", "RESOLVED_IN_FIRST_CONTACT", "RESOLUTION_CATEGORY", "RATING"
  )

  val qs: Seq[Q] = Seq(
    // ---- F6 rating decode + raw-column hash canon: the whole CSV
    //      conform pipeline (the third sibling — json/xml twins below) ----
    Q(
      "conform_csv_full",
      (s, dir) =>
        SourcePipelines
          .conformCsv(
            csvFeed(s, dir),
            dims(s),
            sourceId = 1,
            dataLoadId = 76L,
            loadTs = LoadTs,
            tiebreak = Seq(col("DATE_OF_CALL").desc)
          )
          .select(OutCols.map(col): _*),
      Some(s"""WITH $dimSql,
              |feed AS (
              |  SELECT CAST(o_orderkey AS INT) AS TICKET_IDENTIFIER,
              |    CASE WHEN o_orderkey % 2 = 0 THEN 'Billing' ELSE 'Tech' END AS SUPPORT_CATEGORY,
              |    'agent_' || CAST(o_orderkey % 3 AS VARCHAR) AS AGENT_NAME,
              |    strftime(o_orderdate, '%m%d%Y') || '103000' AS DATE_OF_CALL,
              |    o_orderstatus AS CALL_STATUS,
              |    o_orderpriority AS CALL_TYPE,
              |    CASE WHEN o_orderkey % 2 = 0 THEN 'Corporate' ELSE 'Retail' END AS TYPE_OF_CUSTOMER,
              |    CAST(o_orderkey % 100 + 1 AS VARCHAR) AS DURATION,
              |    CAST(o_orderkey % 37 AS VARCHAR) AS WORK_TIME,
              |    o_orderstatus AS TICKET_STATUS,
              |    CASE WHEN o_orderkey % 2 = 0 THEN '1' ELSE '0' END AS RESOLVED_IN_FIRST_CONTACT,
              |    'SOL_' || CAST(o_orderkey % 4 AS VARCHAR) AS RESOLUTION_CATEGORY,
              |    CASE WHEN o_orderkey % 3 = 0 THEN 'BEST'
              |         WHEN o_orderkey % 3 = 1 THEN 'GOOD' ELSE 'BAD' END AS RATING,
              |    o_orderdate
              |  FROM orders),
              |hashed AS (SELECT *, ${sqlRowHash(CsvHashCols)} AS SOURCE_HASH_KEY FROM feed)
              |SELECT CAST(1 AS INT) AS SOURCE_ID,
              |  'AT&T - ' || CAST(TICKET_IDENTIFIER AS VARCHAR) AS SOURCE_SYSTEM_IDENTIFIER,
              |  a.AGENT_ID,
              |  strftime(o_orderdate, '%Y-%m-%d') || ' 10:30:00' AS INTERACTION_DATE,
              |  sa.SUPPORT_AREA_ID, CALL_STATUS AS INTERACTION_STATUS,
              |  CALL_TYPE AS INTERACTION_TYPE,
              |  ct.CUSTOMER_TYPE_ID,
              |  CAST(DURATION AS INT) AS HANDLE_TIME,
              |  CAST(WORK_TIME AS INT) AS WORK_TIME,
              |  CAST(RESOLVED_IN_FIRST_CONTACT AS INT) AS FIRST_CONTACT_RESOLUTION,
              |  TICKET_STATUS AS QUERY_STATUS,
              |  RESOLUTION_CATEGORY AS SOLUTION_TYPE,
              |  CAST(CASE RATING WHEN 'WORST' THEN 1 WHEN 'BAD' THEN 2 WHEN 'NEUTRAL' THEN 3
              |       WHEN 'GOOD' THEN 4 WHEN 'BEST' THEN 5 END AS INT) AS CUSTOMER_RATING,
              |  SOURCE_HASH_KEY, CAST(1 AS INT) AS IS_VALID_DATA,
              |  CAST(76 AS BIGINT) AS DATA_LOAD_ID,
              |  '$LoadTs' AS START_DATE, '$EndOfTime' AS END_DATE
              |FROM hashed
              |LEFT JOIN agents a ON AGENT_NAME = a.PSEUDO_CODE
              |LEFT JOIN areas sa ON SUPPORT_CATEGORY = sa.SUPPORT_AREA_NAME
              |LEFT JOIN ctypes ct ON TYPE_OF_CUSTOMER = ct.CUSTOMER_TYPE_NAME""".stripMargin)
    ),

    // ---- F7/F10/F6/F9 + hash canon: the whole JSON conform pipeline ----
    Q(
      "conform_json_full",
      (s, dir) =>
        SourcePipelines
          .conformJson(
            jsonFeed(s, dir),
            dims(s),
            sourceId = 2,
            dataLoadId = 77L,
            loadTs = LoadTs,
            tiebreak = Seq(col("INTERACTION_ID").desc)
          )
          .select(OutCols.map(col): _*),
      Some(s"""WITH $dimSql,
              |feed AS (
              |  SELECT CAST(o_orderkey AS INT) AS INTERACTION_ID,
              |    CASE WHEN o_orderkey % 2 = 0 THEN 'Billing' ELSE 'Tech' END AS SUPPORT_CATEGORY,
              |    'agent_' || CAST(o_orderkey % 3 AS VARCHAR) AS AGENT_PSEUDO_NAME,
              |    strftime(o_orderdate, '%Y-%m-%d') || ' 10:30:00' AS CONTACT_DATE,
              |    o_orderstatus AS INTERACTION_STATUS,
              |    o_orderpriority AS INTERACTION_TYPE,
              |    CASE WHEN o_orderkey % 2 = 0 THEN 'Corporate' ELSE 'Retail' END AS TYPE_OF_CUSTOMER,
              |    CAST(o_orderkey % 100 + 1 AS INT) AS INTERACTION_DURATION,
              |    CAST(o_orderkey % 100 + 1 + o_orderkey % 37 AS INT) AS TOTAL_TIME,
              |    o_orderstatus AS STATUS_OF_CUSTOMER_INCIDENT,
              |    CASE WHEN o_orderkey % 2 = 0 THEN 'yes' ELSE 'NO' END AS RESOLVED_IN_FIRST_CONTACT,
              |    'SOL_' || CAST(o_orderkey % 4 AS VARCHAR) AS SOLUTION_TYPE,
              |    CAST(o_orderkey % 10 + 1 AS INT) AS RATING
              |  FROM orders),
              |hashed AS (SELECT *, ${sqlRowHash(JsonHashCols)} AS SOURCE_HASH_KEY FROM feed)
              |SELECT CAST(2 AS INT) AS SOURCE_ID,
              |  'AMAZON - ' || CAST(INTERACTION_ID AS VARCHAR) AS SOURCE_SYSTEM_IDENTIFIER,
              |  a.AGENT_ID, CONTACT_DATE AS INTERACTION_DATE,
              |  sa.SUPPORT_AREA_ID, INTERACTION_STATUS, INTERACTION_TYPE,
              |  ct.CUSTOMER_TYPE_ID,
              |  INTERACTION_DURATION AS HANDLE_TIME,
              |  CAST(TOTAL_TIME - INTERACTION_DURATION AS INT) AS WORK_TIME,
              |  CASE upper(RESOLVED_IN_FIRST_CONTACT) WHEN 'YES' THEN 1 WHEN 'NO' THEN 0 END AS FIRST_CONTACT_RESOLUTION,
              |  STATUS_OF_CUSTOMER_INCIDENT AS QUERY_STATUS,
              |  SOLUTION_TYPE,
              |  CAST(floor(CAST(RATING AS INT) / 2) AS INT) AS CUSTOMER_RATING,
              |  SOURCE_HASH_KEY, CAST(1 AS INT) AS IS_VALID_DATA,
              |  CAST(77 AS BIGINT) AS DATA_LOAD_ID,
              |  '$LoadTs' AS START_DATE, '$EndOfTime' AS END_DATE
              |FROM hashed
              |LEFT JOIN agents a ON AGENT_PSEUDO_NAME = a.PSEUDO_CODE
              |LEFT JOIN areas sa ON SUPPORT_CATEGORY = sa.SUPPORT_AREA_NAME
              |LEFT JOIN ctypes ct ON TYPE_OF_CUSTOMER = ct.CUSTOMER_TYPE_NAME""".stripMargin)
    ),

    // ---- U1/F11/F7 + hash canon: the whole XML conform pipeline ----
    Q(
      "conform_xml_full",
      (s, dir) =>
        SourcePipelines
          .conformXml(
            xmlFeed(s, dir),
            dims(s),
            sourceId = 3,
            dataLoadId = 78L,
            loadTs = LoadTs,
            tiebreak = Seq(col("TIME_STAMP").desc)
          )
          .select(OutCols.map(col): _*),
      Some {
        // the oracle builds durations/dates from the same seeds, so the
        // post-parse values are direct integer/string expressions (the
        // string->seconds and format round-trips are pinned by u1/f7)
        val secs1 = "(o_orderkey % 7200 + 30)"
        val secs2 = "(o_orderkey % 3600)"
        def hms(secs: String) =
          s"CAST($secs // 3600 AS VARCHAR) || ':' || " +
            s"lpad(CAST(($secs % 3600) // 60 AS VARCHAR), 2, '0') || ':' || " +
            s"lpad(CAST($secs % 60 AS VARCHAR), 2, '0')"
        s"""WITH $dimSql,
           |parsed AS (
           |  SELECT CAST(o_orderkey AS INT) AS SUPPORT_IDENTIFIER,
           |    CASE WHEN o_orderkey % 2 = 0 THEN 'Billing' ELSE 'Tech' END AS CONTACT_REGARDING,
           |    'agent_' || CAST(o_orderkey % 3 AS VARCHAR) AS AGENT_CODE,
           |    strftime(o_orderdate, '%Y-%m-%d') || ' 10:30:00' AS DATE_OF_INTERACTION,
           |    o_orderstatus AS STATUS_OF_INTERACTION,
           |    o_orderpriority AS TYPE_OF_INTERACTION,
           |    CASE WHEN o_orderkey % 2 = 0 THEN 'Corporate' ELSE 'Retail' END AS CUSTOMER_TYPE,
           |    CAST($secs1 AS INT) AS CONTACT_DURATION,
           |    CAST($secs2 AS INT) AS AFTER_CONTACT_WORK_TIME,
           |    o_orderstatus AS INCIDENT_STATUS,
           |    CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'FALSE' END AS FIRST_CONTACT_RESOLUTION,
           |    'SOL_' || CAST(o_orderkey % 4 AS VARCHAR) AS SOLUTION,
           |    CAST(o_orderkey % 5 + 1 AS VARCHAR) AS RATING,
           |    strftime(o_orderdate, '%Y%m%d') || '103000' AS TIME_STAMP
           |  FROM orders),
           |hashed AS (SELECT *, ${sqlRowHash(XmlHashCols)} AS SOURCE_HASH_KEY FROM parsed)
           |SELECT CAST(3 AS INT) AS SOURCE_ID,
           |  'UBER - ' || CAST(SUPPORT_IDENTIFIER AS VARCHAR) AS SOURCE_SYSTEM_IDENTIFIER,
           |  a.AGENT_ID, DATE_OF_INTERACTION AS INTERACTION_DATE,
           |  sa.SUPPORT_AREA_ID, STATUS_OF_INTERACTION AS INTERACTION_STATUS,
           |  TYPE_OF_INTERACTION AS INTERACTION_TYPE,
           |  ct.CUSTOMER_TYPE_ID,
           |  CONTACT_DURATION AS HANDLE_TIME,
           |  AFTER_CONTACT_WORK_TIME AS WORK_TIME,
           |  CASE upper(FIRST_CONTACT_RESOLUTION) WHEN 'TRUE' THEN 1 WHEN 'FALSE' THEN 0 END AS FIRST_CONTACT_RESOLUTION,
           |  INCIDENT_STATUS AS QUERY_STATUS,
           |  SOLUTION AS SOLUTION_TYPE,
           |  CAST(RATING AS INT) AS CUSTOMER_RATING,
           |  SOURCE_HASH_KEY, CAST(1 AS INT) AS IS_VALID_DATA,
           |  CAST(78 AS BIGINT) AS DATA_LOAD_ID,
           |  '$LoadTs' AS START_DATE, '$EndOfTime' AS END_DATE
           |FROM hashed
           |LEFT JOIN agents a ON AGENT_CODE = a.PSEUDO_CODE
           |LEFT JOIN areas sa ON CONTACT_REGARDING = sa.SUPPORT_AREA_NAME
           |LEFT JOIN ctypes ct ON CUSTOMER_TYPE = ct.CUSTOMER_TYPE_NAME""".stripMargin
      }
    ),

    // ---- catalog-as-data: the CSD_DATA_DICTIONARY / CSD_TABLE_COLUMNS
    //      twin, derived from the declared feed schemas and queryable
    //      like any table (Setup/SQL_DDL_Script.sql:76-133) ----
    Q(
      "catalog_dictionary",
      (s, _) => Catalog.dictionary(s),
      Some {
        val rows = Catalog.entries
          .map(e =>
            s"(CAST(${e.source_id} AS INT), '${e.table_name}', CAST(${e.ordinal} AS INT), " +
              s"'${e.field_name}', '${e.data_type}', CAST(${e.nullable_flag} AS INT))")
          .mkString(",\n")
        s"""SELECT * FROM (VALUES
           |$rows
           |) AS t(source_id, table_name, ordinal, field_name, data_type, nullable_flag)""".stripMargin
      }
    )
  )
}
