package graft.conform

import graft.functions.Fingerprint
import graft.operators.{Dedup, Lookup}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source conform transformers emitting the reference's 21-column
  * conformed frame (SURVEY §1.4; select order
  * ETL/CSV_Batch_Processing.py:220-242 and 2x siblings).
  *
  * Semantics preserved per pipeline:
  *   - hash canon per source (SURVEY §7.4 risk 1): CSV hashes the RAW
  *     13 columns pre-parse; JSON hashes post-conversion (timestamp
  *     already parsed, WORK_TIME derived); XML hashes post-conversion
  *     (int durations); all hash the UNPREFIXED id.
  *   - dimension enrichment is three broadcast left joins (J2) with
  *     null-in -> null-out, replacing the reference's per-row DB lookup
  *     UDFs (U2-U4).
  *   - 12-field validity check -> IS_VALID_DATA 0/1; invalid rows are
  *     kept (ETL/CSV_Batch_Processing.py:200-217).
  *   - ids conform to INTEGER (the reference's lookup UDFs leak strings
  *     into INTEGER columns — SURVEY §7.4 risk 4 — we fix the type).
  */
object SourcePipelines {
  /** The 21 mart columns in the reference's select order. */
  val MartColumns: Seq[String] = Seq(
    "SOURCE_ID", "SOURCE_SYSTEM_IDENTIFIER", "AGENT_ID", "INTERACTION_DATE",
    "SUPPORT_AREA_ID", "INTERACTION_STATUS", "INTERACTION_TYPE",
    "CUSTOMER_TYPE_ID", "HANDLE_TIME", "WORK_TIME", "FIRST_CONTACT_RESOLUTION",
    "QUERY_STATUS", "SOLUTION_TYPE", "CUSTOMER_RATING", "SOURCE_HASH_KEY",
    "IS_VALID_DATA", "HISTORIC_CSD_ID", "ROUTER_GROUP", "DATA_LOAD_ID",
    "START_DATE", "END_DATE"
  )

  /** The 12 mandatory fields of the validity check
    * (ETL/CSV_Batch_Processing.py:200-217 — CUSTOMER_RATING is exempt).
    */
  val MandatoryFields: Seq[String] = Seq(
    "SOURCE_SYSTEM_IDENTIFIER", "AGENT_ID", "INTERACTION_DATE",
    "SUPPORT_AREA_ID", "INTERACTION_STATUS", "INTERACTION_TYPE",
    "CUSTOMER_TYPE_ID", "HANDLE_TIME", "WORK_TIME",
    "FIRST_CONTACT_RESOLUTION", "QUERY_STATUS", "SOLUTION_TYPE"
  )

  /** Source-scoped dimension frames, pre-prepared for broadcast
    * (Lookup.prepareDim output shape: (nameCol, idCol)).
    */
  final case class Dims(agents: DataFrame, supportAreas: DataFrame, customerTypes: DataFrame)

  private def enrichAll(
      df: DataFrame,
      dims: Dims,
      agentKey: String,
      areaKey: String,
      custKey: String
  ): DataFrame = {
    val a = Lookup.enrich(df, dims.agents, agentKey, "PSEUDO_CODE", "AGENT_ID", "AGENT_ID")
    val s = Lookup.enrich(a, dims.supportAreas, areaKey, "SUPPORT_AREA_NAME", "SUPPORT_AREA_ID", "SUPPORT_AREA_ID")
    Lookup.enrich(s, dims.customerTypes, custKey, "CUSTOMER_TYPE_NAME", "CUSTOMER_TYPE_ID", "CUSTOMER_TYPE_ID")
  }

  private def finish(df: DataFrame, loadTs: String, endOfTime: String): DataFrame =
    df.withColumn("IS_VALID_DATA", Validity.flag(MandatoryFields.map(col)))
      .withColumn("HISTORIC_CSD_ID", lit(null).cast("int"))
      .withColumn("ROUTER_GROUP", lit(null).cast("string"))
      .withColumn("START_DATE", lit(loadTs))
      .withColumn("END_DATE", lit(endOfTime))
      .select(MartColumns.map(col): _*)

  /** CSV ("AT&T") conform: hash the RAW columns first, then parse
    * (ETL/CSV_Batch_Processing.py:80-242). `tiebreak` replaces the
    * reference's nondeterministic self-ordered window (SURVEY §2.5).
    */
  def conformCsv(
      feed: DataFrame,
      dims: Dims,
      sourceId: Int,
      dataLoadId: Long,
      loadTs: String,
      tiebreak: Seq[Column],
      endOfTime: String = "2099-12-31 00:00:00"
  ): DataFrame = {
    val raw = Dedup
      .latestPerKey(feed, Seq("TICKET_IDENTIFIER"), tiebreak)
      .withColumn("SOURCE_HASH_KEY", Fingerprint.rowHash(feed.columns.toSeq.map(col)))
    val conformed = raw
      .withColumn("SOURCE_ID", lit(sourceId))
      .withColumn("SOURCE_SYSTEM_IDENTIFIER",
        concat(lit("AT&T - "), col("TICKET_IDENTIFIER").cast("string")))
      .withColumn("INTERACTION_DATE",
        date_format(to_timestamp(col("DATE_OF_CALL"), SourceFormats.CsvTimestamp),
          "yyyy-MM-dd HH:mm:ss"))
      .withColumn("INTERACTION_STATUS", col("CALL_STATUS"))
      .withColumn("INTERACTION_TYPE", col("CALL_TYPE"))
      .withColumn("HANDLE_TIME", col("DURATION").cast("int"))
      .withColumn("WORK_TIME", col("WORK_TIME").cast("int"))
      .withColumn("FIRST_CONTACT_RESOLUTION", col("RESOLVED_IN_FIRST_CONTACT").cast("int"))
      .withColumn("QUERY_STATUS", col("TICKET_STATUS"))
      .withColumn("SOLUTION_TYPE", col("RESOLUTION_CATEGORY"))
      .withColumn("CUSTOMER_RATING", Decode.rating5(col("RATING")))
      .withColumn("DATA_LOAD_ID", lit(dataLoadId))
    finish(
      enrichAll(conformed, dims, "AGENT_NAME", "SUPPORT_CATEGORY", "TYPE_OF_CUSTOMER"),
      loadTs, endOfTime)
  }

  /** JSON ("AMAZON") conform: flatten happened at read; CONTACT_DATE is
    * parsed BEFORE hashing and WORK_TIME derived after
    * (ETL/JSON_Batch_Processing.py:82-261).
    */
  def conformJson(
      feed: DataFrame,
      dims: Dims,
      sourceId: Int,
      dataLoadId: Long,
      loadTs: String,
      tiebreak: Seq[Column],
      endOfTime: String = "2099-12-31 00:00:00"
  ): DataFrame = {
    val parsed = feed.withColumn(
      "CONTACT_DATE",
      date_format(to_timestamp(col("CONTACT_DATE"), SourceFormats.JsonTimestamp),
        "yyyy-MM-dd HH:mm:ss"))
    val hashCols = parsed.columns.toSeq
    val raw = Dedup
      .latestPerKey(parsed, Seq("INTERACTION_ID"), tiebreak)
      .withColumn("SOURCE_HASH_KEY", Fingerprint.rowHash(hashCols.map(col)))
    val conformed = raw
      .withColumn("SOURCE_ID", lit(sourceId))
      .withColumn("SOURCE_SYSTEM_IDENTIFIER",
        concat(lit("AMAZON - "), col("INTERACTION_ID").cast("string")))
      .withColumn("INTERACTION_DATE", col("CONTACT_DATE"))
      .withColumn("HANDLE_TIME", col("INTERACTION_DURATION").cast("int"))
      .withColumn("WORK_TIME",
        (col("TOTAL_TIME") - col("INTERACTION_DURATION")).cast("int"))
      .withColumn("FIRST_CONTACT_RESOLUTION", Decode.yesNo(col("RESOLVED_IN_FIRST_CONTACT")))
      .withColumn("QUERY_STATUS", col("STATUS_OF_CUSTOMER_INCIDENT"))
      .withColumn("CUSTOMER_RATING", Decode.rescale10to5(col("RATING")))
      .withColumn("DATA_LOAD_ID", lit(dataLoadId))
    finish(
      enrichAll(conformed, dims, "AGENT_PSEUDO_NAME", "SUPPORT_CATEGORY", "TYPE_OF_CUSTOMER"),
      loadTs, endOfTime)
  }

  /** XML ("UBER") conform: durations to int seconds BEFORE hashing
    * (ETL/XML_Batch_Processing.py:139-277).
    */
  def conformXml(
      feed: DataFrame,
      dims: Dims,
      sourceId: Int,
      dataLoadId: Long,
      loadTs: String,
      tiebreak: Seq[Column],
      endOfTime: String = "2099-12-31 00:00:00"
  ): DataFrame = {
    val parsed = feed
      .withColumn("CONTACT_DURATION", Durations.hmsToSeconds(col("CONTACT_DURATION")))
      .withColumn("AFTER_CONTACT_WORK_TIME", Durations.hmsToSeconds(col("AFTER_CONTACT_WORK_TIME")))
      .withColumn(
        "DATE_OF_INTERACTION",
        date_format(to_timestamp(col("DATE_OF_INTERACTION"), SourceFormats.XmlTimestamp),
          "yyyy-MM-dd HH:mm:ss"))
    val hashCols = parsed.columns.toSeq
    val raw = Dedup
      .latestPerKey(parsed, Seq("SUPPORT_IDENTIFIER"), tiebreak)
      .withColumn("SOURCE_HASH_KEY", Fingerprint.rowHash(hashCols.map(col)))
    val conformed = raw
      .withColumn("SOURCE_ID", lit(sourceId))
      .withColumn("SOURCE_SYSTEM_IDENTIFIER",
        concat(lit("UBER - "), col("SUPPORT_IDENTIFIER").cast("string")))
      .withColumn("INTERACTION_DATE", col("DATE_OF_INTERACTION"))
      .withColumn("INTERACTION_STATUS", col("STATUS_OF_INTERACTION"))
      .withColumn("INTERACTION_TYPE", col("TYPE_OF_INTERACTION"))
      .withColumn("HANDLE_TIME", col("CONTACT_DURATION").cast("int"))
      .withColumn("WORK_TIME", col("AFTER_CONTACT_WORK_TIME").cast("int"))
      .withColumn("FIRST_CONTACT_RESOLUTION", Decode.trueFalse(col("FIRST_CONTACT_RESOLUTION")))
      .withColumn("QUERY_STATUS", col("INCIDENT_STATUS"))
      .withColumn("SOLUTION_TYPE", col("SOLUTION"))
      .withColumn("CUSTOMER_RATING", col("RATING").cast("int"))
      .withColumn("DATA_LOAD_ID", lit(dataLoadId))
    finish(
      enrichAll(conformed, dims, "AGENT_CODE", "CONTACT_REGARDING", "CUSTOMER_TYPE"),
      loadTs, endOfTime)
  }
}
