package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The three source-feed readers of the reference system, as library API
  * (SURVEY §2.1 S1/S3/S4). Schemas are explicit and programmer-declared —
  * never inferred — matching the reference's contract
  * (ETL/CSV_Batch_Processing.py:49-67 etc.).
  */
object Feeds {
  /** S1 — "AT&T" pipe-delimited CSV feed, header row present, explicit
    * 13-column schema (ETL/CSV_Batch_Processing.py:49-65).
    */
  val CsvTicketSchema: StructType = StructType(
    Seq(
      StructField("TICKET_IDENTIFIER", IntegerType),
      StructField("SUPPORT_CATEGORY", StringType),
      StructField("AGENT_NAME", StringType),
      StructField("DATE_OF_CALL", StringType),
      StructField("CALL_STATUS", StringType),
      StructField("CALL_TYPE", StringType),
      StructField("TYPE_OF_CUSTOMER", StringType),
      StructField("DURATION", IntegerType),
      StructField("WORK_TIME", IntegerType),
      StructField("TICKET_STATUS", StringType),
      StructField("RESOLVED_IN_FIRST_CONTACT", IntegerType),
      StructField("RESOLUTION_CATEGORY", StringType),
      StructField("RATING", StringType)
    )
  )

  def readCsvFeed(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", "|")
      .schema(CsvTicketSchema)
      .csv(path)

  /** S3 — "AMAZON" JSON documents under a {key, value:{...}} envelope
    * (ETL/JSON_Batch_Processing.py:54-77). `keyWatermark` replicates the
    * key-value store's `key > cursor` incremental range scan; the filter
    * is a plain predicate so it pushes into the scan.
    */
  val JsonInteractionSchema: StructType = StructType(
    Seq(
      StructField("key", LongType),
      StructField(
        "value",
        StructType(
          Seq(
            StructField("INTERACTION_ID", IntegerType),
            StructField("SUPPORT_CATEGORY", StringType),
            StructField("AGENT_PSEUDO_NAME", StringType),
            StructField("CONTACT_DATE", StringType),
            StructField("INTERACTION_STATUS", StringType),
            StructField("INTERACTION_TYPE", StringType),
            StructField("TYPE_OF_CUSTOMER", StringType),
            StructField("INTERACTION_DURATION", IntegerType),
            StructField("TOTAL_TIME", IntegerType),
            StructField("STATUS_OF_CUSTOMER_INCIDENT", StringType),
            StructField("RESOLVED_IN_FIRST_CONTACT", StringType),
            StructField("SOLUTION_TYPE", StringType),
            StructField("RATING", IntegerType)
          )
        )
      )
    )
  )

  def readJsonFeed(spark: SparkSession, path: String, keyWatermark: Long): DataFrame =
    spark.read
      .schema(JsonInteractionSchema)
      .json(path)
      .where(col("key") > keyWatermark)
      .select(col("key"), col("value.*"))

  /** S4 — "UBER" XML payload strings (one <RECORD> per message,
    * ETL/XML_Batch_Processing.py:112-129), parsed executor-side with the
    * Spark 4 built-in `from_xml` — the reference parsed driver-side with
    * ElementTree, which cannot scale past one machine.
    */
  val XmlRecordSchema: StructType = StructType(
    Seq(
      StructField("SUPPORT_IDENTIFIER", IntegerType),
      StructField("CONTACT_REGARDING", StringType),
      StructField("AGENT_CODE", StringType),
      StructField("DATE_OF_INTERACTION", StringType),
      StructField("STATUS_OF_INTERACTION", StringType),
      StructField("TYPE_OF_INTERACTION", StringType),
      StructField("CUSTOMER_TYPE", StringType),
      StructField("CONTACT_DURATION", StringType),
      StructField("AFTER_CONTACT_WORK_TIME", StringType),
      StructField("INCIDENT_STATUS", StringType),
      StructField("FIRST_CONTACT_RESOLUTION", StringType),
      StructField("SOLUTION", StringType),
      StructField("RATING", StringType),
      StructField("TIME_STAMP", StringType)
    )
  )

  /** Parse a DataFrame column of XML strings into the record schema. */
  def parseXmlPayload(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("__rec", from_xml(col(payloadCol), XmlRecordSchema))
      .select(col("*"), col("__rec.*"))
      .drop("__rec", payloadCol)
}
