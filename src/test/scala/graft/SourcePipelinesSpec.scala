package graft

import graft.conform.SourcePipelines
import graft.conform.SourcePipelines.Dims
import org.apache.spark.sql.functions._

/** The three per-source conform pipelines against FIXTURES.md-shaped
  * inputs: 21-column output in the reference's order, hash-before-prefix
  * canon, lookup null-passthrough, per-source decoders.
  */
class SourcePipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def dims: Dims = Dims(
    agents = Seq(("STHOMPSON", 1), ("JDOE", 11), ("IGONZALEZ", 21))
      .toDF("PSEUDO_CODE", "AGENT_ID"),
    supportAreas = Seq(("BILLING", 2), ("SHIPPING", 12), ("RIDES", 22))
      .toDF("SUPPORT_AREA_NAME", "SUPPORT_AREA_ID"),
    customerTypes = Seq(("PREPAID", 3), ("PRIME", 13), ("DRIVER", 23))
      .toDF("CUSTOMER_TYPE_NAME", "CUSTOMER_TYPE_ID")
  )

  test("CSV conform: 21 columns, raw-column hash, decoded rating, lookups") {
    val feed = Seq(
      (7, "BILLING", "STHOMPSON", "01152024103000", "COMPLETED", "CALL",
        "PREPAID", 300, 60, "RESOLVED", 1, "SELF-HELP OPTION", "GOOD"),
      (8, "UNKNOWN AREA", null.asInstanceOf[String], "01152024103000", "DROPPED", "CHAT",
        "PREPAID", 200, 40, "PENDING RESOLUTION", 0, "SELF-HELP OPTION", "WORST")
    ).toDF("TICKET_IDENTIFIER", "SUPPORT_CATEGORY", "AGENT_NAME", "DATE_OF_CALL",
      "CALL_STATUS", "CALL_TYPE", "TYPE_OF_CUSTOMER", "DURATION", "WORK_TIME",
      "TICKET_STATUS", "RESOLVED_IN_FIRST_CONTACT", "RESOLUTION_CATEGORY", "RATING")
    val out = SourcePipelines.conformCsv(
      feed, dims, sourceId = 1, dataLoadId = 100L,
      loadTs = "2024-06-01 00:00:00", tiebreak = Seq(col("TICKET_IDENTIFIER")))
    assert(out.columns.toSeq == SourcePipelines.MartColumns)

    val rows = out.orderBy("SOURCE_SYSTEM_IDENTIFIER").collect()
    val r7 = rows(0)
    assert(r7.getAs[String]("SOURCE_SYSTEM_IDENTIFIER") == "AT&T - 7")
    assert(r7.getAs[Int]("AGENT_ID") == 1)
    assert(r7.getAs[Int]("SUPPORT_AREA_ID") == 2)
    assert(r7.getAs[Int]("CUSTOMER_TYPE_ID") == 3)
    assert(r7.getAs[Int]("CUSTOMER_RATING") == 4) // GOOD -> 4
    assert(r7.getAs[String]("INTERACTION_DATE") == "2024-01-15 10:30:00")
    assert(r7.getAs[Int]("IS_VALID_DATA") == 1)

    // hash covers the RAW columns, not the conformed ones, and not the prefix
    val expectedHash = spark
      .sql("""SELECT md5(concat_ws('||', '7', 'BILLING', 'STHOMPSON',
              '01152024103000', 'COMPLETED', 'CALL', 'PREPAID', '300', '60',
              'RESOLVED', '1', 'SELF-HELP OPTION', 'GOOD'))""")
      .head().getString(0)
    assert(r7.getAs[String]("SOURCE_HASH_KEY") == expectedHash)

    // unmatched lookups -> null ids -> invalid row, still loaded
    val r8 = rows(1)
    assert(r8.isNullAt(r8.fieldIndex("AGENT_ID")))
    assert(r8.isNullAt(r8.fieldIndex("SUPPORT_AREA_ID")))
    assert(r8.getAs[Int]("CUSTOMER_RATING") == 1) // WORST -> 1
    assert(r8.getAs[Int]("IS_VALID_DATA") == 0)
  }

  test("JSON conform: timestamp hashed post-parse, WORK_TIME derived, rating rescaled") {
    val feed = Seq(
      (42, "SHIPPING", "JDOE", "15/01/2024 10:30:00", "COMPLETED", "CHAT",
        "PRIME", 120, 300, "RESOLVED", "YES", "SELF-HELP OPTION", 9)
    ).toDF("INTERACTION_ID", "SUPPORT_CATEGORY", "AGENT_PSEUDO_NAME", "CONTACT_DATE",
      "INTERACTION_STATUS", "INTERACTION_TYPE", "TYPE_OF_CUSTOMER",
      "INTERACTION_DURATION", "TOTAL_TIME", "STATUS_OF_CUSTOMER_INCIDENT",
      "RESOLVED_IN_FIRST_CONTACT", "SOLUTION_TYPE", "RATING")
    val out = SourcePipelines.conformJson(
      feed, dims, sourceId = 2, dataLoadId = 101L,
      loadTs = "2024-06-01 00:00:00", tiebreak = Seq(col("INTERACTION_ID")))
    val r = out.head()
    assert(r.getAs[String]("SOURCE_SYSTEM_IDENTIFIER") == "AMAZON - 42")
    assert(r.getAs[Int]("WORK_TIME") == 180)                // TOTAL - DURATION
    assert(r.getAs[Int]("FIRST_CONTACT_RESOLUTION") == 1)   // YES
    assert(r.getAs[Int]("CUSTOMER_RATING") == 4)            // floor(9/2)
    // hash input contains the PARSED date, per the reference's hash canon
    val expectedHash = spark
      .sql("""SELECT md5(concat_ws('||', '42', 'SHIPPING', 'JDOE',
              '2024-01-15 10:30:00', 'COMPLETED', 'CHAT', 'PRIME', '120',
              '300', 'RESOLVED', 'YES', 'SELF-HELP OPTION', '9'))""")
      .head().getString(0)
    assert(r.getAs[String]("SOURCE_HASH_KEY") == expectedHash)
  }

  test("XML conform: durations hashed as ints, TRUE/FALSE decode, latest TIME_STAMP wins") {
    val feed = Seq(
      // same id twice: later TIME_STAMP must win the dedup
      ("5", "RIDES", "IGONZALEZ", "20240115103000", "INTERACTION COMPLETED", "CALL",
        "DRIVER", "0:05:00", "0:01:00", "RESOLVED", "TRUE", "SELF-HELP OPTION", "4",
        "2024/01/15 10:31:00"),
      ("5", "RIDES", "IGONZALEZ", "20240115103000", "CUSTOMER DROPPED", "CALL",
        "DRIVER", "0:06:40", "0:01:40", "PENDING RESOLUTION", "FALSE", "SELF-HELP OPTION", "2",
        "2024/01/15 11:00:00")
    ).toDF("SUPPORT_IDENTIFIER", "CONTACT_REGARDING", "AGENT_CODE", "DATE_OF_INTERACTION",
      "STATUS_OF_INTERACTION", "TYPE_OF_INTERACTION", "CUSTOMER_TYPE", "CONTACT_DURATION",
      "AFTER_CONTACT_WORK_TIME", "INCIDENT_STATUS", "FIRST_CONTACT_RESOLUTION", "SOLUTION",
      "RATING", "TIME_STAMP")
    val out = SourcePipelines.conformXml(
      feed, dims, sourceId = 3, dataLoadId = 102L,
      loadTs = "2024-06-01 00:00:00", tiebreak = Seq(col("TIME_STAMP").desc))
    assert(out.count() == 1)
    val r = out.head()
    assert(r.getAs[String]("SOURCE_SYSTEM_IDENTIFIER") == "UBER - 5")
    assert(r.getAs[String]("INTERACTION_STATUS") == "CUSTOMER DROPPED") // latest won
    assert(r.getAs[Int]("HANDLE_TIME") == 400)  // 0:06:40
    assert(r.getAs[Int]("WORK_TIME") == 100)    // 0:01:40
    assert(r.getAs[Int]("FIRST_CONTACT_RESOLUTION") == 0)
    assert(r.getAs[Int]("CUSTOMER_RATING") == 2)
    assert(r.getAs[Int]("IS_VALID_DATA") == 1)
  }
}
