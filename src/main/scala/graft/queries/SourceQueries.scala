package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/format operators (SURVEY §2.1): explicit-schema CSV scan (S1),
  * key-value JSON envelope scan + nested flatten (S3/P2), XML string
  * parse (S4). Each materializes a deterministic feed FROM the testdata
  * tables, round-trips it through the real format reader, and the oracle
  * checks the final content against the original rows — so the format
  * codecs themselves are under test, not just the transforms.
  *
  * Only integer/string columns ride through the codecs (floats and
  * timestamps would re-open cross-engine rendering questions that the
  * conform queries already cover).
  */
object SourceQueries {
  private def tmpDir(s: SparkSession, kind: String, sfDir: String): String =
    TmpWorkspace.scoped(s, "graft_roundtrip", sfDir) + s"_$kind"

  private val CsvSchema = StructType(
    Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_orderpriority", StringType)
    )
  )

  private val JsonEnvelope = StructType(
    Seq(
      StructField("key", LongType),
      StructField(
        "value",
        StructType(
          Seq(
            StructField("o_custkey", LongType),
            StructField("o_orderstatus", StringType),
            StructField("o_orderpriority", StringType)
          )
        )
      )
    )
  )

  private def ordersSlice(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"))

  val OracleSlice =
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority FROM orders"

  val qs: Seq[Q] = Seq(
    // ---- S1: pipe-delimited CSV with header + explicit schema ----
    Q(
      "s1_csv_scan",
      (s, dir) => {
        val path = tmpDir(s, "csv", dir)
        ordersSlice(s, dir).write
          .mode("overwrite")
          .option("header", "true")
          .option("sep", "|")
          .csv(path)
        s.read
          .option("header", "true")
          .option("sep", "|")
          .schema(CsvSchema)
          .csv(path)
      },
      Some(OracleSlice)
    ),

    // ---- S3 + P2: JSON key/value envelope scan + nested-struct flatten ----
    Q(
      "s3_json_envelope_scan",
      (s, dir) => {
        val path = tmpDir(s, "json", dir)
        ordersSlice(s, dir)
          .select(
            col("o_orderkey").as("key"),
            struct(col("o_custkey"), col("o_orderstatus"), col("o_orderpriority")).as("value")
          )
          .write
          .mode("overwrite")
          .json(path)
        s.read
          .schema(JsonEnvelope)
          .json(path)
          .select(col("key").as("o_orderkey"), col("value.*"))
      },
      Some(OracleSlice)
    ),

    // ---- S5: ORC round-trip (the second columnar format next to
    //      parquet). Timestamps and exact cents ride through the ORC
    //      codec as native TIMESTAMP/BIGINT and come back out
    //      bit-identical; the oracle reads the original parquet, so a
    //      codec bug on either leg fails the hash. ----
    Q(
      "s5_orc_roundtrip",
      (s, dir) => {
        val path = tmpDir(s, "orc", dir)
        Tables
          .orders(s, dir)
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            col("o_orderstatus"),
            col("o_orderdate"),
            (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("price_cents")
          )
          .write
          .mode("overwrite")
          .orc(path)
        s.read
          .orc(path)
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            col("o_orderstatus"),
            date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_orderdate_s"),
            col("price_cents")
          )
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
             |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
             |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
             |FROM orders""".stripMargin)
    ),

    // ---- S4: XML string parse with explicit schema (from_xml built-in) ----
    Q(
      "s4_xml_string_parse",
      (s, dir) => {
        val xml = ordersSlice(s, dir).select(
          concat(
            lit("<RECORD><OKEY>"),
            col("o_orderkey").cast("string"),
            lit("</OKEY><CKEY>"),
            col("o_custkey").cast("string"),
            lit("</CKEY><STATUS>"),
            col("o_orderstatus"),
            lit("</STATUS><PRIORITY>"),
            col("o_orderpriority"),
            lit("</PRIORITY></RECORD>")
          ).as("payload")
        )
        val schema = StructType(
          Seq(
            StructField("OKEY", LongType),
            StructField("CKEY", LongType),
            StructField("STATUS", StringType),
            StructField("PRIORITY", StringType)
          )
        )
        xml
          .select(from_xml(col("payload"), schema).as("r"))
          .select(
            col("r.OKEY").as("o_orderkey"),
            col("r.CKEY").as("o_custkey"),
            col("r.STATUS").as("o_orderstatus"),
            col("r.PRIORITY").as("o_orderpriority")
          )
      },
      Some(OracleSlice)
    )
  )
}
