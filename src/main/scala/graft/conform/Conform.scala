package graft.conform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Per-source conform transforms (reference §2.8 scalar-function surface).
  * All pure `Column` compositions — codegen'd built-ins, no UDFs. The
  * reference's only UDF with real logic (U1 duration parse) is replaced
  * by split+cast (SURVEY §7.3).
  */
object Decode {
  /** 5-way rating decode WORST..BEST -> 1..5, unmatched -> NULL
    * (reference F6: ETL/CSV_Batch_Processing.py:184-190).
    */
  def rating5(c: Column): Column =
    when(c === "WORST", 1)
      .when(c === "BAD", 2)
      .when(c === "NEUTRAL", 3)
      .when(c === "GOOD", 4)
      .when(c === "BEST", 5)

  /** YES/NO -> 1/0, case-insensitive, unmatched -> NULL
    * (ETL/JSON_Batch_Processing.py:201-206). */
  def yesNo(c: Column): Column =
    when(upper(c) === "YES", 1).when(upper(c) === "NO", 0)

  /** TRUE/FALSE -> 1/0, case-insensitive, unmatched -> NULL
    * (ETL/XML_Batch_Processing.py:219-224). */
  def trueFalse(c: Column): Column =
    when(upper(c) === "TRUE", 1).when(upper(c) === "FALSE", 0)

  /** Rescale a 1-10 rating to 0-5: floor(int(r) / 2)
    * (F9: ETL/JSON_Batch_Processing.py:209 — note 1 -> 0). */
  def rescale10to5(c: Column): Column =
    floor(c.cast(IntegerType) / 2).cast(IntegerType)
}

object Durations {
  /** "H:MM:SS" -> total seconds; NULL-safe (replaces UDF U1,
    * ETL/XML_Batch_Processing.py:100-108). Pure built-ins so it stays in
    * whole-stage codegen. */
  def hmsToSeconds(c: Column): Column = {
    val parts = split(c, ":")
    (parts.getItem(0).cast(IntegerType) * 3600 +
      parts.getItem(1).cast(IntegerType) * 60 +
      parts.getItem(2).cast(IntegerType))
  }

  /** Inverse: seconds -> "H:MM:SS" (for fixtures / round-trip tests).
    * concat_ws silently drops nulls (yielding ""), so null input must be
    * short-circuited to keep the round trip null-preserving. */
  def secondsToHms(c: Column): Column =
    when(c.isNull, lit(null).cast("string")).otherwise(
      concat_ws(
        ":",
        (c / 3600).cast(IntegerType),
        lpad(((c % 3600) / 60).cast(IntegerType).cast("string"), 2, "0"),
        lpad((c % 60).cast(IntegerType).cast("string"), 2, "0")
      )
    )
}

object SourceFormats {
  /** The three source timestamp formats (F7, SURVEY §1.2). */
  val CsvTimestamp  = "MMddyyyyHHmmss"       // ETL/CSV_Batch_Processing.py:170
  val JsonTimestamp = "dd/MM/yyyy HH:mm:ss"  // ETL/JSON_Batch_Processing.py:82-84
  val XmlTimestamp  = "yyyyMMddHHmmss"       // ETL/XML_Batch_Processing.py:139-142
  /** Engine-boundary rendering (F13). */
  val SinkTimestamp = "yyyy-MM-dd HH:mm:ss"  // ETL/CSV_Batch_Processing.py:266-280
}

object Validity {
  /** Mandatory-field validity flag: 0 if any listed column is NULL else 1
    * (F6 12-way check: ETL/CSV_Batch_Processing.py:200-217). Invalid rows
    * are loaded anyway, only flagged — that contract is the caller's.
    */
  def flag(mandatory: Seq[Column]): Column =
    when(mandatory.map(_.isNull).reduce(_ || _), 0).otherwise(1)
}
