package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Row fingerprinting — the change-detection primitive of the CDC/SCD2
  * pipeline (reference: ETL/CSV_Batch_Processing.py:80-83).
  *
  * Contract (must stay byte-stable — everything downstream keys off it):
  *   - each column is rendered via CAST(col AS STRING)
  *   - NULL renders as the literal string "NULL"
  *   - columns are joined with "||" in the caller-supplied order
  *   - the fingerprint is the lowercase-hex md5 of that canonical string
  *
  * Composed entirely from codegen'd built-ins (md5/concat_ws/coalesce) —
  * no UDF, no custom Expression — so it stays inside whole-stage codegen
  * and is computed executor-side with zero shuffle.
  */
object Fingerprint {
  val NullToken = "NULL"
  val Separator = "||"

  /** Canonical string rendering of one column for hashing. */
  def canonical(c: Column): Column = coalesce(c.cast(StringType), lit(NullToken))

  /** md5 fingerprint over the given columns, in the given order. */
  def rowHash(cols: Seq[Column]): Column =
    md5(concat_ws(Separator, cols.map(canonical): _*))

  /** First 15 hex chars of a hex string as a non-negative Long (60 bits).
    * Used to derive stable integer hashes from md5 — portable across
    * engines (same construction is expressible in ANSI SQL).
    */
  def hexToLong(hex: Column): Column =
    conv(substring(hex, 1, 15), 16, 10).cast(LongType)

  /** Seeded, engine-portable 60-bit hash of a string column.
    * hash_i(x) = int(md5(i ":" x)[0:15], 16). Deterministic, uniform
    * enough for MinHash/LSH; no dependence on JVM/Murmur internals.
    */
  def seededLongHash(c: Column, seed: Int): Column =
    hexToLong(md5(concat(lit(s"$seed:"), c)))
}
