package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass every
  * training-data pipeline runs before a corpus ships. Pure
  * `regexp_count` / chained `regexp_replace` over codegen'd string
  * expressions: no UDF, no driver round-trip, embarrassingly parallel.
  *
  * The patterns deliberately stay inside the regex subset whose
  * semantics are identical between Java's engine (Spark) and RE2
  * (DuckDB, the oracle): character classes, bounded repetition, no
  * backreferences, no lookaround. Both engines scan leftmost,
  * non-overlapping, greedy — so counts and replacements agree
  * byte-for-byte.
  *
  * Redaction order matters and is fixed: emails first (their charset
  * may embed digit runs), then phones, then IPv4 — each later pattern
  * cannot match inside an earlier placeholder token.
  */
object Pii {
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re  = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe)).cast("int")
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe)).cast("int")
  def ipv4Count(c: Column): Column  = regexp_count(c, lit(Ipv4Re)).cast("int")

  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailRe), lit("[EMAIL]")),
        lit(PhoneRe),
        lit("[PHONE]")
      ),
      lit(Ipv4Re),
      lit("[IP]")
    )
}
