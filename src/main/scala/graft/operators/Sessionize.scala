package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: assign every event a per-key session
  * ordinal, where a new session starts whenever the gap to the previous
  * event of the same key exceeds `gapSeconds`. The standard
  * training-data-pipeline step for turning raw event logs into
  * behavioral windows (and the batch twin of Structured Streaming's
  * `session_window`).
  *
  * Shape: one hash shuffle by key + one sort by (ts, tiebreak); the
  * session boundary is a `lag` comparison and the ordinal a running
  * `sum` over the SAME window frame, so Spark evaluates both in a
  * single WindowExec pass — linear in events, independent of session
  * count. Gap arithmetic is integer microseconds (`unix_micros`), which
  * DuckDB mirrors exactly with `epoch_us`.
  *
  * `tiebreak` makes ordering total when two events of a key share a
  * timestamp — REQUIRED for deterministic session ordinals on any
  * engine (pass the event id).
  */
object Sessionize {
  def withSessionIds(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tiebreak: String,
      gapSeconds: Long
  ): DataFrame = {
    val gapMicros = gapSeconds * 1000000L
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tiebreak).asc)
    val prevTs: Column = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew: Column =
      when(prevTs.isNull || unix_micros(col(tsCol)) - prevTs > gapMicros, 1L).otherwise(0L)
    events
      .withColumn("session_seq", sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup over the sessionized frame: bounds + size, the
    * usual downstream of sessionization. One extra shuffle on
    * (key, session_seq) with partial aggregation map-side.
    */
  def sessionSummary(
      sessionized: DataFrame,
      keyCol: String,
      tsCol: String
  ): DataFrame =
    sessionized
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end")
      )
}
