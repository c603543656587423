package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (as-of) join: each event row is enriched with the
  * version row that was ACTIVE at the event's timestamp — the natural
  * companion of the SCD2 mart (the reference's "historic probe",
  * `ETL/DB_Lookup.py:24-54` + `Setup/SQL_DDL_Script.sql:136-163`, asks
  * this for ONE point in time; this operator answers it per event row).
  *
  * Spark-first formulation — NOT a range join: a theta-join on
  * `e.key = v.key AND e.ts >= v.from` degenerates to a per-key nested
  * loop (every event x every version of its key). Instead:
  *
  *   1. tag both sides and UNION them into one (key, ts, isVersion,
  *      payload) stream;
  *   2. one hash shuffle by key, sort by (ts, isVersion DESC) — versions
  *      sort before events at equal timestamps, so a version taking
  *      effect exactly at the event instant is visible to it;
  *   3. `last(versionPayload, ignoreNulls).over(unboundedPreceding ..
  *      currentRow)` carries the most recent version forward;
  *   4. keep only event rows.
  *
  * Cost: ONE shuffle of |events| + |versions| narrow rows and one sort —
  * the same shape as any windowed dedup, linear in input, independent of
  * versions-per-key. At 100 TB this is the difference between a pass and
  * a quadratic blowup on hot keys.
  *
  * Contract: `(vKeyCol, vTsCol)` must be unique in `versions` (dedup
  * with `Dedup.latestPerKey` first if not) — ties would make "the"
  * active version ambiguous on any engine. Events with no version at or
  * before their timestamp get NULL version fields (left-join semantics,
  * mirroring DuckDB's `ASOF LEFT JOIN`).
  */
object AsOfJoin {
  def enrich(
      events: DataFrame,
      versions: DataFrame,
      keyCol: String,
      tsCol: String,
      vKeyCol: String,
      vTsCol: String
  ): DataFrame = {
    val vPayloadCols = versions.columns.filterNot(c => c == vKeyCol || c == vTsCol).toSeq
    require(vPayloadCols.nonEmpty, "versions must carry at least one payload column")
    val epType = StructType(events.schema.fields)
    val vpType = StructType(versions.schema.fields.filter(f => vPayloadCols.contains(f.name)))

    val v = versions.select(
      col(vKeyCol).as("__k"),
      col(vTsCol).as("__ts"),
      lit(1).as("__isv"),
      struct(vPayloadCols.map(col): _*).as("__vp"),
      lit(null).cast(epType).as("__ep")
    )
    val e = events.select(
      col(keyCol).as("__k"),
      col(tsCol).as("__ts"),
      lit(0).as("__isv"),
      lit(null).cast(vpType).as("__vp"),
      struct(events.columns.map(col): _*).as("__ep")
    )

    val w = Window
      .partitionBy("__k")
      .orderBy(col("__ts").asc, col("__isv").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    v.unionByName(e)
      .withColumn("__active", last(col("__vp"), ignoreNulls = true).over(w))
      .where(col("__isv") === 0)
      .select(col("__ep.*") +: vPayloadCols.map(c => col("__active").getField(c).as(c)): _*)
  }
}
