package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimension-lookup enrichment — replaces the reference's per-row UDF +
  * SQLite queries (S6/J2/U2-U4: ETL/DB_Lookup.py:24-54,
  * ETL/CSV_Batch_Processing.py:91-147) with broadcast left joins.
  *
  * Semantics preserved exactly:
  *   - dimension filtered to ACTIVE_FLAG=1 rows of the requesting source
  *   - top-1 per lookup key by START_DATE desc (the reference's
  *     ORDER BY START_DATE DESC ... fetchone())
  *   - NULL lookup value in -> NULL id out (left-join semantics give the
  *     reference's None passthrough for free)
  *
  * Scale notes: dimensions are tiny (10s of rows per source in the
  *   reference); `broadcast()` pins a broadcast-hash join so the fact-side
  *   scan never shuffles. Per-row correctness is now a single distributed
  *   join instead of |rows| synchronous DB round-trips.
  */
object Lookup {
  /** Prepare a dimension for joining: filter, project, keep the latest
    * active row per key (deterministic tiebreak on idCol).
    */
  def prepareDim(
      dim: DataFrame,
      keyCol: String,
      idCol: String,
      orderCol: String,
      activeFilter: Column
  ): DataFrame =
    Dedup.latestPerKey(
      dim.where(activeFilter).select(col(keyCol), col(idCol), col(orderCol)),
      keys = Seq(keyCol),
      tiebreak = Seq(col(orderCol).desc, col(idCol).desc)
    ).drop(orderCol)

  /** Broadcast left-join enrichment: attach `dim(idCol)` as `outCol` by
    * matching `df(dfKey)` to `dim(dimKey)`.
    */
  def enrich(
      df: DataFrame,
      dim: DataFrame,
      dfKey: String,
      dimKey: String,
      idCol: String,
      outCol: String
  ): DataFrame = {
    val d = dim.select(col(dimKey).as("__graft_dim_key"), col(idCol).as(outCol))
    df.join(broadcast(d), df(dfKey) === col("__graft_dim_key"), "left")
      .drop("__graft_dim_key")
  }
}
