package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record deduplication (reference W1:
  * ETL/CSV_Batch_Processing.py:69-77 and 3× siblings).
  *
  * The reference's window ordered by the partition key itself, making the
  * "latest" pick nondeterministic among duplicates (SURVEY §2.5). We
  * require an explicit, deterministic tiebreak and document the
  * divergence: with a real tiebreak the result is a function of the data.
  *
  * Scale notes: one shuffle on the key (WindowExec). For skewed keys AQE
  * splits oversized partitions; for the common "latest per business key"
  * case the alternative max-join formulation is also provided, which
  * enables partial (map-side) aggregation and is cheaper when the
  * duplicate factor is high.
  */
object Dedup {
  private val RowNum = "__graft_rn"

  /** Keep exactly one row per key: the first under `tiebreak` ordering
    * (pass `desc` columns for latest-wins).
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn(RowNum, row_number().over(w))
      .where(col(RowNum) === 1)
      .drop(RowNum)
  }

  /** Max-per-group formulation of latest-wins for a single numeric/ordered
    * version column (reference J3/A2 — the correlated MAX(ARCHIVE_ID)
    * subquery, ETL/XML_Batch_Processing.py:395-397). Two-phase hash
    * aggregation (partial + final) instead of a full window sort; joins
    * back on (key, version). Prefer when versions are unique per key.
    */
  def latestByVersion(df: DataFrame, key: String, version: String): DataFrame = {
    val maxed = df.groupBy(col(key)).agg(max(col(version)).as(version))
    df.join(maxed, Seq(key, version), "left_semi")
  }

  /** Exact duplicate groups by content columns: one representative row id
    * (min) plus the duplicate count per distinct content fingerprint.
    * Single hash-aggregate pass; the md5 keeps the shuffle key narrow
    * even when the content columns are wide (e.g. document text).
    */
  def exactGroups(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame = {
    import graft.functions.Fingerprint
    df.select(col(idCol), Fingerprint.rowHash(contentCols.map(col)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
  }

  /** Exact deduplication: keep the representative (min id) row per
    * distinct content. Equivalent to a narrow-key variant of
    * `dropDuplicates(contentCols)` but with a deterministic survivor.
    */
  def exact(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame = {
    val keep = exactGroups(df, contentCols, idCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
