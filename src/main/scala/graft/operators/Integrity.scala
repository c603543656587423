package graft.operators

import graft.functions.Fingerprint
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table content digests — the replica-diff / migration-audit primitive:
  * "are these two copies of the mart the same, and if not, WHERE do they
  * differ?" answered without sorting or co-locating either side.
  *
  * The digest of a group is the SUM (mod 2^60) of the 60-bit md5 of each
  * row's canonical fingerprint ([[Fingerprint.rowHash]] canon — the same
  * byte-stable contract the CDC pipeline keys on), plus the row count.
  * Sum — not xor — so duplicate rows accumulate instead of cancelling:
  * the digest is a MULTISET invariant. Commutative + associative means
  * partial aggregation map-side, no ordering requirement, no shuffle
  * beyond the one group agg; two replicas digest independently (even on
  * different engines — the construction is ANSI-SQL-expressible) and
  * only the group-sized digest tables travel. Accumulation is exact
  * decimal(38) then mod, so no engine-specific overflow semantics leak
  * into the result.
  *
  * Collision risk: forging an equal digest+count from different content
  * requires hitting a 60-bit modular sum — fine for drift DETECTION
  * (the use case), not an adversarial MAC.
  */
object Integrity {
  /** 2^60 — digests stay far inside BIGINT range in every engine. */
  val DigestMod: Long = 1L << 60

  /** Per-group (n_rows, digest) over the given value columns. */
  def contentDigest(
      df: DataFrame,
      groupCols: Seq[Column],
      valueCols: Seq[Column]
  ): DataFrame = {
    require(groupCols.nonEmpty, "contentDigest needs at least one group column")
    require(valueCols.nonEmpty, "contentDigest needs at least one value column")
    val h = Fingerprint.hexToLong(Fingerprint.rowHash(valueCols))
    df.groupBy(groupCols: _*)
      .agg(
        count(lit(1)).as("n_rows"),
        (sum(h.cast("decimal(38,0)")) % lit(DigestMod)).cast("long").as("digest")
      )
  }

  /** Groups whose content differs between `left` and `right` (either
    * side missing, row count drift, or content drift at equal counts).
    * Input group/value columns must be identically named on both sides.
    * Only the digest tables join — never the data.
    */
  def diffDigests(
      left: DataFrame,
      right: DataFrame,
      groupCols: Seq[String],
      valueCols: Seq[String]
  ): DataFrame = {
    val gl = groupCols.map(col)
    val vl = valueCols.map(col)
    val a = contentDigest(left, gl, vl)
      .withColumnRenamed("n_rows", "n_rows_left")
      .withColumnRenamed("digest", "digest_left")
    val b = contentDigest(right, gl, vl)
      .withColumnRenamed("n_rows", "n_rows_right")
      .withColumnRenamed("digest", "digest_right")
    a.join(b, groupCols, "full_outer")
      .where(
        col("n_rows_left").isNull || col("n_rows_right").isNull ||
          col("n_rows_left") =!= col("n_rows_right") ||
          col("digest_left") =!= col("digest_right")
      )
  }
}
