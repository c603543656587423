package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance (Levenshtein) fuzzy matching — the record-linkage
  * sibling of the token-set near-dup family in [[ApproxDedup]]: catches
  * typo-class variants ("red bolt" vs "old bolt") that shingle Jaccard
  * scores low and exact fingerprints miss entirely.
  *
  * Design for 100 TB:
  *   - candidate generation is the standard blocking scheme: rows hash
  *     to a caller-chosen block key (phonetic code, sorted-prefix,
  *     length band, ...) and only in-block pairs are ever considered —
  *     one shuffle of narrow (block, id, text) rows, never a corpus
  *     self-join;
  *   - in-block expansion follows the repo's capped-bucket discipline:
  *     rows sort by id, buckets truncate at `maxBucket` (deterministic,
  *     oracle-mirrorable, no-op on healthy blocks), and pairs emit with
  *     id_a < id_b by construction so no post-hoc distinct is needed;
  *   - the verify filter runs the cheap length-difference bound first
  *     (|len(a)-len(b)| > k can never match) and then Spark's BANDED
  *     3-arg levenshtein, which abandons a pair after the k-diagonal
  *     band — O(k * min(len)) per pair, not O(len^2), exactly the
  *     bounded-distance DP the record-linkage literature prescribes.
  */
object FuzzyDedup {
  val DefaultMaxBucket = 1024

  /** All in-block pairs (id_a < id_b) within `maxDist` edit distance.
    *
    * @param df       input
    * @param idCol    unique orderable id (drives deterministic truncation)
    * @param textCol  string to compare
    * @param blockCol blocking key — rows in different blocks are never
    *                 compared (recall is the caller's blocking choice)
    * @param maxDist  maximum Levenshtein distance (inclusive)
    */
  def blockedPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      blockCol: Column,
      maxDist: Int,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val rows = df.select(
      blockCol.as("__blk"),
      struct(idCol.as("id"), textCol.as("txt")).as("r")
    )
    // array_sort on (id, txt) structs orders by id; slice caps the
    // bucket. Pairs come from positional expansion over the SAME sorted
    // array (a at position i, b after i), so a.id < b.id always holds.
    val buckets = rows
      .groupBy(col("__blk"))
      .agg(slice(array_sort(collect_list(col("r"))), 1, maxBucket).as("rs"))
    buckets
      .select(col("rs"), posexplode(col("rs")).as(Seq("__i", "a")))
      .select(col("a"), explode(slice(col("rs"), col("__i") + lit(2), size(col("rs")))).as("b"))
      .where(
        abs(length(col("a.txt")) - length(col("b.txt"))) <= maxDist &&
          levenshtein(col("a.txt"), col("b.txt"), maxDist) >= 0
      )
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        col("a.txt").as("text_a"),
        col("b.txt").as("text_b"),
        levenshtein(col("a.txt"), col("b.txt")).cast("int").as("dist")
      )
  }
}
