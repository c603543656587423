package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Jaro-Winkler record linkage — the name-matching sibling of
  * [[FuzzyDedup]]'s edit-distance matcher: JW is the standard comparator
  * for short identity strings (names, labels, addresses) because it
  * rewards shared prefixes and under-penalizes transpositions, exactly
  * where Levenshtein over-counts. Scoring runs on the native
  * `graft_jaro_winkler` kernel (graft.functions.JaroWinkler — one static
  * call inside whole-stage codegen, bit-identical to DuckDB's builtin on
  * ASCII).
  *
  * Design for 100 TB (the blocking discipline of the record-linkage
  * literature, same shape as [[FuzzyDedup]]):
  *   - candidates come ONLY from caller-chosen blocks — one shuffle of
  *     narrow (block, id, text) rows, never a corpus self-join; recall
  *     is the blocking choice, compound keys shrink blocks;
  *   - in-block expansion sorts by id and truncates at `maxBucket`
  *     (deterministic, oracle-mirrorable, no-op on healthy blocks), and
  *     emits id_a < id_b by construction;
  *   - cross-dataset linkage elects ONE best match per left record
  *     (max score, ties to the lowest right id) with a window over the
  *     scored candidates — state per left record is one row.
  */
object EntityResolution {

  /** Column form of the native JW kernel (session must register
    * [[graft.functions.GraftExtensions]]).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler", a, b)

  /** All in-block pairs (id_a < id_b) with JW similarity >= minSim. */
  def blockedPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      blockCol: Column,
      minSim: Double,
      maxBucket: Int = FuzzyDedup.DefaultMaxBucket
  ): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0, s"minSim must be in [0,1], got $minSim")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val rows = df.select(
      blockCol.as("__blk"),
      struct(idCol.as("id"), textCol.as("txt")).as("r")
    )
    val buckets = rows
      .groupBy(col("__blk"))
      .agg(slice(array_sort(collect_list(col("r"))), 1, maxBucket).as("rs"))
    buckets
      .select(col("rs"), posexplode(col("rs")).as(Seq("__i", "a")))
      .select(col("a"), explode(slice(col("rs"), col("__i") + lit(2), size(col("rs")))).as("b"))
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        col("a.txt").as("text_a"),
        col("b.txt").as("text_b"),
        jaroWinkler(col("a.txt"), col("b.txt")).as("sim")
      )
      .where(col("sim") >= lit(minSim))
  }

  /** Cross-dataset linkage: for each left record, the single best right
    * match within its block(s) — max JW score >= minSim, score ties to
    * the lowest right id. Left records with no candidate are absent
    * (inner semantics; LEFT-join the result back for a full roster).
    *
    * The block join is a plain equi-join, so Catalyst broadcasts a
    * dim-sized right side; the election window partitions by left id —
    * its shuffle carries only scored candidates, not either corpus.
    */
  def linkBest(
      left: DataFrame,
      right: DataFrame,
      leftId: Column,
      leftText: Column,
      rightId: Column,
      rightText: Column,
      leftBlock: Column,
      rightBlock: Column,
      minSim: Double
  ): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0, s"minSim must be in [0,1], got $minSim")
    val l = left.select(leftId.as("left_id"), leftText.as("left_text"), leftBlock.as("__blk"))
    val r = right.select(rightId.as("right_id"), rightText.as("right_text"), rightBlock.as("__blk"))
    val scored = l
      .join(r, "__blk")
      .select(
        col("left_id"),
        col("left_text"),
        col("right_id"),
        col("right_text"),
        jaroWinkler(col("left_text"), col("right_text")).as("sim")
      )
      .where(col("sim") >= lit(minSim))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("left_id"))
      .orderBy(col("sim").desc, col("right_id").asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
