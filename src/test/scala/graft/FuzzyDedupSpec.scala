package graft

import graft.operators.FuzzyDedup
import org.apache.spark.sql.functions._

class FuzzyDedupSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String, String)], maxDist: Int, maxBucket: Int = 1024) =
    FuzzyDedup
      .blockedPairs(
        rows.toDF("id", "txt", "blk"),
        col("id"),
        col("txt"),
        col("blk"),
        maxDist,
        maxBucket
      )
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)]
      .collect()
      .toSet

  test("in-block pairs within threshold, id_a < id_b, cross-block never compared") {
    val rows = Seq(
      (1L, "red bolt", "bolt"),
      (2L, "old bolt", "bolt"),   // dist 2 from "red bolt"
      (3L, "blue bolt", "bolt"),  // dist 3/4 from the others
      (4L, "red bolts", "bolts")  // other block: never compared
    )
    assert(pairs(rows, maxDist = 2) == Set((1L, 2L, 2)))
    // widening the threshold admits the farther pairs too
    assert(pairs(rows, maxDist = 4) == Set((1L, 2L, 2), (1L, 3L, 4), (2L, 3L, 3)))
  }

  test("equal strings in one block match at distance 0 even with maxDist 0") {
    val rows = Seq((5L, "same", "b"), (9L, "same", "b"), (7L, "off", "b"))
    assert(pairs(rows, maxDist = 0) == Set((5L, 9L, 0)))
  }

  test("bucket cap truncates deterministically to the lowest ids") {
    val rows = (1L to 10L).map(i => (i, s"v$i", "b"))
    // cap 3 keeps ids 1,2,3 -> C(3,2)=3 comparisons; "v1".."v3" differ by 1 char
    val got = pairs(rows, maxDist = 1, maxBucket = 3)
    assert(got == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("banded verify equals the plain levenshtein predicate on real part names") {
    val canon = Tables
      .part(spark, Sf)
      .groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("id"))
    val blocked = FuzzyDedup
      .blockedPairs(
        canon,
        col("id"),
        col("p_name"),
        element_at(split(col("p_name"), " "), 2),
        maxDist = 2
      )
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val naive = canon
      .select(col("id").as("id_a"), col("p_name").as("a"), element_at(split(col("p_name"), " "), 2).as("blk"))
      .join(
        canon.select(col("id").as("id_b"), col("p_name").as("b"), element_at(split(col("p_name"), " "), 2).as("blk")),
        Seq("blk")
      )
      .where(col("id_a") < col("id_b") && levenshtein(col("a"), col("b")) <= 2)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(blocked == naive && blocked.nonEmpty)
  }
}
