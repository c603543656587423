package graft

import graft.operators.Bm25
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("BM25: matches the closed-form score on a hand-checkable corpus") {
    // corpus: 4 docs, dl = 4,4,2,2 -> N=4, sumdl=12, avgdl=3
    val docs = Seq(
      (1L, "cat dog cat fish"),
      (2L, "dog dog bird fish"),
      (3L, "cat cat"),
      (4L, "bird fish")
    ).toDF("id", "text")
    val got = Bm25
      .scoreAll(docs, "id", col("text"), terms = Seq("cat"), k1 = 1.2, b = 0.75)
      .select(col("id"), col("bm25_micro"))
      .as[(Long, Long)]
      .collect()
      .toMap

    val (n, avgdl, df) = (4.0, 3.0, 2.0)
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def score(tf: Double, dl: Double): Long =
      math.round(idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) * 1e6)
    assert(got(1L) == score(2, 4))
    assert(got(3L) == score(2, 2))
    assert(got(2L) == 0L && got(4L) == 0L) // no occurrences -> zero score
    // shorter doc with the same tf outranks the longer one (length norm)
    assert(got(3L) > got(1L))
  }

  test("rare terms dominate: idf ordering over equal tf") {
    val docs = Seq(
      (1L, "common rare"),
      (2L, "common other"),
      (3L, "common other"),
      (4L, "common other")
    ).toDF("id", "text")
    val s = Bm25
      .scoreAll(docs, "id", col("text"), terms = Seq("common", "rare"))
      .select(col("id"), col("bm25_micro"))
      .as[(Long, Long)]
      .collect()
      .toMap
    // doc 1 scores common+rare; others only common — and the rare-term
    // contribution exceeds the common one inside doc 1's score
    assert(s(1L) > 2 * s(2L))
  }
}
