package graft

import graft.operators.HybridSearch
import org.apache.spark.sql.functions._

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  // "the" is in every doc -> df gate (70%) drops it from the index.
  private def docs = Seq(
    (0L, "the alpha beta gamma"),
    (1L, "the alpha beta"),
    (2L, "the alpha delta"),
    (3L, "the epsilon zeta"),
    (4L, "the beta gamma delta")
  ).toDF("id", "text")

  private def qids = Seq(0L).toDF("id")

  test("lexicalTopK: stop-token gate + hand-computed overlaps and ranks") {
    val out = HybridSearch
      .lexicalTopK(docs, "id", col("text"), qids, k = 10, maxDfPpm = 700000L)
      .as[(Long, Long, Int)]
      .collect()
      .map { case (q, nb, r) => (q, nb) -> r }
      .toMap
    // query 0 tokens (after dropping "the", df 5/5 > 70%):
    // alpha (df 3/5), beta (3/5), gamma (2/5) all pass df <= 3.5;
    // overlaps: doc1 {alpha,beta}=2, doc4 {beta,gamma}=2, doc2 {alpha}=1; doc3 none
    assert(out((0L, 1L)) == 1) // overlap 2, tie -> smaller id first
    assert(out((0L, 4L)) == 2) // overlap 2
    assert(out((0L, 2L)) == 3) // overlap 1
    assert(!out.contains((0L, 3L)))
    assert(!out.contains((0L, 0L))) // self excluded
  }

  test("lexicalTopK: k bounds the list") {
    val out = HybridSearch
      .lexicalTopK(docs, "id", col("text"), qids, k = 1, maxDfPpm = 700000L)
      .as[(Long, Long, Int)]
      .collect()
    assert(out.toSeq == Seq((0L, 1L, 1)))
  }

  test("rrfFuse: hand-computed fusion incl. single-leg neighbors") {
    val lex = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("query_id", "neighbor_id", "rank")
    val sem = Seq((0L, 2L, 1), (0L, 9L, 2)).toDF("query_id", "neighbor_id", "rank")
    val out = HybridSearch
      .rrfFuse(lex, sem, k0 = 60, k = 10)
      .as[(Long, Long, Long, Int)]
      .collect()
      .map { case (q, nb, s, r) => (q, nb) -> ((s, r)) }
      .toMap
    def nano(terms: Double*): Long = math.round(terms.sum * 1e9)
    // neighbor 2: in both lists (lex r2, sem r1)
    assert(out((0L, 2L)) == ((nano(1.0 / 62, 1.0 / 61), 1)))
    // neighbor 1: lex-only r1
    assert(out((0L, 1L)) == ((nano(1.0 / 61), 2)))
    // neighbor 9: sem-only r2
    assert(out((0L, 9L)) == ((nano(1.0 / 62), 3)))
  }

  test("rrfFuse: top-k cut and id tie-break") {
    // two neighbors with identical ranks in one leg each -> equal rrf;
    // smaller id wins the tie
    val lex = Seq((0L, 5L, 1)).toDF("query_id", "neighbor_id", "rank")
    val sem = Seq((0L, 3L, 1)).toDF("query_id", "neighbor_id", "rank")
    val out = HybridSearch
      .rrfFuse(lex, sem, k0 = 60, k = 1)
      .select("neighbor_id")
      .as[Long]
      .collect()
      .toSeq
    assert(out == Seq(3L))
  }

  test("lexicalTopK is deterministic under repartitioning") {
    def run(parts: Int) = HybridSearch
      .lexicalTopK(docs.repartition(parts), "id", col("text"), qids, k = 10, maxDfPpm = 700000L)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Int)]
      .collect()
      .toSeq
    assert(run(1) == run(5))
  }
}
