package graft

import graft.operators.LangModel
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b a b"),
    (2L, "a b c"),
    (3L, "x"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("bigram model: micro-scaled transition probabilities normalize per context") {
    val model = LangModel
      .bigramModel(LangModel.transitions(corpus, "doc_id", "text"))
      .as[(String, String, Long)]
      .collect()
      .map { case (w1, w2, p) => (w1, w2) -> p }
      .toMap
    // c(a,b)=3 of c(a,.)=3 -> 1e6; c(b,a)=1, c(b,c)=1 of c(b,.)=2 -> 5e5 each
    assert(model == Map(
      ("a", "b") -> 1000000L,
      ("b", "a") -> 500000L,
      ("b", "c") -> 500000L
    ))
  }

  test("self-trained scores are exact integer means; short docs score -1") {
    val t     = LangModel.transitions(corpus, "doc_id", "text")
    val model = LangModel.bigramModel(LangModel.transitions(corpus, "doc_id", "text"))
    val got = LangModel
      .scoreDocs(t, model, "doc_id")
      .as[(Long, Long, Long)]
      .collect()
      .map { case (id, n, sc) => id -> ((n, sc)) }
      .toMap
    // d1: (1e6 + 5e5 + 1e6) div 3 = 833333; d2: (1e6 + 5e5) div 2 = 750000
    assert(got == Map(
      1L -> ((3L, 833333L)),
      2L -> ((2L, 750000L)),
      3L -> ((0L, -1L)),
      4L -> ((0L, -1L))
    ))
  }

  test("ccnet buckets: per-language tercile thresholds, ties share a bucket") {
    // lang L: scores 10,20,30,40,50,60 -> n=6, t1 = min score with 3*cum>=6
    // (cum(20)=2 -> 6>=6, t1=20), t2 = min with 3*cum>=12 (cum(40)=4 ->
    // 12>=12, t2=40): tail {10,20}, middle {30,40}, head {50,60}.
    // lang M: all-equal scores -> t1=t2=7, everything is tail (threshold
    // semantics: no score exceeds the boundary, so ties never split).
    val scored = Seq(
      (1L, "L", 10L), (2L, "L", 20L), (3L, "L", 30L),
      (4L, "L", 40L), (5L, "L", 50L), (6L, "L", 60L),
      (7L, "M", 7L), (8L, "M", 7L), (9L, "M", 7L)
    ).toDF("doc_id", "lang", "score_micro")
    val got = LangModel
      .perplexityBuckets(scored, "doc_id", "lang", "score_micro")
      .select(col("doc_id"), col("t1"), col("t2"), col("bucket"))
      .as[(Long, Long, Long, String)]
      .collect()
      .map { case (id, t1, t2, b) => id -> ((t1, t2, b)) }
      .toMap
    assert(got == Map(
      1L -> ((20L, 40L, "tail")), 2L -> ((20L, 40L, "tail")),
      3L -> ((20L, 40L, "middle")), 4L -> ((20L, 40L, "middle")),
      5L -> ((20L, 40L, "head")), 6L -> ((20L, 40L, "head")),
      7L -> ((7L, 7L, "tail")), 8L -> ((7L, 7L, "tail")), 9L -> ((7L, 7L, "tail"))
    ))
  }

  test("ccnet buckets: boundary thresholds broadcast — no corpus-sized window") {
    val scored = Seq((1L, "L", 10L), (2L, "L", 20L), (3L, "L", 30L))
      .toDF("doc_id", "lang", "score_micro")
    val plan = LangModel
      .perplexityBuckets(scored, "doc_id", "lang", "score_micro")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"per-language bounds must broadcast back over the corpus:\n$plan")
  }

  test("foreign-model scoring: unseen transitions contribute zero, not a miss") {
    val model = LangModel.bigramModel(LangModel.transitions(corpus, "doc_id", "text"))
    val other = Seq((9L, "a b z")).toDF("doc_id", "text")
    val got = LangModel
      .scoreDocs(LangModel.transitions(other, "doc_id", "text"), model, "doc_id")
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    // (a,b) seen at 1e6, (b,z) unseen -> (1e6 + 0) div 2
    assert(got == Seq((9L, 2L, 500000L)))
  }
}
