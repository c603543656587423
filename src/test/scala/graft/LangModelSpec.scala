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
