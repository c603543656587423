package graft

import graft.operators.LangProfile
import org.apache.spark.sql.functions._

class LangProfileSpec extends SparkSpec {
  import spark.implicits._

  // three synthetic "languages" with disjoint character inventories —
  // separable the way real languages are (the sf fixture's word-salad
  // shares one vocabulary across langs, so resubstitution accuracy
  // there reflects the data, not the method)
  private def sentence(words: Seq[String], seed: Int, n: Int): String =
    Seq.tabulate(n)(i => words((seed * 31 + i * 7) % words.size)).mkString(" ")
  private val wordsA = Seq("aba", "cab", "bac", "abba", "caba")
  private val wordsB = Seq("xyx", "zyx", "yxz", "xyzzy", "zxy")
  private val wordsC = Seq("mom", "non", "mno", "onom", "nomo")

  private def corpus(start: Long, perLang: Int) =
    (0 until perLang).flatMap { k =>
      Seq(
        (start + 3 * k, "aa", sentence(wordsA, k, 12)),
        (start + 3 * k + 1, "bb", sentence(wordsB, k, 12)),
        (start + 3 * k + 2, "cc", sentence(wordsC, k, 12))
      )
    }.toDF("doc_id", "lang", "text")

  test("disjoint-alphabet languages classify perfectly, including held-out docs") {
    val train = corpus(0, 8)
    val profiles = LangProfile.train(train, "lang", "text", topN = 30)
    assert(profiles.groupBy("lang").count().as[(String, Long)].collect()
      .forall(_._2 <= 30))
    // held-out docs drawn from the same distributions (different seeds)
    val test_ = corpus(1000, 5)
    val out = LangProfile.classify(test_, profiles, "doc_id", "text", topN = 30)
      .join(test_.select(col("doc_id"), col("lang")), "doc_id")
    assert(out.where(col("pred_lang") =!= col("lang")).count() === 0)
  }

  test("docs shorter than 3 chars yield no trigrams and no prediction") {
    val train = corpus(0, 4)
    val profiles = LangProfile.train(train, "lang", "text", topN = 30)
    val tiny = Seq((1L, "ab"), (2L, ""), (3L, "abba cab")).toDF("doc_id", "text")
    val out = LangProfile.classify(tiny, profiles, "doc_id", "text", topN = 30)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(3L))
  }

  test("argmin ties break by language code — deterministic") {
    // two one-doc languages with IDENTICAL text: a probe of that text is
    // equidistant; 'aa' must win over 'zz' by code order
    val train = Seq((1L, "zz", "hello world"), (2L, "aa", "hello world"))
      .toDF("doc_id", "lang", "text")
    val profiles = LangProfile.train(train, "lang", "text", topN = 10)
    val out = LangProfile
      .classify(Seq((9L, "hello world")).toDF("doc_id", "text"), profiles, "doc_id", "text", 10)
      .select("pred_lang").as[String].head()
    assert(out === "aa")
  }

  test("unknown trigrams cost the max displacement (topN), not zero") {
    val train = corpus(0, 4)
    val profiles = LangProfile.train(train, "lang", "text", topN = 30)
    // a doc from an unseen alphabet: every trigram misses every profile,
    // so all languages tie at |docProfile| * topN and 'aa' wins by code
    val out = LangProfile
      .classify(Seq((7L, "qqq www eee qww weq")).toDF("doc_id", "text"),
        profiles, "doc_id", "text", 30)
      .as[(Long, String, Long)].head()
    assert(out._2 === "aa")
    // 17 chars -> 17 distinct-position trigrams; profile depth caps at 30
    assert(out._3 % 30 === 0, s"all-miss distance must be a multiple of the penalty: $out")
  }

  test("fused trainAndClassifySelf equals train-then-classify, row for row") {
    // the round-14 single-explode path: same corpus fit + transform
    // must reproduce the two-pass result exactly — prediction, DISTANCE,
    // and row set — on a corpus with duplicate keys, ties, and a
    // sub-trigram doc (dropped by both paths identically)
    val docs = corpus(0, 6)
      .union(Seq((200L, "aa", "ab"), (201L, "bb", sentence(wordsB, 3, 12))).toDF("doc_id", "lang", "text"))
    val profiles = LangProfile.train(docs, "lang", "text", topN = 25)
    val twoPass = LangProfile
      .classify(docs, profiles, "doc_id", "text", topN = 25)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val fused = LangProfile
      .trainAndClassifySelf(docs, "lang", "doc_id", "text", topN = 25)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(fused === twoPass)
    // the sub-trigram doc has no profile rows in either path
    assert(!fused.exists(_._1 == 200L))
  }

  test("profiles broadcast at classify time; classification is doc-keyed") {
    val docs = Tables.documents(spark, Sf)
    val profiles = LangProfile.train(docs, "lang", "text", topN = 40)
    val plan = LangProfile.classify(docs, profiles, "doc_id", "text", 40)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"profile side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"corpus-side cartesian:\n$plan")
  }
}
