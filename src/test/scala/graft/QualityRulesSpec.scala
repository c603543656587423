package graft

import graft.operators.QualityRules
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the Gopher rule gate and the repetition
  * stats, plus the zero-shuffle plan contract both operators claim.
  */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  test("gopherQuality: hand-computed bits on a 4-doc fixture") {
    // 52 words, all alpha, stopwords {the, a}: every rule passes
    val good = (("the a " + Seq.tabulate(50)(i => "word").mkString(" ")), 1L)
    // 52 words but only one distinct stopword -> stop_ok fails
    val oneStop = (("the " + Seq.tabulate(51)(i => "word").mkString(" ")), 2L)
    // 10 words -> word_count_ok fails (mean length (3+1+4*7+3+3)*1000
    // div 10 = 3800 stays in range; stopwords pass)
    val short = ("the a cats sats onto a mats the cats sats", 3L)
    // long words: mean length (52*11+3+1)/54 > 10 -> mean_len_ok fails
    val longWords =
      (("the a " + Seq.tabulate(52)(i => "elevenchars").mkString(" ")), 4L)
    val df = Seq(good, oneStop, short, longWords).toDF("text", "id")

    val out = QualityRules
      .gopherQuality(df, "id", col("text"))
      .select("id", "n_words", "word_count_ok", "mean_len_ok", "alpha_ok", "stop_ok", "keep")
      .as[(Long, Long, Int, Int, Int, Int, Int)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(out(1L) == ((1L, 52L, 1, 1, 1, 1, 1)))
    assert(out(2L) == ((2L, 52L, 1, 1, 1, 0, 0)))
    assert(out(3L) == ((3L, 10L, 0, 1, 1, 1, 0)))
    assert(out(4L) == ((4L, 54L, 1, 0, 1, 1, 0)))
    // measured columns: mean word length of the good doc is
    // (3 + 1 + 50*4) * 1000 div 52 = 3923 milli
    val m = QualityRules
      .gopherQuality(df, "id", col("text"))
      .where(col("id") === 1L)
      .select("mean_len_milli", "alpha_ppm", "stop_hits")
      .as[(Long, Long, Long)]
      .head()
    assert(m == ((3923L, 1000000L, 2L)))
  }

  test("repetitionStats: hand-computed ppm on repeated and unique docs") {
    val df = Seq(
      // "x x x y": top run 3/4 = 750000; distinct 2/4 = 500000;
      // 2-grams [x x, x x, x y] -> dup 1/3 = 333333; 3-grams
      // [x x x, x x y] -> dup 0/2 = 0
      ("x x x y", 1L),
      // all distinct: top 1/4 = 250000, distinct 1000000, no dup grams
      ("a b c d", 2L),
      // shorter than 3 tokens: 3-gram column reports -1
      ("a b", 3L),
      // degenerate full repetition
      ("z z z z", 4L)
    ).toDF("text", "id")
    val out = QualityRules
      .repetitionStats(df, "id", col("text"))
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(out(1L) == ((1L, 4L, 750000L, 500000L, 333333L, 0L)))
    assert(out(2L) == ((2L, 4L, 250000L, 1000000L, 0L, 0L)))
    assert(out(3L) == ((3L, 2L, 500000L, 1000000L, 0L, -1L)))
    assert(out(4L) == ((4L, 4L, 1000000L, 250000L, 666666L, 500000L)))
  }

  test("both operators are pure map stages: zero exchanges in the plan") {
    val df = Tables.documents(spark, Sf)
    for (
      plan <- Seq(
        QualityRules.gopherQuality(df, "doc_id", col("text")),
        QualityRules.repetitionStats(df, "doc_id", col("text"))
      )
    ) {
      val p = plan.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"quality rules must not shuffle:\n$p")
      assert(!p.contains("Join"), s"quality rules must not join:\n$p")
    }
  }
}
