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

  test("corpus_filter_funnel: inlined flags match the operators (composed-join replay)") {
    // the funnel query inlines the quality/repetition math to stay
    // single-scan; this replays the funnel counts by composing the
    // OPERATORS with doc_id joins and asserts identical stage rows, so
    // a threshold or formula drift between the two spellings cannot
    // ship silently
    import org.apache.spark.sql.expressions.Window
    val dir  = Sf
    val docs = Tables.documents(spark, dir)
    val q = QualityRules
      .gopherQuality(docs, "doc_id", col("text"))
      .select(col("doc_id"), col("keep").cast("long").as("fq"))
    val r = QualityRules
      .repetitionStats(docs, "doc_id", col("text"))
      .select(col("doc_id"), (col("dup_2gram_ppm") <= 200000L).cast("long").as("fr"))
    val u = docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn(
        "fu",
        (col("doc_id") === min(col("doc_id")).over(Window.partitionBy(col("h")))).cast("long"))
      .select(col("doc_id"), col("fu"))
    val composed = docs
      .select(col("doc_id"), col("lang").isNotNull.cast("long").as("fl"))
      .join(q, "doc_id").join(r, "doc_id").join(u, "doc_id")
      .agg(
        count(lit(1)).as("n0"),
        sum(col("fl")).as("n1"),
        sum(col("fl") * col("fq")).as("n2"),
        sum(col("fl") * col("fq") * col("fr")).as("n3"),
        sum(col("fl") * col("fq") * col("fr") * col("fu")).as("n4")
      )
      .as[(Long, Long, Long, Long, Long)]
      .head()
    val funnel = SparkEntry
      .queries("corpus_filter_funnel")(spark, dir)
      .select("stage_id", "docs_in", "docs_out")
      .as[(Int, Long, Long)]
      .collect()
      .map(t => t._1 -> ((t._2, t._3)))
      .toMap
    assert(funnel == Map(
      1 -> ((composed._1, composed._2)),
      2 -> ((composed._2, composed._3)),
      3 -> ((composed._3, composed._4)),
      4 -> ((composed._4, composed._5))
    ))
  }

  test("corpus_filter_funnel: single corpus scan, md5 window is the only exchange family") {
    val plan = SparkEntry
      .queries("corpus_filter_funnel")(spark, Sf)
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"funnel must read the corpus exactly once, saw $scans scans:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"funnel must not join corpus branches:\n$plan")
  }
}
