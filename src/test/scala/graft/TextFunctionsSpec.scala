package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("qualityScore: empty docs pin to 0 (no NaN), scores stay in [0, 100]") {
    val df  = Seq("", "the quick brown fox", "aaaa aaaa aaaa aaaa").toDF("text")
    val got = df.select(TextFunctions.qualityScore(col("text")).as("q")).as[Int].collect()
    assert(got(0) == 0) // length-0 doc: guarded, not NaN-cast garbage
    assert(got.forall(s => s >= 0 && s <= 100))
  }

  test("stopwordRatioMil: empty docs yield 0, all-stopword docs yield 1000") {
    val stops = TextFunctions.LangMarkers.head._2
    val df    = Seq("", "the the the", "zzz yyy").toDF("text")
    val got =
      df.select(TextFunctions.stopwordRatioMil(col("text"), stops).as("r")).as[Int].collect()
    assert(got.toSeq == Seq(0, 1000, 0))
  }
}
