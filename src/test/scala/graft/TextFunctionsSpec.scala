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

  test("pii: counts and redaction on multi-match, adjacent, and lookalike inputs") {
    import graft.functions.Pii
    val df = Seq(
      // two emails, one phone, one ip in a single string
      "a@b.co c.d@e-f.org +12-345-6789 at 192.168.0.1 end",
      // adjacent ips (non-overlapping scan), phone lookalike missing '+'
      "1.2.3.4 5.6.7.8 12-345-6789",
      // spelled-out decoy and bare domain: no matches
      "admin at corp dot example visits example.com-less text",
      ""
    ).toDF("t")
    val got = df
      .select(
        Pii.emailCount(col("t")).as("e"),
        Pii.phoneCount(col("t")).as("p"),
        Pii.ipv4Count(col("t")).as("i"),
        Pii.redact(col("t")).as("r")
      )
      .as[(Int, Int, Int, String)]
      .collect()
      .toSeq
    assert(got(0) == ((2, 1, 1, "[EMAIL] [EMAIL] [PHONE] at [IP] end")))
    assert(got(1) == ((0, 0, 2, "[IP] [IP] 12-345-6789")))
    assert(got(2)._1 == 0 && got(2)._2 == 0 && got(2)._3 == 0)
    assert(got(3) == ((0, 0, 0, "")))
  }
}
