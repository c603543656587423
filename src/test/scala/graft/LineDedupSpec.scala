package graft

import graft.operators.LineDedup
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("chunkLines splits into fixed-width word chunks, ragged tail kept") {
    val df = Seq((1L, "a b c d e f g")).toDF("id", "txt")
    val got = LineDedup
      .chunkLines(df, col("id"), col("txt"), lineWords = 3)
      .as[(Long, Long, String)]
      .collect()
      .toSet
    assert(got == Set((1L, 0L, "a b c"), (1L, 1L, "d e f"), (1L, 2L, "g")))
  }

  test("boilerplate line removed everywhere, unique lines survive in order") {
    // "the cookie banner" appears in 3 of 4 docs -> boilerplate at minDocs=3
    val df = Seq(
      (1L, "the cookie banner alpha beta gamma"),
      (2L, "delta eps zeta the cookie banner"),
      (3L, "the cookie banner eta theta iota"),
      (4L, "kappa lambda mu nu xi omicron")
    ).toDF("id", "txt")
    val got = LineDedup
      .removeBoilerplate(df, col("id"), col("txt"), lineWords = 3, minDocs = 3)
      .as[(Long, Long, Long, String)]
      .collect()
      .toMap2
    assert(got(1L) == (2L, 1L, "alpha beta gamma"))
    assert(got(2L) == (2L, 1L, "delta eps zeta"))
    assert(got(3L) == (2L, 1L, "eta theta iota"))
    assert(got(4L) == (2L, 0L, "kappa lambda mu nu xi omicron"))
  }

  test("document made entirely of boilerplate survives with empty cleaned text") {
    val df = Seq(
      (1L, "spam spam"),
      (2L, "spam spam"),
      (3L, "spam spam real content")
    ).toDF("id", "txt")
    val got = LineDedup
      .removeBoilerplate(df, col("id"), col("txt"), lineWords = 2, minDocs = 3)
      .as[(Long, Long, Long, String)]
      .collect()
      .toMap2
    assert(got(1L) == (1L, 1L, ""))
    assert(got(2L) == (1L, 1L, ""))
    assert(got(3L) == (2L, 1L, "real content"))
  }

  test("below-threshold repetition is NOT removed") {
    val df = Seq((1L, "x y"), (2L, "x y")).toDF("id", "txt")
    val got = LineDedup
      .removeBoilerplate(df, col("id"), col("txt"), lineWords = 2, minDocs = 3)
      .as[(Long, Long, Long, String)]
      .collect()
      .toMap2
    assert(got(1L) == (1L, 0L, "x y") && got(2L) == (1L, 0L, "x y"))
  }

  private implicit class Rows(rs: Array[(Long, Long, Long, String)]) {
    def toMap2: Map[Long, (Long, Long, String)] =
      rs.map { case (id, n, r, c) => id -> (n, r, c) }.toMap
  }
}
