package graft

import graft.functions.Fingerprint
import org.apache.spark.sql.functions._

/** Hash canon golden vectors — everything downstream keys off these
  * exact bytes (SURVEY §7.4 risk 1).
  */
class FingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("rowHash: null renders as literal NULL, separator is ||, order matters") {
    val df = Seq(("a", Option("b")), ("a", None)).toDF("x", "y")
    val got = df
      .select(Fingerprint.rowHash(Seq(col("x"), col("y"))).as("h"))
      .as[String]
      .collect()
    // golden: md5("a||b"), md5("a||NULL") — computed independently
    assert(got(0) == "8e4350bbfbeaae12c71013d7e16e6603")
    assert(got(1) == "1baa4a4d5429a7da5f2a8bb3af80930a")
  }

  test("rowHash: ints and longs render without decoration") {
    val df = Seq((1, 2L)).toDF("a", "b")
    val s = df
      .select(concat_ws("||", Seq(col("a"), col("b")).map(Fingerprint.canonical): _*))
      .as[String]
      .head()
    assert(s == "1||2")
  }

  test("seededLongHash: stable, non-negative, seed-sensitive") {
    val df  = Seq("tok").toDF("t")
    val got = df
      .select(
        Fingerprint.seededLongHash(col("t"), 0),
        Fingerprint.seededLongHash(col("t"), 1)
      )
      .head()
    assert(got.getLong(0) == 696404620292602022L) // matches DuckDB CAST('0x'||substr(md5('0:tok'),1,15) AS BIGINT)
    assert(got.getLong(0) != got.getLong(1))
    assert(got.getLong(0) >= 0 && got.getLong(1) >= 0)
  }
}
