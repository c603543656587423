package graft

import graft.functions.Fingerprint
import org.apache.spark.sql.functions._

/** Pins the native `graft_md5_longs` kernel to the Column-level
  * md5+conv+substring construction it replaces: bit-identical 60-bit
  * hashes (including multi-byte UTF-8 and empty strings), correct
  * prefix and mod handling, and transform-matching null semantics.
  */
class Md5LongsSpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to transform(seededLongHash) with '0:' prefix") {
    val rows = Seq(
      Seq("alpha", "beta", "", "élève", "中文 token", "x" * 300),
      Seq("single")
    )
    val out = rows
      .toDF("toks")
      .select(
        call_function("graft_md5_longs", col("toks"), lit("0:"), lit(0L)).as("native"),
        transform(col("toks"), t => Fingerprint.seededLongHash(t, 0)).as("hof")
      )
      .collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("no-prefix + mod matches hexToLong(md5) % mod") {
    val mod = 2147483647L
    val out = Seq(Seq("a b c", "tok", "?!"))
      .toDF("toks")
      .select(
        call_function("graft_md5_longs", col("toks"), lit(""), lit(mod)).as("native"),
        transform(col("toks"), t => Fingerprint.hexToLong(md5(t)) % mod).as("hof")
      )
      .collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("null array -> null; null element -> null element") {
    val df = Seq(
      (1L, null.asInstanceOf[Seq[String]]),
      (2L, Seq("a", null, "b"))
    ).toDF("id", "toks")
      .select(col("id"), call_function("graft_md5_longs", col("toks"), lit(""), lit(0L)).as("h"))
      .orderBy("id")
      .collect()
    assert(df(0).isNullAt(1))
    val arr = df(1).getSeq[java.lang.Long](1)
    assert(arr.length == 3 && arr(0) != null && arr(1) == null && arr(2) != null)
  }
}
