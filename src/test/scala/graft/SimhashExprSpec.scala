package graft

import graft.functions.Fingerprint
import graft.operators.ApproxDedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Pins the native single-pass `graft_simhash` kernel to the per-bit HOF
  * formulation it replaced: identical signatures (order-independent
  * counter sums, same shiftright arithmetic) and matching null
  * semantics (null array -> null, null element -> -1 per bit, empty
  * array -> 0).
  */
class SimhashExprSpec extends SparkSpec {
  import spark.implicits._

  private val NBits = 32

  /** The round-1 Column-level reference form: one aggregate HOF per bit. */
  private def hofSimhash(tokHashes: org.apache.spark.sql.Column, nBits: Int) =
    (0 until nBits)
      .map { b =>
        val contrib = aggregate(
          tokHashes,
          lit(0L),
          (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)
        )
        when(contrib > 0, lit(1L) * (1L << b)).otherwise(0L)
      }
      .reduce(_ + _)

  test("native signature equals per-bit HOF aggregate values on random hash arrays") {
    val r = new java.util.Random(17)
    val rows = (1 to 300).map { i =>
      val n = r.nextInt(60) + 1
      (i.toLong, Array.fill(n)(math.abs(r.nextLong()) % (1L << 60)))
    }
    val out = rows
      .toDF("id", "th")
      .select(
        col("id"),
        call_function("graft_simhash", col("th"), lit(NBits)).as("native"),
        hofSimhash(col("th"), NBits).as("hof")
      )
      .collect()
    out.foreach(row => assert(row.getLong(1) == row.getLong(2)))
  }

  test("null array -> null (HOF collapses to 0); empty -> 0; null element -1 per bit") {
    val df = Seq(
      (1L, null.asInstanceOf[Array[java.lang.Long]]),
      (2L, Array.empty[java.lang.Long]),
      (3L, Array[java.lang.Long](null, 7L))
    ).toDF("id", "th")
      .select(
        col("id"),
        call_function("graft_simhash", col("th"), lit(4)).as("native"),
        hofSimhash(col("th"), 4).as("hof")
      )
      .orderBy("id")
    val rows = df.collect()
    // intentional divergence: the HOF form's per-bit `when(contrib > 0,
    // ...).otherwise(0)` turns the null aggregate into 0, silently giving
    // null documents a real signature; the native kernel propagates null
    // (a missing document has no signature). Corpus text is non-null, so
    // query outputs are unaffected (the oracle drops null-text docs too).
    assert(rows(0).isNullAt(1) && !rows(0).isNullAt(2) && rows(0).getLong(2) == 0L)
    assert(rows(1).getLong(1) == 0L && rows(1).getLong(2) == 0L)
    // [null, 7]: bits 0-2 counter = -1 + 1 = 0 -> not set; sig = 0
    assert(rows(2).getLong(1) == rows(2).getLong(2))
  }

  test("withSimhash over documents matches the HOF form end-to-end") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet").limit(100)
    val native = ApproxDedup
      .withSimhash(docs.select(col("doc_id"), col("text")), col("text"), NBits, "sh")
      .select(col("doc_id"), col("sh"))
    val hof = docs
      .select(
        col("doc_id"),
        hofSimhash(
          transform(TextFunctions.tokens(col("text")), t => Fingerprint.seededLongHash(t, 0)),
          NBits
        ).as("sh")
      )
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }
}
