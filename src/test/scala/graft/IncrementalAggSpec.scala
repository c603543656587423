package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

/** Incremental view maintenance contract: any sequence of delta
  * refreshes equals the direct aggregate of the union — exactly, for
  * integer inputs — including groups that first appear in a late delta
  * and all-null value columns.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val G = Seq("g")
  private val V = Seq("x")

  private def direct(df: org.apache.spark.sql.DataFrame) =
    IncrementalAgg
      .aggregate(df, G, V)
      .orderBy("g")
      .collect()
      .map(_.toSeq)
      .toSeq

  test("chained merges equal the direct aggregate over random splits") {
    val r = new java.util.Random(31)
    val rows = (1 to 500).map(i => (s"g${r.nextInt(6)}", r.nextInt(1000).toLong, i % 4))
    val df = rows.toDF("g", "x", "part")
    val parts = (0 until 4).map(p => df.where(col("part") === p).drop("part"))
    val incremental = parts.tail
      .foldLeft(IncrementalAgg.aggregate(parts.head, G, V)) { (view, delta) =>
        IncrementalAgg.merge(view, IncrementalAgg.aggregate(delta, G, V), G, V)
      }
    assert(incremental.orderBy("g").collect().map(_.toSeq).toSeq == direct(df.drop("part")))
  }

  test("a group first appearing in a late delta passes through") {
    val v0 = IncrementalAgg.aggregate(Seq(("a", 1L)).toDF("g", "x"), G, V)
    val v1 = IncrementalAgg.merge(
      v0, IncrementalAgg.aggregate(Seq(("b", 7L)).toDF("g", "x"), G, V), G, V)
    val got = v1.orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 1L, 1L, 1L), ("b", 1L, 7L, 7L, 7L)))
  }

  test("all-null value column: sums stay null, counts count rows") {
    val nullXs = Seq(("a", None: Option[Long]), ("a", None)).toDF("g", "x")
    val someXs = Seq(("a", Some(5L))).toDF("g", "x")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.aggregate(nullXs, G, V),
      IncrementalAgg.aggregate(nullXs, G, V), G, V)
    val row = merged.collect().head
    assert(row.getLong(1) == 4L && row.isNullAt(2) && row.isNullAt(3) && row.isNullAt(4))
    // a non-null side re-seeds the sum
    val seeded = IncrementalAgg.merge(merged, IncrementalAgg.aggregate(someXs, G, V), G, V)
    assert(seeded.collect().head.getLong(2) == 5L)
  }

  test("refresh: bootstrap, merge, and crash-safe swap round-trip on disk") {
    val dir = java.nio.file.Files.createTempDirectory("incagg").toString + "/view"
    val d1 = Seq(("a", 1L), ("b", 2L)).toDF("g", "x")
    val d2 = Seq(("a", 10L)).toDF("g", "x")
    IncrementalAgg.refresh(spark, dir, d1, G, V)
    val after = IncrementalAgg.refresh(spark, dir, d2, G, V)
    assert(
      after.orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq ==
        Seq(("a", 2L, 11L, 1L, 10L), ("b", 1L, 2L, 2L, 2L))
    )
    // no staging/bak leftovers
    val parent = new java.io.File(dir).getParentFile
    assert(parent.listFiles().map(_.getName).toSet == Set("view"))
  }

  test("crash between the swap renames: .bak is restored, history never lost") {
    val dir = java.nio.file.Files.createTempDirectory("incaggcrash").toString + "/view"
    IncrementalAgg.refresh(spark, dir, Seq(("a", 1L), ("b", 2L)).toDF("g", "x"), G, V)
    // simulate the window: view renamed aside, staging never landed
    val f = new java.io.File(dir)
    assert(f.renameTo(new java.io.File(dir + ".bak")))
    // next refresh must NOT bootstrap from the delta alone
    val after = IncrementalAgg.refresh(spark, dir, Seq(("a", 10L)).toDF("g", "x"), G, V)
    assert(
      after.orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq ==
        Seq(("a", 2L, 11L, 1L, 10L), ("b", 1L, 2L, 2L, 2L)),
      "pre-crash history must survive via the .bak restore"
    )
  }
}
