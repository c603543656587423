package graft

import graft.operators.Integrity
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  private def base =
    Seq(
      (1L, "a", "x"), (2L, "a", "y"), (3L, "a", "y"),
      (4L, "b", "p"), (5L, "b", "q")
    ).toDF("id", "grp", "v")

  private def digestMap(df: org.apache.spark.sql.DataFrame) =
    Integrity
      .contentDigest(df, Seq(col("grp")), Seq(col("id"), col("v")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("digest is order- and partitioning-invariant, content-sensitive") {
    val d1 = digestMap(base)
    assert(d1 == digestMap(base.orderBy(col("id").desc)))
    assert(d1 == digestMap(base.repartition(7)))
    // any single value change moves the digest but not the count
    val mutated = base.withColumn("v", when(col("id") === 3L, lit("Y")).otherwise(col("v")))
    val d2 = digestMap(mutated)
    assert(d2("a")._1 == d1("a")._1 && d2("a")._2 != d1("a")._2)
    assert(d2("b") == d1("b"))
  }

  test("duplicate rows accumulate (multiset, not set, invariant)") {
    val doubled = base.union(base.where(col("id") === 2L))
    val d = digestMap(doubled)
    assert(d("a")._1 == 4L && d("a")._2 != digestMap(base)("a")._2)
  }

  test("digests stay in [0, 2^60)") {
    digestMap(base).values.foreach { case (_, dg) =>
      assert(dg >= 0L && dg < Integrity.DigestMod)
    }
  }

  test("diffDigests pinpoints missing, drifted, and count-changed groups only") {
    val right = Seq(
      (1L, "a", "x"), (2L, "a", "y"), (3L, "a", "y"), // a identical
      (4L, "b", "p"), // b lost a row
      (6L, "c", "z") // c only on the right
    ).toDF("id", "grp", "v")
    val diff = Integrity
      .diffDigests(base, right, Seq("grp"), Seq("id", "v"))
      .select("grp")
      .as[String]
      .collect()
      .toSet
    assert(diff == Set("b", "c"))
    // identical inputs -> empty diff
    assert(Integrity.diffDigests(base, base, Seq("grp"), Seq("id", "v")).count() == 0L)
  }
}
