package graft

import graft.operators.CdcRouter
import org.apache.spark.sql.functions._

/** Pins the skew-safety contract of the CDC probe join (SURVEY J1):
  * routeSalted must be semantically IDENTICAL to route while spreading a
  * hot business key across nSalts join tasks.
  */
class CdcSkewSpec extends SparkSpec {
  import spark.implicits._

  private val NSalts = 8

  // 100x skew: key "HOT" carries 800 rows, 40 other keys carry ~8 each
  private def skewedFeed = {
    val hot  = (0 until 800).map(i => ("HOT", s"h$i"))
    val cold = (0 until 320).map(i => (s"K${i % 40}", s"c$i"))
    (hot ++ cold).toDF("bk", "fh")
  }

  private def historic =
    (Seq(("HOT", "h0")) ++ (0 until 30).map(i => (s"K$i", s"c$i"))).toDF("hk", "hh")

  test("routeSalted output is identical to plain route under a hot key") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("bk"), col("fh"), col(CdcRouter.RouterCol))
        .as[(String, String, String)]
        .collect()
        .sorted
        .toSeq
    val plain  = rows(CdcRouter.route(skewedFeed, historic, "bk", "fh", "hk", "hh"))
    val salted =
      rows(CdcRouter.routeSalted(skewedFeed, historic, "bk", "fh", "hk", "hh", nSalts = NSalts))
    assert(salted == plain)
    // the scenario exercises all three routes
    val groups = plain.map(_._3).toSet
    assert(groups == Set(CdcRouter.Insert, CdcRouter.Update, CdcRouter.Duplicate))
  }

  test("the hot key's rows spread across every salt bucket") {
    val spread = skewedFeed
      .where(col("bk") === "HOT")
      .select(pmod(hash(col("fh")), lit(NSalts)).as("salt"))
      .distinct()
      .count()
    assert(spread == NSalts, s"hot key landed in only $spread of $NSalts salt buckets")
  }

  test("probeOnHash variant routes identically when salted") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("bk"), col("fh"), col(CdcRouter.RouterCol))
        .as[(String, String, String)]
        .collect()
        .sorted
        .toSeq
    val plain = rows(
      CdcRouter.route(skewedFeed, historic, "bk", "fh", "hk", "hh", probeOnHash = true)
    )
    val salted = rows(
      CdcRouter
        .routeSalted(skewedFeed, historic, "bk", "fh", "hk", "hh", probeOnHash = true, NSalts)
    )
    assert(salted == plain)
  }

  test("AQE skew-join mitigation is on in this Spark version's defaults") {
    // the adaptive fallback for skew we do NOT hand-salt: sort-merge
    // joins past the size thresholds get split at runtime
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }
}
