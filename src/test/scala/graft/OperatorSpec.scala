package graft

import graft.conform.{Decode, Durations, Validity}
import graft.operators.{CdcRouter, Dedup, Scd2}
import org.apache.spark.sql.functions._

class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("Dedup.latestPerKey keeps exactly one deterministic row per key") {
    val df = Seq((1, "old", 10), (1, "new", 20), (2, "only", 5)).toDF("k", "v", "ver")
    val got = Dedup
      .latestPerKey(df, Seq("k"), Seq(col("ver").desc))
      .orderBy("k")
      .as[(Int, String, Int)]
      .collect()
    assert(got.toSeq == Seq((1, "new", 20), (2, "only", 5)))
  }

  test("Dedup.latestByVersion equals window formulation") {
    val df = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c")).toDF("k", "ver", "v")
    val got = Dedup.latestByVersion(df, "k", "ver").orderBy("k").as[(Long, Long, String)].collect()
    assert(got.toSeq == Seq((1L, 20L, "b"), (2L, 5L, "c")))
  }

  test("CdcRouter truth table: INSERT / DUPLICATE / UPDATE") {
    val feed = Seq(("k1", "h1"), ("k2", "h2"), ("k3", "h3"))
      .toDF("ssi", "src_hash")
    val hist = Seq(("k2", "h2"), ("k3", "OLD"))
      .toDF("hssi", "hhash")
    val got = CdcRouter
      .route(feed, hist, "ssi", "src_hash", "hssi", "hhash")
      .select("ssi", CdcRouter.RouterCol)
      .as[(String, String)]
      .collect()
      .toMap
    assert(got == Map("k1" -> "INSERT", "k2" -> "DUPLICATE", "k3" -> "UPDATE"))
  }

  test("CdcRouter probeOnHash variant routes identically (XML parity)") {
    val feed = Seq(("k1", "h1"), ("k2", "h2")).toDF("ssi", "src_hash")
    val hist = Seq(("k2", "h2")).toDF("hssi", "hhash")
    val a = CdcRouter.route(feed, hist, "ssi", "src_hash", "hssi", "hhash")
    val b = CdcRouter.route(feed, hist, "ssi", "src_hash", "hssi", "hhash", probeOnHash = true)
    assert(
      a.select("ssi", CdcRouter.RouterCol).collect().toSet ==
        b.select("ssi", CdcRouter.RouterCol).collect().toSet
    )
  }

  test("Scd2.merge: close-out + insert, one active row per key, idempotent duplicates") {
    val snapshot = Seq(
      ("k1", "hA", 1, "t0", "eot"),
      ("k1", "h0", 0, "t-1", "t0") // pre-existing history row must be untouched
    ).toDF("ssi", "src_hash", "ACTIVE_FLAG", "START_DATE", "END_DATE")
    val routed = Seq(
      ("k1", "hB", "UPDATE"),
      ("k2", "hC", "INSERT"),
      ("k3", "hD", "DUPLICATE")
    ).toDF("ssi", "src_hash", CdcRouter.RouterCol)

    val merged = Scd2.merge(snapshot, routed, "ssi", lit("t1"), lit("eot"))
    val rows = merged
      .select("ssi", "src_hash", "ACTIVE_FLAG", "START_DATE", "END_DATE")
      .as[(String, String, Int, String, String)]
      .collect()
      .toSet

    assert(rows == Set(
      ("k1", "h0", 0, "t-1", "t0"),  // history untouched
      ("k1", "hA", 0, "t0", "t1"),   // closed out at load ts
      ("k1", "hB", 1, "t1", "eot"),  // new version active
      ("k2", "hC", 1, "t1", "eot")   // fresh insert; k3 DUPLICATE dropped
    ))
    // invariant: exactly one active row per live key
    val actives = merged.where($"ACTIVE_FLAG" === 1).groupBy("ssi").count()
    assert(actives.where($"count" > 1).isEmpty)
  }

  test("decoders: rating5 / yesNo / trueFalse / rescale10to5 boundaries") {
    val df = Seq(
      ("WORST", "YES", "true", 1),
      ("BEST", "no", "FALSE", 10),
      ("garbage", "nope", "falsy", 7)
    ).toDF("r", "yn", "tf", "ten")
    val got = df
      .select(
        Decode.rating5($"r"),
        Decode.yesNo($"yn"),
        Decode.trueFalse($"tf"),
        Decode.rescale10to5($"ten")
      )
      .collect()
    assert(got(0).toSeq == Seq(1, 1, 1, 0))    // rating 1 -> rescale floor(1/2)=0
    assert(got(1).toSeq == Seq(5, 0, 0, 5))
    assert(got(2).toSeq == Seq(null, null, null, 3))
  }

  test("duration round-trip H:MM:SS, null-safe") {
    val df = Seq(Some(3 * 3600 + 25 * 60 + 7), None).toDF("secs")
    val got = df
      .select(
        Durations.hmsToSeconds(Durations.secondsToHms($"secs")).as("rt")
      )
      .as[Option[Int]]
      .collect()
    assert(got(0).contains(12307))
    assert(got(1).isEmpty)
  }

  test("validity flag: any-null -> 0, else 1") {
    val df = Seq((Some("a"), Some("b")), (None, Some("b")), (Some("a"), None))
      .toDF("x", "y")
    val got = df.select(Validity.flag(Seq($"x", $"y"))).as[Int].collect()
    assert(got.toSeq == Seq(1, 0, 0))
  }
}
