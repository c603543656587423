package graft

import graft.operators.{AsOfJoin, Sessionize, Skew}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: event sees the latest version at-or-before its timestamp, inclusive") {
    val versions = Seq(
      (1L, ts("2024-01-01 00:00:00"), "v1"),
      (1L, ts("2024-01-02 00:00:00"), "v2"),
      (2L, ts("2024-01-05 00:00:00"), "w1")
    ).toDF("k", "vts", "payload")
    val events = Seq(
      (10L, 1L, ts("2024-01-01 12:00:00")), // between v1 and v2 -> v1
      (11L, 1L, ts("2024-01-02 00:00:00")), // exactly at v2 -> v2 (inclusive)
      (12L, 1L, ts("2023-12-31 23:59:59")), // before any version -> null
      (13L, 2L, ts("2024-01-06 00:00:00")), // -> w1
      (14L, 3L, ts("2024-01-06 00:00:00"))  // key with no versions -> null
    ).toDF("event_id", "k", "ets")

    val out = AsOfJoin
      .enrich(events, versions, "k", "ets", "k", "vts")
      .select("event_id", "payload")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap
    assert(out == Map(
      10L -> Some("v1"),
      11L -> Some("v2"),
      12L -> None,
      13L -> Some("w1"),
      14L -> None
    ))
  }

  test("asof forward: event sees the earliest version at-or-after its timestamp, inclusive") {
    val versions = Seq(
      (1L, ts("2024-01-01 00:00:00"), "v1"),
      (1L, ts("2024-01-02 00:00:00"), "v2"),
      (2L, ts("2024-01-05 00:00:00"), "w1")
    ).toDF("k", "vts", "payload")
    val events = Seq(
      (10L, 1L, ts("2024-01-01 12:00:00")), // between v1 and v2 -> v2
      (11L, 1L, ts("2024-01-02 00:00:00")), // exactly at v2 -> v2 (inclusive)
      (12L, 1L, ts("2024-01-02 00:00:01")), // after the last version -> null
      (13L, 2L, ts("2024-01-04 00:00:00")), // -> w1
      (14L, 3L, ts("2024-01-06 00:00:00"))  // key with no versions -> null
    ).toDF("event_id", "k", "ets")

    val out = AsOfJoin
      .enrichForward(events, versions, "k", "ets", "k", "vts")
      .select("event_id", "payload")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap
    assert(out == Map(
      10L -> Some("v2"),
      11L -> Some("v2"),
      12L -> None,
      13L -> Some("w1"),
      14L -> None
    ))
  }

  test("asof nearest: closest version wins, exact ties go backward, one-sided falls back") {
    val versions = Seq(
      (1L, ts("2024-01-01 00:00:00"), "v1"),
      (1L, ts("2024-01-03 00:00:00"), "v2"),
      (2L, ts("2024-01-05 00:00:00"), "w1")
    ).toDF("k", "vts", "payload")
    val events = Seq(
      (10L, 1L, ts("2024-01-01 06:00:00")), // 6h to v1, 42h to v2 -> v1
      (11L, 1L, ts("2024-01-02 18:00:00")), // 42h to v1, 6h to v2 -> v2
      (12L, 1L, ts("2024-01-02 00:00:00")), // exact tie (24h both) -> backward v1
      (13L, 1L, ts("2023-12-30 00:00:00")), // before all -> forward v1
      (14L, 1L, ts("2024-01-09 00:00:00")), // after all -> backward v2
      (15L, 3L, ts("2024-01-01 00:00:00"))  // no versions -> null
    ).toDF("event_id", "k", "ets")

    val out = AsOfJoin
      .enrichNearest(events, versions, "k", "ets", "k", "vts")
      .select("event_id", "payload")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap
    assert(out == Map(
      10L -> Some("v1"),
      11L -> Some("v2"),
      12L -> Some("v1"),
      13L -> Some("v1"),
      14L -> Some("v2"),
      15L -> None
    ))
  }

  test("asof tolerant: staleness boundary is inclusive, stale versions null out, tolerance 0 means exact-ts only") {
    val versions = Seq(
      (1L, ts("2024-01-01 00:00:00"), "v1"),
      (2L, ts("2024-01-01 00:00:00"), "w1")
    ).toDF("k", "vts", "payload")
    val events = Seq(
      (10L, 1L, ts("2024-01-01 01:00:00")), // exactly 3600s stale -> kept (inclusive)
      (11L, 1L, ts("2024-01-01 01:00:01")), // 3601s -> rejected
      (12L, 1L, ts("2024-01-01 00:30:00")), // fresh -> kept
      (13L, 1L, ts("2023-12-31 00:00:00")), // no version at-or-before -> null
      (14L, 2L, ts("2024-01-01 00:00:00"))  // distance 0
    ).toDF("event_id", "k", "ets")

    def run(tol: Long) = AsOfJoin
      .enrichTolerant(events, versions, "k", "ets", "k", "vts", tol)
      .select("event_id", "payload")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap

    assert(run(3600L) == Map(
      10L -> Some("v1"), // boundary inclusive
      11L -> None,
      12L -> Some("v1"),
      13L -> None,
      14L -> Some("w1")
    ))
    // tolerance 0: only a version at the exact event instant survives
    assert(run(0L) == Map(
      10L -> None, 11L -> None, 12L -> None, 13L -> None, 14L -> Some("w1")
    ))
  }

  test("asof forward/nearest: one hash exchange, no join operator") {
    // pre-unique local frames: any exchange in the plan belongs to the
    // operator itself, not fixture prep
    val versions = Seq((1L, ts("2024-01-01 00:00:00"), "v1"), (1L, ts("2024-01-02 00:00:00"), "v2"))
      .toDF("k", "vts", "payload")
    val events = Seq((10L, 1L, ts("2024-01-01 12:00:00"))).toDF("event_id", "k", "ets")
    for (df <- Seq(
        AsOfJoin.enrichForward(events, versions, "k", "ets", "k", "vts"),
        AsOfJoin.enrichNearest(events, versions, "k", "ets", "k", "vts"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"directional as-of must not plan a join:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"directional as-of must shuffle exactly once, saw $exchanges:\n$plan")
    }
  }

  test("asof forward/nearest: fills use growing frames only (no O(n^2) unboundedfollowing)") {
    val versions = Seq((1L, ts("2024-01-01 00:00:00"), "v1")).toDF("k", "vts", "payload")
    val events   = Seq((10L, 1L, ts("2024-01-01 01:00:00"))).toDF("event_id", "k", "ets")
    for (df <- Seq(
        AsOfJoin.enrichForward(events, versions, "k", "ets", "k", "vts"),
        AsOfJoin.enrichNearest(events, versions, "k", "ets", "k", "vts"))) {
      val plan = df.queryExecution.executedPlan.toString.toLowerCase
      // a shrinking frame (currentRow..unboundedFollowing) re-scans to the
      // partition end per row — quadratic on a hot key; the fills must
      // run over unboundedPreceding..currentRow growing frames instead
      assert(!plan.contains("unboundedfollowing"), s"shrinking window frame in as-of fill:\n$plan")
    }
  }

  test("asof: single shuffle — no join operator in the physical plan") {
    val versions = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_custkey").as("k"), col("o_orderdate").as("vts"), col("o_orderkey"))
      .dropDuplicates("k", "vts")
    val events = Tables.events(spark, Sf).select(col("user_id").as("k"), col("ts"), col("event_id"))
    val plan = AsOfJoin
      .enrich(events, versions, "k", "ts", "k", "vts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"))
  }

  test("asof bucketed: equals the plain as-of row-for-row, including on a hot key") {
    // edge fixture: carry-in across empty buckets, version exactly at an
    // event instant, events before any version, keys with no versions
    val versions = Seq(
      (1L, ts("2024-01-01 00:00:00"), "v1"),
      (1L, ts("2024-01-02 00:00:00"), "v2"),
      (2L, ts("2024-01-05 00:00:00"), "w1")
    ).toDF("k", "vts", "payload")
    val events = Seq(
      (10L, 1L, ts("2024-01-01 12:00:00")),
      (11L, 1L, ts("2024-01-02 00:00:00")),
      (12L, 1L, ts("2023-12-31 23:59:59")),
      (13L, 2L, ts("2024-01-06 00:00:00")), // carry-in over an empty Jan-05->06 boundary
      (14L, 3L, ts("2024-01-06 00:00:00")),
      (15L, 1L, ts("2024-01-09 00:00:00"))  // several empty buckets after v2
    ).toDF("event_id", "k", "ets")
    for (width <- Seq(3600L, 86400L, 7L * 86400L)) {
      val plain = AsOfJoin
        .enrich(events, versions, "k", "ets", "k", "vts")
        .select("event_id", "payload").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      val bucketed = AsOfJoin
        .enrichBucketed(events, versions, "k", "ets", "k", "vts", bucketSeconds = width)
        .select("event_id", "payload").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(bucketed == plain, s"bucketed (width=$width) diverged from plain as-of")
    }

    // hot-key fixture at data scale: 75% of events on one key
    val ev = Tables.events(spark, Sf)
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("user_id", when(col("event_id") % 4 =!= 0, lit(7L)).otherwise(col("user_id")))
    // deterministic (key, ts) dedup — dropDuplicates picks an arbitrary
    // row and the frame is evaluated once per collect below, so a
    // nondeterministic pick could legitimately differ between the two
    // jobs and fail the equality spuriously
    val dw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val vers = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(dw))
      .where(col("__rn") === 1)
      .drop("__rn")
    val plainHot = AsOfJoin
      .enrich(ev, vers, "user_id", "ts", "o_custkey", "o_orderdate")
      .select("event_id", "o_orderkey").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val bucketedHot = AsOfJoin
      .enrichBucketed(ev, vers, "user_id", "ts", "o_custkey", "o_orderdate", bucketSeconds = 86400L)
      .select("event_id", "o_orderkey").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(bucketedHot == plainHot, "bucketed as-of diverged on the hot-key fixture")
  }

  test("asof bucketed: the forward-fill window partitions by key AND bucket") {
    val versions = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_custkey").as("k"), col("o_orderdate").as("vts"), col("o_orderkey"))
      .dropDuplicates("k", "vts")
    val events = Tables.events(spark, Sf).select(col("user_id").as("k"), col("ts"), col("event_id"))
    val plan = AsOfJoin
      .enrichBucketed(events, versions, "k", "ts", "k", "vts", bucketSeconds = 86400L)
      .queryExecution.executedPlan.toString
    // the main fill window must key on (__k, __b) — a key-only window
    // would put the hot key back on one task
    assert(
      plan.contains("windowspecdefinition(__k#") || plan.contains("windowspecdefinition(__k,"),
      s"expected a window spec in the plan:\n$plan"
    )
    assert(plan.contains("__b"), s"expected the bucket column in the plan:\n$plan")
  }

  test("sessionize: gaps strictly over the threshold start new sessions") {
    val events = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 10:30:00")), // 30 min gap -> same session
      (3L, 100L, ts("2024-01-01 11:30:00")), // exactly 3600 s -> same (strict >)
      (4L, 100L, ts("2024-01-01 13:00:01")), // 5401 s -> new session
      (5L, 200L, ts("2024-01-01 10:00:00"))  // other key -> own session 1
    ).toDF("event_id", "uid", "ts")
    val out = Sessionize
      .withSessionIds(events, "uid", "ts", "event_id", gapSeconds = 3600L)
      .select("event_id", "session_seq")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize: summary rolls up bounds and counts") {
    val events = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 10:30:00")),
      (3L, 100L, ts("2024-01-01 15:00:00"))
    ).toDF("event_id", "uid", "ts")
    val s = Sessionize.withSessionIds(events, "uid", "ts", "event_id", 3600L)
    val sums = Sessionize.sessionSummary(s, "uid", "ts").orderBy("session_seq").collect()
    assert(sums.length == 2)
    assert(sums(0).getAs[Long]("n_events") == 2)
    assert(sums(1).getAs[Timestamp]("session_start") == ts("2024-01-01 15:00:00"))
  }

  test("salted aggregation equals the plain groupBy on exact types") {
    val li = Tables.lineitem(spark, Sf)
    val salted = Skew
      .saltedAgg(
        li,
        keys = Seq("l_returnflag"),
        saltFrom = Seq("l_orderkey", "l_linenumber"),
        nSalts = 8,
        sums = Map("sum_qty" -> col("l_quantity").cast("decimal(18,2)"))
      )
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2).toPlainString)))
      .toMap
    val plain = li
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2).toPlainString)))
      .toMap
    assert(salted == plain)
  }

  test("salted aggregation plans two hash-aggregate stages over the salt") {
    val plan = Skew
      .saltedAgg(
        Tables.lineitem(spark, Sf),
        keys = Seq("l_returnflag"),
        saltFrom = Seq("l_orderkey"),
        nSalts = 8,
        sums = Map("sum_qty" -> col("l_quantity").cast("decimal(18,2)"))
      )
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
  }

  test("range join: bucketed containment equals the naive nested-loop join") {
    import graft.operators.RangeJoin
    // intervals crafted to hit boundary cases: exact-start / exact-end
    // probes (closed interval), a span crossing bucket boundaries, a
    // zero-width interval, and an interval with no matches at all
    val intervals = Seq(
      (1L, ts("2024-01-01 00:10:00"), ts("2024-01-01 03:20:00")), // 4 buckets @1h
      (2L, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:00:00")), // zero-width
      (3L, ts("2024-02-01 00:00:00"), ts("2024-02-01 00:30:00"))  // no probes
    ).toDF("iv_id", "lo", "hi")
    val probes = Seq(
      (100L, ts("2024-01-01 00:10:00")), // == lo of iv 1 (inclusive)
      (101L, ts("2024-01-01 03:20:00")), // == hi of iv 1 (inclusive)
      (102L, ts("2024-01-01 01:00:00")), // inside iv 1, == iv 2 both ends
      (103L, ts("2024-01-01 03:20:01")), // just past hi of iv 1
      (104L, ts("2023-12-31 23:59:59"))  // before everything
    ).toDF("p_id", "p_ts")

    val bucketed = RangeJoin
      .bucketedContainJoin(intervals, probes, "lo", "hi", "p_ts", bucketSeconds = 3600L)
      .select("iv_id", "p_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val naive = intervals
      .crossJoin(probes)
      .where(col("p_ts") >= col("lo") && col("p_ts") <= col("hi"))
      .select("iv_id", "p_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(bucketed == naive)
    assert(bucketed == Set((1L, 100L), (1L, 101L), (1L, 102L), (2L, 102L)))

    // left variant: zero-match intervals survive with a 0 count
    val counts = RangeJoin
      .bucketedContainJoin(intervals, probes, "lo", "hi", "p_ts",
        bucketSeconds = 3600L, joinType = "left")
      .groupBy(col("iv_id"))
      .agg(count(col("p_id")).as("n"))
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(counts == Map(1L -> 3L, 2L -> 1L, 3L -> 0L))
  }

  test("range join plans an equi-join on the bucket id, not a nested loop") {
    import graft.operators.RangeJoin
    val spans = Tables.events(spark, Sf)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
    val probes = Tables.events(spark, Sf)
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val plan = RangeJoin
      .bucketedContainJoin(spans, probes, "lo", "hi", "p_ts", bucketSeconds = 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("overlap join: bucketed equals naive, each pair exactly once despite multi-bucket meetings") {
    import graft.operators.RangeJoin
    // crafted to hit: a pair sharing MANY buckets (dedup must keep one),
    // touching endpoints (closed intervals -> zero-length overlap
    // counts), nested intervals, zero-width, cross-midnight, disjoint
    val lhs = Seq(
      (1L, ts("2024-01-01 00:10:00"), ts("2024-01-01 07:50:00")), // 8 buckets @1h
      (2L, ts("2024-01-01 03:00:00"), ts("2024-01-01 03:00:00")), // zero-width
      (3L, ts("2024-01-01 23:30:00"), ts("2024-01-02 00:30:00")), // cross-midnight
      (4L, ts("2024-03-01 00:00:00"), ts("2024-03-01 01:00:00"))  // overlaps nothing
    ).toDF("l_id", "l_lo", "l_hi")
    val rhs = Seq(
      (10L, ts("2024-01-01 01:00:00"), ts("2024-01-01 06:00:00")), // 6 shared buckets with 1
      (11L, ts("2024-01-01 07:50:00"), ts("2024-01-01 09:00:00")), // touches 1's end exactly
      (12L, ts("2024-01-01 02:59:59"), ts("2024-01-01 03:00:01")), // straddles the zero-width 2
      (13L, ts("2024-01-02 00:00:00"), ts("2024-01-02 00:00:00")), // inside 3, zero-width
      (14L, ts("2024-02-01 00:00:00"), ts("2024-02-01 01:00:00"))  // disjoint from all
    ).toDF("r_id", "r_lo", "r_hi")

    // collect as a SEQ, not a set: a duplicated pair (the multi-bucket
    // bug this operator's canonical filter prevents) must fail
    val bucketed = RangeJoin
      .bucketedOverlapJoin(lhs, rhs, "l_lo", "l_hi", "r_lo", "r_hi", bucketSeconds = 3600L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
    val naive = lhs.crossJoin(rhs)
      .where(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
    assert(bucketed == naive)
    assert(bucketed == Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 12L), (3L, 13L)))

    // extraPred composes (and is applied before the output)
    val pred = RangeJoin
      .bucketedOverlapJoin(lhs, rhs, "l_lo", "l_hi", "r_lo", "r_hi",
        bucketSeconds = 3600L, extraPred = col("r_id") =!= 10L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
    assert(pred == Seq((1L, 11L), (1L, 12L), (2L, 12L), (3L, 13L)))
  }

  test("overlap join: explicit and auto shuffle width agree; in-memory inputs auto-size to defaultParallelism") {
    import graft.operators.RangeJoin
    def spans(p: String) = Tables.events(spark, Sf)
      .groupBy(col("user_id").as(p + "user"), to_date(col("ts")).as(p + "day"))
      .agg(min(col("ts")).as(p + "lo"), max(col("ts")).as(p + "hi"))
    def run(width: Int) = RangeJoin
      .bucketedOverlapJoin(
        spans("l_"), spans("r_"), "l_lo", "l_hi", "r_lo", "r_hi",
        bucketSeconds = 21600L, extraPred = col("l_user") < col("r_user"),
        shufflePartitions = width)
      .select("l_user", "r_user").as[(Long, Long)].collect().toSeq.sorted
    assert(run(0) == run(7), "auto-sized width must not change the result")

    // in-memory inputs have no file stats: the sentinel exclusion must
    // fall back to defaultParallelism, not clamp to the 4096 max width
    val lhs = Seq((1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"))
      .toDF("l_id", "l_lo0", "l_hi0")
      .select(col("l_id"), col("l_lo0").cast("timestamp").as("l_lo"),
        col("l_hi0").cast("timestamp").as("l_hi"))
    val auto = RangeJoin.bucketedOverlapJoin(
      lhs, lhs.toDF("r_id", "r_lo", "r_hi"), "l_lo", "l_hi", "r_lo", "r_hi",
      bucketSeconds = 3600L, extraPred = col("l_id") <= col("r_id"))
    val nParts = auto.rdd.getNumPartitions
    assert(nParts <= spark.sparkContext.defaultParallelism,
      s"tiny in-memory input sized to $nParts partitions")
  }

  test("overlap join pair budget: top-N rights per left interval, deterministic order") {
    import graft.operators.RangeJoin
    def ts(s: String) = col(s).cast("timestamp")
    val lhs = Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
      (2L, "2024-01-01 10:00:00", "2024-01-01 12:00:00") // same span, distinct key
    ).toDF("l_id", "l_lo0", "l_hi0")
      .select(col("l_id"), ts("l_lo0").as("l_lo"), ts("l_hi0").as("l_hi"))
    val rhs = Seq(
      (10L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"), // overlap 2h
      (11L, "2024-01-01 11:00:00", "2024-01-01 12:30:00"), // overlap 1h
      (12L, "2024-01-01 11:30:00", "2024-01-01 13:00:00")  // overlap 30m
    ).toDF("r_id", "r_lo0", "r_hi0")
      .select(col("r_id"), ts("r_lo0").as("r_lo"), ts("r_hi0").as("r_hi"))

    // budget 2 keeps, PER left interval identity (span + l_id key), the
    // two longest overlaps — the contract that bounds the output when
    // the raw pair space is quadratic
    val capped = RangeJoin
      .bucketedOverlapJoin(lhs, rhs, "l_lo", "l_hi", "r_lo", "r_hi",
        bucketSeconds = 3600L, maxPairsPerLeft = 2, pairBudgetKeys = Seq("l_id"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
    assert(capped == Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)))

    // budget off returns the full pair space
    val full = RangeJoin
      .bucketedOverlapJoin(lhs, rhs, "l_lo", "l_hi", "r_lo", "r_hi", bucketSeconds = 3600L)
      .count()
    assert(full == 6L)
  }

  test("overlap join plans a bucket equi-join with no dedup aggregation") {
    import graft.operators.RangeJoin
    def spans(p: String) = Tables.events(spark, Sf)
      .groupBy(col("user_id").as(p + "user"), to_date(col("ts")).as(p + "day"))
      .agg(min(col("ts")).as(p + "lo"), max(col("ts")).as(p + "hi"))
    val out = RangeJoin.bucketedOverlapJoin(
      spans("l_"), spans("r_"), "l_lo", "l_hi", "r_lo", "r_hi",
      bucketSeconds = 21600L, extraPred = col("l_user") < col("r_user"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join degenerated:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"))
    // the canonical-bucket filter replaces a distinct pass: the plan must
    // NOT re-aggregate the join output (dedup-free by construction)
    val afterJoin = plan.substring(0, plan.indexOf("Join"))
    assert(!afterJoin.contains("HashAggregate"), s"unexpected post-join dedup:\n$plan")
  }

  test("sweep count: closed-interval boundary semantics, ties included exactly once") {
    import graft.operators.RangeJoin
    val iv = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00")), // degenerate a == b
      (3L, ts("2024-01-01 23:00:00"), ts("2024-01-01 23:30:00"))  // empty span
    ).toDF("id", "lo", "hi")
    val probes = Seq(
      ts("2024-01-01 09:59:59"), // before iv1
      ts("2024-01-01 10:00:00"), // AT iv1.lo — closed: counted
      ts("2024-01-01 11:00:00"),
      ts("2024-01-01 12:00:00"), // AT iv1.hi and the whole of iv2
      ts("2024-01-01 12:00:00"), // duplicate timestamp — both counted
      ts("2024-01-01 12:00:01")  // after
    ).toDF("p_ts")
    val out = RangeJoin
      .sweepContainCount(iv, probes, "lo", "hi", "p_ts",
        keyCols = Seq("id"), epoch = to_date(_))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 4L, 2L -> 2L, 3L -> 0L))
  }

  test("sweep count: matches the bucketed containment join on real events") {
    import graft.operators.RangeJoin
    val ev = Tables.events(spark, Sf)
    val spans = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"), count(lit(1)).as("n_own"))
    val sweep = RangeJoin
      .sweepContainCount(spans, ev.select(col("ts").as("p_ts")), "lo", "hi", "p_ts",
        keyCols = Seq("user_id", "day", "n_own"), epoch = to_date(_))
      .select(col("user_id"), col("day"), (col("n_in_span") - col("n_own")).as("n"))
    val joined = RangeJoin
      .bucketedContainJoin(
        spans.drop("n_own"),
        ev.select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts")),
        "lo", "hi", "p_ts", bucketSeconds = 3600L,
        extraPred = col("p_user") =!= col("user_id"), joinType = "left")
      .groupBy(col("user_id"), col("day"))
      .agg(count(col("p_id")).as("n"))
    assert(sweep.collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2)).toMap
      == joined.collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2)).toMap)
  }

  test("sweep count: NO join operator — one window, one final aggregate") {
    import graft.operators.RangeJoin
    val ev = Tables.events(spark, Sf)
    val spans = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
    val plan = RangeJoin
      .sweepContainCount(spans, ev.select(col("ts").as("p_ts")), "lo", "hi", "p_ts",
        keyCols = Seq("user_id", "day"), epoch = to_date(_))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"sweep count must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"sweep count must run as a window pass:\n$plan")
  }

  test("sweep count (global): epoch-crossing intervals, probe-free epochs, boundary ties") {
    import graft.operators.RangeJoin
    val iv = Seq(
      // crosses two days
      (1L, ts("2024-01-01 22:00:00"), ts("2024-01-02 02:00:00")),
      // crosses a probe-FREE day (Jan 3 has no probes): the prefix
      // offset for its end epoch must still resolve
      (2L, ts("2024-01-02 23:00:00"), ts("2024-01-03 12:00:00")),
      // whole-range interval
      (3L, ts("2024-01-01 00:00:00"), ts("2024-01-04 23:59:59")),
      (4L, ts("2024-01-04 05:00:00"), ts("2024-01-04 06:00:00")) // empty
    ).toDF("id", "lo", "hi")
    val probes = Seq(
      ts("2024-01-01 21:59:59"), // before iv1
      ts("2024-01-01 22:00:00"), // AT iv1.lo (closed)
      ts("2024-01-01 23:30:00"),
      ts("2024-01-02 01:00:00"),
      ts("2024-01-02 02:00:00"), // AT iv1.hi
      ts("2024-01-02 23:30:00"), // in iv2
      ts("2024-01-04 00:00:00")  // after iv2, inside iv3
    ).toDF("p_ts")
    val out = RangeJoin
      .sweepContainCountGlobal(iv, probes, "lo", "hi", "p_ts",
        keyCols = Seq("id"), epoch = to_date(_))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 4L, 2L -> 1L, 3L -> 7L, 4L -> 0L))
  }

  test("sweep count (global): matches the same-epoch sweep when intervals fit one epoch") {
    import graft.operators.RangeJoin
    val ev = Tables.events(spark, Sf)
    val spans = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
    def counts(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    val local = counts(RangeJoin.sweepContainCount(
      spans, ev.select(col("ts").as("p_ts")), "lo", "hi", "p_ts",
      keyCols = Seq("user_id", "day"), epoch = to_date(_))
      .select(col("user_id"), col("day"), col("n_in_span")))
    val global = counts(RangeJoin.sweepContainCountGlobal(
      spans, ev.select(col("ts").as("p_ts")), "lo", "hi", "p_ts",
      keyCols = Seq("user_id", "day"), epoch = to_date(_))
      .select(col("user_id"), col("day"), col("n_in_span")))
    assert(local == global)
  }

  test("sweep count (global): the only join is the broadcast of the epoch-offset table") {
    import graft.operators.RangeJoin
    val ev = Tables.events(spark, Sf)
    val spans = ev
      .groupBy(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
    val plan = RangeJoin
      .sweepContainCountGlobal(spans, ev.select(col("ts").as("p_ts")), "lo", "hi", "p_ts",
        keyCols = Seq("user_id", "week"), epoch = to_date(_))
      .queryExecution.executedPlan.toString
    val joins = "Join".r.findAllIn(plan).size
    assert(plan.contains("BroadcastHashJoin"),
      s"offsets must broadcast onto the markers:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
      !plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"no corpus-sized join is allowed in the count path (found $joins Join nodes):\n$plan")
  }

  test("sweep count: an epoch-crossing interval fails loudly, never undercounts") {
    import graft.operators.RangeJoin
    val iv = Seq((1L, ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00"))).toDF("id", "lo", "hi")
    val probes = Seq(ts("2024-01-01 23:30:00")).toDF("p_ts")
    val e = intercept[Exception] {
      RangeJoin.sweepContainCount(iv, probes, "lo", "hi", "p_ts",
        keyCols = Seq("id"), epoch = to_date(_)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("crosses epochs")), s"unexpected failure: $e")
  }
}
