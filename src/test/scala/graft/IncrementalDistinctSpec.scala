package graft

import graft.operators.IncrementalDistinct
import org.apache.spark.sql.functions._

class IncrementalDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def est(view: org.apache.spark.sql.DataFrame) =
    IncrementalDistinct
      .estimates(view, Seq("g"))
      .as[(String, Long)].collect().toMap

  test("incremental merge over a split equals the direct sketch's estimates") {
    val df = (1L to 5000L).map(i => (if (i % 2 == 0) "a" else "b", i % 700)).toDF("g", "v")
    val direct = IncrementalDistinct.sketches(df, Seq("g"), "v")
    val merged = IncrementalDistinct.merge(
      IncrementalDistinct.sketches(df.where(col("v") % 3 =!= 0), Seq("g"), "v"),
      IncrementalDistinct.sketches(df.where(col("v") % 3 === 0), Seq("g"), "v"),
      Seq("g")
    )
    // HLL union with a shared lgK is a register-wise max — estimates
    // agree EXACTLY with the direct build, not just approximately
    assert(est(merged) === est(direct))
  }

  test("union is idempotent: re-loading the same rows changes nothing") {
    val df = (1L to 2000L).map(i => ("x", i % 311)).toDF("g", "v")
    val once  = IncrementalDistinct.sketches(df, Seq("g"), "v")
    val twice = IncrementalDistinct.merge(once, IncrementalDistinct.sketches(df, Seq("g"), "v"), Seq("g"))
    assert(est(twice) === est(once))
  }

  test("groups present on only one side of a merge survive") {
    val a = IncrementalDistinct.sketches(Seq(("only_a", 1L)).toDF("g", "v"), Seq("g"), "v")
    val b = IncrementalDistinct.sketches(Seq(("only_b", 2L)).toDF("g", "v"), Seq("g"), "v")
    assert(est(IncrementalDistinct.merge(a, b, Seq("g"))) === Map("only_a" -> 1L, "only_b" -> 1L))
  }

  test("estimates stay within 5% of exact distincts on real data") {
    val li = Tables.lineitem(spark, Sf)
      .select(col("l_returnflag").as("g"), col("l_partkey").as("v"))
    val e = est(IncrementalDistinct.sketches(li, Seq("g"), "v"))
    val exact = li.distinct().groupBy("g").count().as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      // lgK 12 -> RSE 1.6%; 5% is ~3 sigma
      assert(math.abs(e(g) - n) <= math.max(1L, n / 20), s"group $g: est ${e(g)} vs exact $n")
    }
  }

  test("rolling 7-day distinct from per-day sketches matches the exact rolling count") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("ts"), col("user_id"))
    val est = IncrementalDistinct
      .rollingDistinctEstimates(ev, "ts", "user_id", nDays = 7)
      .as[(java.sql.Date, Long)].collect().toMap
    // exact twin: coverage expansion + distinct (the t_rolling_distinct
    // idiom) — per-user-day dedup then explode onto covered window ends
    val exact = ev
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .withColumn("day", explode(expr("sequence(d, date_add(d, 6))")))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .join(ev.select(to_date(col("ts")).as("day")).distinct(), Seq("day"), "left_semi")
      .as[(java.sql.Date, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (d, n) =>
      // 150 distinct users max: HLL at lgK 12 is exact at this cardinality
      assert(est(d) === n, s"window ending $d: est ${est(d)} vs exact $n")
    }
  }

  test("disk refresh: bootstrap, O(delta) second load, replayed slice absorbed") {
    val path = tempDir("incdistinct") + "/view"
    val all = (1L to 3000L).map(i => (if (i % 4 == 0) "p" else "q", i % 500)).toDF("g", "v")
    IncrementalDistinct.refresh(spark, path, all.where(col("v") < 300), Seq("g"), "v")
    val view = IncrementalDistinct.refresh(
      spark, path,
      // overlap: v in [200, 300) replays load 1 rows
      all.where(col("v") >= 200), Seq("g"), "v")
    val direct = IncrementalDistinct.sketches(all, Seq("g"), "v")
    assert(est(view) === est(direct))
    // the stored view is group-sized, not fact-sized
    assert(spark.read.parquet(path).count() === 2)
  }

  test("crash between the swap renames: .bak is restored, sketch history never lost") {
    val path = tempDir("incdistinctcrash") + "/view"
    val all = (1L to 1000L).map(i => ("g", i)).toDF("g", "v")
    IncrementalDistinct.refresh(spark, path, all.where(col("v") <= 900), Seq("g"), "v")
    // simulate the window: view renamed aside, staging never landed
    assert(new java.io.File(path).renameTo(new java.io.File(path + ".bak")))
    // next refresh must merge with the restored view, not bootstrap from
    // the 100-value delta alone
    val view = IncrementalDistinct.refresh(
      spark, path, all.where(col("v") > 900), Seq("g"), "v")
    // reference: the SAME two loads with no crash (sketch-union estimates
    // can differ slightly from a direct one-pass sketch, so the honest
    // comparison is crashed-run vs never-crashed-run)
    val ref = tempDir("incdistinctref") + "/view"
    IncrementalDistinct.refresh(spark, ref, all.where(col("v") <= 900), Seq("g"), "v")
    val refView = IncrementalDistinct.refresh(
      spark, ref, all.where(col("v") > 900), Seq("g"), "v")
    assert(est(view) === est(refView), "pre-crash sketches must survive via the .bak restore")
    // and the estimate reflects all 1000 values, not the 100-value delta
    assert(est(view)("g") > 900L)
  }
}
