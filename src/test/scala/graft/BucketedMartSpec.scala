package graft

import graft.jobs.BatchPipeline
import graft.operators.{CdcRouter, Scd2}
import graft.sinks.SnapshotSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the at-scale CDC probe plan: with the mart stored as a table
  * BUCKETED by the business key, the probe's sort-merge join reads the
  * mart side's pre-hash-partitioned buckets with NO exchange — only the
  * delta-sized feed shuffles. At a 100 TB mart whose active set outgrows
  * broadcast range, this is the difference between re-shuffling the mart
  * every load and never touching it (VERDICT r5 item 2).
  */
class BucketedMartSpec extends SparkSpec {
  import spark.implicits._

  private def mart: DataFrame =
    (1 to 200).map { k =>
      (s"ORD - $k", s"hash-$k", if (k % 10 == 0) 0 else 1,
        "2024-01-01 00:00:00", "2099-12-31 00:00:00")
    }.toDF(BatchPipeline.SsiCol, BatchPipeline.HashCol,
      Scd2.ActiveFlag, Scd2.StartDate, Scd2.EndDate)

  private def feed: DataFrame =
    (150 to 250).map { k =>
      (s"ORD - $k", if (k % 4 == 0) s"hash-new-$k" else s"hash-$k")
    }.toDF(BatchPipeline.SsiCol, BatchPipeline.HashCol)

  test("bucketed mart table: probe join shuffles the feed side only, routing unchanged") {
    val dir   = tempDir("bucketed-mart")
    val table = "graft_mart_bucketed_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    SnapshotSink.writeMartBucketedTable(
      mart, table, s"$dir/t", BatchPipeline.SsiCol, nBuckets = 8)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def planOf(snapshot: DataFrame): String =
        BatchPipeline.routeSortMerge(feed, snapshot)
          .queryExecution.executedPlan.toString
      val bucketedPlan = planOf(spark.table(table))
      assert(bucketedPlan.contains("Bucketed: true"), s"mart scan not bucketed:\n$bucketedPlan")

      // differential: the SAME probe over a flat parquet copy of the mart
      // needs exactly one more Exchange — the mart side's join shuffle
      val flatDir = s"$dir/flat"
      mart.write.parquet(flatDir)
      val flatPlan = planOf(spark.read.parquet(flatDir))
      def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(
        exchanges(bucketedPlan) == exchanges(flatPlan) - 1,
        s"expected one fewer Exchange with the bucketed mart " +
          s"(${exchanges(bucketedPlan)} vs ${exchanges(flatPlan)}):\n$bucketedPlan\n---\n$flatPlan")

      // routing is byte-for-byte the broadcast path's
      val got = BatchPipeline.routeSortMerge(feed, spark.table(table))
        .select(col(BatchPipeline.SsiCol), col(CdcRouter.RouterCol))
        .as[(String, String)].collect().toSet
      val want = BatchPipeline.route(feed, mart)
        .select(col(BatchPipeline.SsiCol), col(CdcRouter.RouterCol))
        .as[(String, String)].collect().toSet
      assert(got == want)
      // spot-check the three routes exist: 150..200 (active, same hash) ->
      // DUPLICATE unless k%4==0 -> UPDATE; 160/170/... closed-out actives
      // route as INSERT (no active match); 201..250 -> INSERT
      assert(got.contains(("ORD - 151", CdcRouter.Duplicate)))
      assert(got.contains(("ORD - 152", CdcRouter.Update)))
      assert(got.contains(("ORD - 160", CdcRouter.Insert)))
      assert(got.contains(("ORD - 201", CdcRouter.Insert)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
