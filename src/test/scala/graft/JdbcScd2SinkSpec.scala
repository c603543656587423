package graft

import graft.jobs.{BatchPipeline, FeedSpec}
import graft.operators.Scd2
import graft.sinks.JdbcScd2Sink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden SCD2 lifecycle against the JDBC sink (embedded Derby) — the
  * same invariants PipelineSpec pins for the parquet snapshot:
  *   - exactly one ACTIVE_FLAG=1 row per business key
  *   - UPDATE closes the old row (ACTIVE_FLAG=0, END_DATE=new START_DATE)
  *   - DUPLICATE rows are never written
  *   - re-running the same batch is a no-op
  */
class JdbcScd2SinkSpec extends SparkSpec {
  import spark.implicits._

  private val spec = FeedSpec(
    keyCol = "id",
    sourcePrefix = "TST - ",
    tiebreak = Seq(col("version").desc),
    mandatoryCols = Seq("name", "status")
  )
  private val Eot = "2099-12-31 00:00:00"

  /** BatchPipeline.runIncrement with the JDBC sink as the mart. */
  private def runJdbc(url: String, table: String, feed: DataFrame, loadTs: String) = {
    val conformed = BatchPipeline.conformFeed(feed, spec)
    val snapshot = JdbcScd2Sink.readSnapshot(spark, url, table, conformed.schema)
    val routed   = BatchPipeline.route(conformed, snapshot)
    JdbcScd2Sink.merge(spark, url, table, routed, BatchPipeline.SsiCol, loadTs, Eot)
  }

  private def snap(url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  test("two increments + re-run against Derby: SCD2 invariants hold") {
    val url   = s"jdbc:derby:${tempDir("graft_derby")}/db;create=true"
    val table = "CSD_DATA_MART"

    val feed1 = Seq(
      (1L, 1, "alpha", "OPEN"),
      (1L, 2, "alpha-v2", "OPEN"),
      (2L, 1, null.asInstanceOf[String], "OPEN")
    ).toDF("id", "version", "name", "status")
    val audit1 = runJdbc(url, table, feed1, "2024-01-01 00:00:00")
    assert(audit1.total == 2)

    val s1 = snap(url, table)
    assert(s1.count() == 2)
    assert(s1.where(col(Scd2.ActiveFlag) === 1).count() == 2)
    assert(s1.where(col("id") === 1).select("name").as[String].head() == "alpha-v2")

    val feed2 = Seq(
      (1L, 3, "alpha-v3", "CLOSED"),
      (2L, 1, null.asInstanceOf[String], "OPEN"), // unchanged -> DUPLICATE
      (3L, 1, "gamma", "OPEN")
    ).toDF("id", "version", "name", "status")
    val audit2 = runJdbc(url, table, feed2, "2024-02-01 00:00:00")
    assert(audit2.total == 2)

    val s2 = snap(url, table)
    assert(s2.count() == 4) // k1 old+new, k2, k3 — no DUPLICATE written
    val actives = s2
      .where(col(Scd2.ActiveFlag) === 1)
      .groupBy("id")
      .count()
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(actives == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val k1 = s2
      .where(col("id") === 1)
      .select("name", Scd2.ActiveFlag, Scd2.StartDate, Scd2.EndDate)
      .as[(String, Int, String, String)]
      .collect()
      .sortBy(_._3)
    assert(k1(0) == ("alpha-v2", 0, "2024-01-01 00:00:00", "2024-02-01 00:00:00"))
    assert(k1(1) == ("alpha-v3", 1, "2024-02-01 00:00:00", Eot))

    // idempotence: replay of increment 2 routes everything DUPLICATE
    val before = snap(url, table)
      .select("id", "name", Scd2.ActiveFlag, Scd2.StartDate, Scd2.EndDate)
      .as[(Long, String, Int, String, String)]
      .collect()
      .sortBy(r => (r._1, r._4))
    val audit3 = runJdbc(url, table, feed2, "2024-03-01 00:00:00")
    assert(audit3.total == 0)
    val after = snap(url, table)
      .select("id", "name", Scd2.ActiveFlag, Scd2.StartDate, Scd2.EndDate)
      .as[(Long, String, Int, String, String)]
      .collect()
      .sortBy(r => (r._1, r._4))
    assert(after.toSeq == before.toSeq)
  }

  test("explicit staging-append parallelism is a pure physical knob") {
    // round-14: stagingPartitions sets how many batched-INSERT
    // connections the target sees (the parallel-target contract seam);
    // it must never change WHAT lands. Same two increments through
    // 1-way and 4-way staging appends -> byte-identical snapshots.
    def load(parts: Int): Set[(Long, String, Int, String, String)] = {
      val url   = s"jdbc:derby:${tempDir(s"graft_derby_p$parts")}/db;create=true"
      val table = "CSD_MART_PARTS"
      for ((feed, ts) <- Seq(
          Seq((1L, 1, "alpha", "OPEN"), (2L, 1, "beta", "OPEN")) -> "2024-01-01 00:00:00",
          Seq((1L, 2, "alpha-v2", "CLOSED"), (3L, 1, "gamma", "OPEN")) -> "2024-02-01 00:00:00")) {
        val conformed = BatchPipeline.conformFeed(
          feed.toDF("id", "version", "name", "status"), spec)
        val snapshot = JdbcScd2Sink.readSnapshot(spark, url, table, conformed.schema)
        val routed   = BatchPipeline.route(conformed, snapshot)
        JdbcScd2Sink.merge(spark, url, table, routed, BatchPipeline.SsiCol, ts, Eot,
          stagingPartitions = parts)
      }
      snap(url, table)
        .select("id", "name", Scd2.ActiveFlag, Scd2.StartDate, Scd2.EndDate)
        .as[(Long, String, Int, String, String)].collect().toSet
    }
    val one = load(1)
    assert(one == load(4))
    assert(one.size == 4)
    assert(one.count(_._3 == 1) == 3)
  }

  test("merge indexes the target's close-out probe columns") {
    // the round-10 driver bench timed out on an UNINDEXED Derby
    // nested-loop close-out (8.4e9 row compares at sf0.1) — this pins
    // that the index the fix creates actually exists after a merge
    val url   = s"jdbc:derby:${tempDir("graft_derby_ix")}/db;create=true"
    val table = "CSD_MART_IX"
    val feed  = Seq((1L, 1, "a", "OPEN")).toDF("id", "version", "name", "status")
    runJdbc(url, table, feed, "2024-01-01 00:00:00")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getIndexInfo(null, null, table, false, false)
      val cols = scala.collection.mutable.Map.empty[String, List[String]]
      while (rs.next()) {
        val ix = rs.getString("INDEX_NAME")
        if (ix != null)
          cols(ix.toUpperCase) =
            cols.getOrElse(ix.toUpperCase, Nil) :+ rs.getString("COLUMN_NAME")
      }
      rs.close()
      val want = JdbcScd2Sink.targetIndexName(table).toUpperCase
      assert(cols.contains(want), s"missing close-out index $want; found ${cols.keySet}")
      assert(cols(want) == List(BatchPipeline.SsiCol, Scd2.ActiveFlag))
    } finally conn.close()
  }

  test("failed transaction leaves the target untouched (staging rollback)") {
    val url   = s"jdbc:derby:${tempDir("graft_derby_rb")}/db;create=true"
    val table = "CSD_MART_RB"
    val feed = Seq((1L, 1, "a", "OPEN")).toDF("id", "version", "name", "status")
    runJdbc(url, table, feed, "2024-01-01 00:00:00")
    val rows = snap(url, table).count()

    // a second merge whose driver-side SQL fails (bad key column) must
    // not change the target
    val conformed = BatchPipeline.conformFeed(
      Seq((2L, 1, "b", "OPEN")).toDF("id", "version", "name", "status"),
      spec
    )
    val snapshot = JdbcScd2Sink.readSnapshot(spark, url, table, conformed.schema)
    val routed   = BatchPipeline.route(conformed, snapshot)
    intercept[Exception] {
      JdbcScd2Sink.merge(spark, url, table, routed, "NO_SUCH_COLUMN", "2024-02-01 00:00:00", Eot)
    }
    assert(snap(url, table).count() == rows)
  }
}
