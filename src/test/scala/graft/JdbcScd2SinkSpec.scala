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
