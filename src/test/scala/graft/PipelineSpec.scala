package graft

import graft.jobs.{BatchPipeline, FeedSpec}
import graft.operators.Scd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end SCD2 lifecycle over two increments plus an idempotence
  * re-run (SURVEY §7.2's "minimum end-to-end slice", both halves), with
  * the reference invariants:
  *   - exactly one ACTIVE_FLAG=1 row per business key
  *   - UPDATE closes the old row (ACTIVE_FLAG=0, END_DATE=new START_DATE)
  *   - DUPLICATE rows are never written
  *   - re-running the same batch is a no-op (hash idempotence)
  *   - invalid rows load anyway, flagged IS_VALID_DATA=0
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val spec = FeedSpec(
    keyCol = "id",
    sourcePrefix = "TST - ",
    tiebreak = Seq(col("version").desc),
    mandatoryCols = Seq("name", "status")
  )

  private def snap(path: String): DataFrame = spark.read.parquet(path)

  test("two increments + re-run: SCD2 invariants hold") {
    val path = tempDir("graft_mart") + "/mart"

    // ---- increment 1: fresh mart; k1 has an in-feed duplicate (v2 wins),
    //      k2 has a NULL mandatory field -> loaded but invalid
    val feed1 = Seq(
      (1L, 1, "alpha", "OPEN"),
      (1L, 2, "alpha-v2", "OPEN"),
      (2L, 1, null.asInstanceOf[String], "OPEN")
    ).toDF("id", "version", "name", "status")
    val audit1 =
      BatchPipeline.runIncrement(spark, path, feed1, spec, loadTs = "2024-01-01 00:00:00")
    assert(audit1.total == 2 && audit1.valid == 1 && audit1.invalid == 1)

    val s1 = snap(path)
    assert(s1.count() == 2)
    assert(s1.where(col(Scd2.ActiveFlag) === 1).count() == 2)
    assert(
      s1.where(col("id") === 1).select("name").as[String].head() == "alpha-v2"
    ) // in-feed dedup kept the latest version

    // ---- increment 2: k1 updated, k2 resent unchanged (DUPLICATE),
    //      k3 new
    val feed2 = Seq(
      (1L, 3, "alpha-v3", "CLOSED"),
      (2L, 1, null.asInstanceOf[String], "OPEN"),
      (3L, 1, "gamma", "OPEN")
    ).toDF("id", "version", "name", "status")
    val audit2 =
      BatchPipeline.runIncrement(spark, path, feed2, spec, loadTs = "2024-02-01 00:00:00")
    assert(audit2.total == 2 && audit2.valid == 2 && audit2.invalid == 0)

    val s2 = snap(path)
    assert(s2.count() == 4) // k1 old+new, k2, k3 — no DUPLICATE written
    // exactly one active row per key
    val actives = s2
      .where(col(Scd2.ActiveFlag) === 1)
      .groupBy("id")
      .count()
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(actives == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // the closed k1 row chains into the new one
    val k1 = s2
      .where(col("id") === 1)
      .select("name", Scd2.ActiveFlag, Scd2.StartDate, Scd2.EndDate)
      .as[(String, Int, String, String)]
      .collect()
      .sortBy(_._3)
    assert(k1(0) == ("alpha-v2", 0, "2024-01-01 00:00:00", "2024-02-01 00:00:00"))
    assert(k1(1) == ("alpha-v3", 1, "2024-02-01 00:00:00", "2099-12-31 00:00:00"))

    // materialize BEFORE the next swap invalidates s2's file listing
    val s2rows = s2
      .select("id", "name", Scd2.ActiveFlag, Scd2.StartDate, Scd2.EndDate)
      .as[(Long, String, Int, String, String)]
      .collect()
      .sortBy(r => (r._1, r._4))

    // ---- idempotence: replaying increment 2 routes everything DUPLICATE
    val audit3 =
      BatchPipeline.runIncrement(spark, path, feed2, spec, loadTs = "2024-03-01 00:00:00")
    assert(audit3.total == 0)
    val s3rows = snap(path)
      .select("id", "name", Scd2.ActiveFlag, Scd2.StartDate, Scd2.EndDate)
      .as[(Long, String, Int, String, String)]
      .collect()
      .sortBy(r => (r._1, r._4))
    assert(s3rows.toSeq == s2rows.toSeq) // byte-for-byte no-op
  }

  test("asOf: half-open boundary returns exactly one version per key at every instant") {
    val path = tempDir("graft_asof") + "/mart"
    val feed1 = Seq((1L, 1, "alpha", "OPEN")).toDF("id", "version", "name", "status")
    BatchPipeline.runIncrement(spark, path, feed1, spec, loadTs = "2024-01-01 00:00:00")
    val feed2 = Seq((1L, 2, "alpha-v2", "CLOSED")).toDF("id", "version", "name", "status")
    BatchPipeline.runIncrement(spark, path, feed2, spec, loadTs = "2024-02-01 00:00:00")

    def names(ts: String): Seq[String] =
      Scd2.asOf(snap(path), lit(ts)).select("name").as[String].collect().toSeq

    // just before the close-out: only the old version
    assert(names("2024-01-31 23:59:59") == Seq("alpha"))
    // AT the close-out instant (old END_DATE == new START_DATE): only the
    // successor — the half-open interval must not return both or neither
    assert(names("2024-02-01 00:00:00") == Seq("alpha-v2"))
    // after: only the active version
    assert(names("2024-06-15 12:00:00") == Seq("alpha-v2"))
    // before the key existed: nothing
    assert(names("2023-12-31 00:00:00") == Seq.empty)
  }

  test("asOf: NULL END_DATE (foreign open-end convention) is treated as open-ended") {
    val snapshot = Seq(
      (1L, "v1", 0, "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
      (1L, "v2", 1, "2024-02-01 00:00:00", null.asInstanceOf[String])
    ).toDF("id", "name", Scd2.ActiveFlag, Scd2.StartDate, Scd2.EndDate)
    val active = Scd2.asOf(snapshot, lit("2024-06-01 00:00:00")).select("name").as[String].collect()
    assert(active.toSeq == Seq("v2"), "NULL END_DATE must not null-filter the active row")
  }

  test("changeFeed: (from, to] boundaries; open-ended rows never close") {
    val snapshot = Seq(
      // key 1: v1 closed at Feb, v2 open-ended (sentinel)
      (1L, "v1", 0, "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
      (1L, "v2", 1, "2024-02-01 00:00:00", "2099-12-31 23:59:59"),
      // key 2: unchanged since January (nothing in any later window)
      (2L, "w1", 1, "2024-01-01 00:00:00", "2099-12-31 23:59:59"),
      // key 3: NULL end (foreign convention) — open, must not close
      (3L, "x1", 1, "2024-02-01 00:00:00", null.asInstanceOf[String])
    ).toDF("id", "name", Scd2.ActiveFlag, Scd2.StartDate, Scd2.EndDate)
    def feed(from: String, to: String) =
      Scd2
        .changeFeed(snapshot, lit(from), lit(to))
        .select("change_type", "name")
        .as[(String, String)]
        .collect()
        .toSet
    // window catching the Feb transition: v1 closes, v2 and x1 open
    assert(
      feed("2024-01-01 00:00:00", "2024-02-01 00:00:00") ==
        Set(("CLOSE", "v1"), ("OPEN", "v2"), ("OPEN", "x1"))
    )
    // from-bound is EXCLUSIVE: a window starting AT the transition is empty
    assert(feed("2024-02-01 00:00:00", "2024-03-01 00:00:00") == Set.empty)
    // the January loads are visible from an earlier sync point
    assert(
      feed("2023-12-31 00:00:00", "2024-01-15 00:00:00") ==
        Set(("OPEN", "v1"), ("OPEN", "w1"))
    )
  }
}
