package graft

import graft.jobs.{BatchPipeline, FeedSpec}
import graft.operators.Scd2
import org.apache.spark.sql.functions._
import scala.util.Random

/** The reference generators' fault model — 10% random field nulls, 25%
  * duplicate/updated business keys (FIXTURES.md; Data_Generators/
  * CSV_data_generator.py:135-148) — driven through the end-to-end
  * pipeline for several increments with the SCD2 invariants checked
  * after every load. Seeded, so failures reproduce.
  */
class FaultModelSpec extends SparkSpec {
  import spark.implicits._

  private val rnd      = new Random(42)
  private val statuses = Seq("OPEN", "CLOSED", "PENDING")

  private def genBatch(n: Int, keyPool: Int, version: Int) = {
    val rows = (1 to n).map { _ =>
      val id = 1L + rnd.nextInt(keyPool) // collisions = dups/updates
      val name =
        if (rnd.nextDouble() < 0.10) null else s"name-${rnd.nextInt(5)}"
      val status =
        if (rnd.nextDouble() < 0.10) null else statuses(rnd.nextInt(3))
      (id, version * 1000 + rnd.nextInt(1000), name, status)
    }
    rows.toDF("id", "version", "name", "status")
  }

  test("random increments: one active row per key, monotone history, replay no-op") {
    val path = tempDir("graft_fault") + "/mart"
    val spec = FeedSpec(
      keyCol = "id",
      sourcePrefix = "GEN - ",
      tiebreak = Seq(col("version").desc),
      mandatoryCols = Seq("name", "status")
    )

    var lastCount = 0L
    for (inc <- 1 to 4) {
      val feed = genBatch(n = 40, keyPool = 25, version = inc)
      val audit =
        BatchPipeline.runIncrement(spark, path, feed, spec, loadTs = f"2024-0$inc-01 00:00:00")
      val snap = spark.read.parquet(path)

      // exactly one active row per key ever seen
      val perKey = snap
        .where(col(Scd2.ActiveFlag) === 1)
        .groupBy("id")
        .count()
      assert(perKey.where(col("count") =!= 1).count() == 0, s"increment $inc")

      // closed rows end exactly when a successor starts
      val dangling = snap
        .where(col(Scd2.ActiveFlag) === 0)
        .select(col("id"), col(Scd2.EndDate).as("closed_at"))
        .join(
          snap.select(col("id"), col(Scd2.StartDate).as("started_at")),
          Seq("id")
        )
        .groupBy("id", "closed_at")
        .agg(max(when(col("started_at") === col("closed_at"), 1).otherwise(0)).as("chained"))
        .where(col("chained") === 0)
      assert(dangling.count() == 0, s"increment $inc: broken END->START chain")

      // history only grows, by exactly the non-duplicate load count
      val count = snap.count()
      assert(count == lastCount + audit.total, s"increment $inc")
      lastCount = count

      // audit partitions cleanly
      assert(audit.valid + audit.invalid == audit.total)
    }

    // replaying the last batch unchanged must be a total no-op
    rnd.setSeed(99)
    val replay = genBatch(40, 25, 4)
    val a1 = BatchPipeline.runIncrement(spark, path, replay, spec, "2024-05-01 00:00:00")
    val countAfter1 = spark.read.parquet(path).count()
    val a2 = BatchPipeline.runIncrement(spark, path, replay, spec, "2024-06-01 00:00:00")
    assert(a2.total == 0, "identical replay must route all DUPLICATE")
    assert(spark.read.parquet(path).count() == countAfter1)
    assert(a1.total >= 0) // first pass may insert/update freely
  }
}
