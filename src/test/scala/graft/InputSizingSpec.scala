package graft

import graft.plans.InputSizing
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Contract of the shared input-stats shuffle sizer: stat-bearing
  * leaves (file scans, local relations) contribute their estimates;
  * stat-LESS leaves (RDD-backed frames — anything reporting the
  * spark.sql.defaultSizeInBytes sentinel) contribute NOTHING, so a tiny
  * stats-less input sizes to defaultParallelism instead of having
  * Long.MaxValue clamp it to the 4096 max width.
  */
class InputSizingSpec extends SparkSpec {
  import spark.implicits._

  private val schema =
    StructType(Seq(StructField("src", LongType), StructField("dst", LongType)))

  private def rddBacked = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(Row(1L, 2L), Row(2L, 3L)), 2),
    schema
  )

  test("stats-less RDD leaves are sentinel-excluded: width falls back to defaultParallelism") {
    val df = rddBacked
    val sentinel =
      spark.conf.get("spark.sql.defaultSizeInBytes", Long.MaxValue.toString).toLong
    assert(
      df.queryExecution.optimizedPlan.collectLeaves().head.stats.sizeInBytes == BigInt(sentinel),
      "fixture must actually hit the sentinel path")
    assert(InputSizing.statedInputBytes(df) == BigInt(0))
    assert(InputSizing.widthFor(df) == spark.sparkContext.defaultParallelism)
    // the Triangles regression the exclusion fixes: a 2-row stats-less
    // graph must NOT be clamped to the 4096 max wedge width
    assert(graft.operators.Triangles.perNode(df).rdd.getNumPartitions <= 64)
  }

  test("parquet-backed inputs contribute file-derived stats; width grows with granularity") {
    val events = Tables.events(spark, Sf)
    val bytes  = InputSizing.statedInputBytes(events)
    assert(bytes > 0, "file scan must report real stats")
    // a join with a stats-less side counts only the file leaf
    val mixed = events.join(rddBacked.toDF("user_id", "tag"), Seq("user_id"))
    assert(InputSizing.statedInputBytes(mixed) == bytes)
    // the default MiB granularity on a tiny file hits the parallelism
    // floor; per-byte granularity must grow toward the 4096 cap
    assert(InputSizing.widthFor(events) == spark.sparkContext.defaultParallelism)
    val fine = InputSizing.widthFor(events, bytesPerPartition = 1L)
    assert(fine > spark.sparkContext.defaultParallelism && fine <= 4096)
  }
}
