package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly (hand-computed points)") {
    val got = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (1023, 1023))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), bits = 10).as("z"))
      .as[Long]
      .collect()
      .toSeq
    // x -> even curve bits, y -> odd: z(3,5) = interleave(011, 101) = 100111b = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L, (1L << 20) - 1))
  }

  test("z div 4^k tiles are aligned 2^k-square blocks in both dimensions") {
    val full = spark
      .range(0, 1 << 12)
      .select((col("id") % 64).cast("int").as("x"), (col("id") / 64).cast("int").as("y"))
    val violations = full
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), bits = 6))
      .groupBy(expr("z div 16").as("tile")) // 4^2 cells -> 4x4 squares
      .agg(min($"x").as("xl"), max($"x").as("xh"), min($"y").as("yl"), max($"y").as("yh"))
      .where(
        expr("xh div 4 != xl div 4") || expr("yh div 4 != yl div 4") ||
          $"xh" - $"xl" > 3 || $"yh" - $"yl" > 3
      )
      .count()
    assert(violations == 0L)
  }

  test("zValueSql mirrors zValue bit-for-bit") {
    val df = spark
      .range(0, 2000)
      .select(((col("id") * 37) % 1024).cast("int").as("x"), ((col("id") * 91) % 1024).cast("int").as("y"))
    val diff = df
      .withColumn("z1", ZOrder.zValue(col("x"), col("y"), bits = 10))
      .withColumn("z2", expr(ZOrder.zValueSql("x", "y", bits = 10)))
      .where($"z1" =!= $"z2")
      .count()
    assert(diff == 0L)
  }

  test("clusterByZ yields non-overlapping per-partition curve ranges") {
    val df = Tables
      .lineitem(spark, Sf)
      .select(
        (col("l_partkey") % 1024).cast("int").as("x"),
        (col("l_suppkey") % 1024).cast("int").as("y")
      )
    val ranges = ZOrder
      .clusterByZ(df, col("x"), col("y"), bits = 10, numPartitions = 8)
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"), col("__z"))
      .groupBy("p")
      .agg(min("__z").as("lo"), max("__z").as("hi"))
      .as[(Int, Long, Long)]
      .collect()
      .sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _                               =>
    }
  }
}
