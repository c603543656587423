package graft

import org.apache.spark.sql.functions._

/** Pins the planner behaviors a 100 TB deployment leans on but no oracle
  * row can express — the contracts between this library's layout
  * decisions and Catalyst's cost-based choices:
  *
  *   - catalog STATS drive join strategy: after ANALYZE TABLE, a
  *     small-by-stats side broadcasts with NO explicit broadcast() hint
  *     (the library hand-broadcasts known-small dims, but ad-hoc user
  *     queries rely on stats doing this);
  *   - two tables bucketed the same way sort-merge-join with ZERO
  *     exchanges (BucketedStoreSpec pins the one-sided case; this is the
  *     full co-located join both sides pre-paid for at write time);
  *   - a selective dim filter injects a RUNTIME bloom filter into the
  *     fact scan of a shuffle join (the row-level sibling of dynamic
  *     partition pruning: DPP prunes directories, the bloom filter
  *     prunes rows before the shuffle).
  */
class PlannerContractsSpec extends SparkSpec {
  import spark.implicits._

  /** DROP TABLE alone is not idempotent across crashed runs: a fresh
    * Derby metastore forgets the table but the managed-table *directory*
    * under spark-warehouse survives, and the next saveAsTable dies with
    * LOCATION_ALREADY_EXISTS. Drop both.
    */
  private def dropTableAndDir(names: String*): Unit = names.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = new java.io.File(wh, t)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
      f.delete(); ()
    }
    if (dir.exists()) rm(dir)
  }

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("catalog stats auto-broadcast a small table without a hint") {
    dropTableAndDir("pc_dim")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").write.saveAsTable("pc_dim")
    spark.sql("ANALYZE TABLE pc_dim COMPUTE STATISTICS")
    val stats = spark.table("pc_dim").queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 10L * 1024 * 1024)

    val fact = spark.range(10000).select($"id" % 3 + 1 as "k", $"id" as "m")
    val joined = fact.join(spark.table("pc_dim"), "k") // no broadcast() hint
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"stats did not drive a broadcast:\n$plan")
    assert(joined.count() == 10000)
  }

  test("matching bucketed tables join with zero exchanges") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      dropTableAndDir("pc_ba", "pc_bb")
      spark.range(1000).select($"id" % 50 as "k", $"id" as "a")
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("pc_ba")
      spark.range(500).select($"id" % 50 as "k", $"id" as "b")
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("pc_bb")

      val joined = spark.table("pc_ba").join(spark.table("pc_bb"), "k")
      assert(joined.count() == 1000 * 10) // 50 keys x 20 x 10 matches
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed-bucketed join still shuffles:\n$plan")
    }
  }

  test("selective dim filter injects a runtime bloom filter into the fact side") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // shuffle join (bloom's target shape)
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB"
    ) {
      val factDir = tempDir("pc-bloom-fact")
      val dimDir  = tempDir("pc-bloom-dim")
      spark.range(50000).select($"id" % 1000 as "k", $"id" as "m")
        .write.mode("overwrite").parquet(factDir)
      spark.range(1000).select($"id" as "k", ($"id" % 7) as "tag")
        .write.mode("overwrite").parquet(dimDir)

      val joined = spark.read.parquet(factDir)
        .join(spark.read.parquet(dimDir).where($"tag" === 0), "k")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter"), s"no runtime bloom filter injected:\n$plan")
      assert(joined.count() == 143 * 50) // ceil(1000/7)=143 keys x 50 fact rows
    }
  }
}
