package graft

import graft.sinks.PartitionedLake
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class PartitionedLakeSpec extends SparkSpec {
  import spark.implicits._

  private def docs3 = Seq(
    (1L, "en", 10L),
    (2L, "en", 20L),
    (3L, "fr", 30L),
    (4L, "zh", 40L)
  ).toDF("doc_id", "lang", "n_chars")

  test("partition-column filter prunes directories at planning time") {
    val path = tempDir("lake-prune")
    PartitionedLake.write(docs3, path, Seq("lang"))

    val pruned = PartitionedLake.read(spark, path).where($"lang" === "en")
    val scan = pruned.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
      .head
    // the lang predicate is a PARTITION filter (directory-level listing
    // prune), not a pushed data filter that still opens every file
    assert(scan.partitionFilters.exists(_.toString.contains("lang")))
    val listed = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files)
      .map(_.getPath.toString)
    assert(listed.nonEmpty && listed.forall(_.contains("lang=en")), listed.mkString("\n"))
    assert(pruned.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("dynamic partition overwrite replaces only the partitions in the increment") {
    val path = tempDir("lake-dynamic")
    PartitionedLake.write(docs3, path, Seq("lang"))

    // re-load of the 'en' increment with revised rows
    val increment = Seq((1L, "en", 11L), (9L, "en", 90L)).toDF("doc_id", "lang", "n_chars")
    PartitionedLake.overwritePartitions(increment, path, Seq("lang"))

    val got = PartitionedLake
      .read(spark, path)
      .select($"doc_id", $"lang", $"n_chars")
      .as[(Long, String, Long)]
      .collect()
      .toSet
    assert(
      got == Set(
        (1L, "en", 11L), (9L, "en", 90L), // en replaced (2L gone)
        (3L, "fr", 30L), (4L, "zh", 40L)  // siblings untouched
      )
    )
  }

  test("dynamic overwrite of an identical increment is idempotent") {
    val path = tempDir("lake-idem")
    PartitionedLake.write(docs3, path, Seq("lang"))
    val before = PartitionedLake.read(spark, path).collect().toSet
    PartitionedLake.overwritePartitions(docs3.where($"lang" === "en"), path, Seq("lang"))
    val after = PartitionedLake.read(spark, path).collect().toSet
    assert(after == before)
  }

  test("compact collapses per-load small files to one per partition, data intact") {
    val path = tempDir("lake-compact")
    // three incremental loads -> >= 3 files per touched partition
    (0 until 3).foreach { load =>
      val inc = (0 until 10).map(i => (load * 100L + i, if (i % 2 == 0) "en" else "fr", i.toLong))
        .toDF("doc_id", "lang", "n_chars")
        .repartition(4) // small-file problem: multiple writers per partition
      if (load == 0) PartitionedLake.write(inc, path, Seq("lang"))
      else {
        inc.write.mode("append").partitionBy("lang").parquet(path)
      }
    }
    def filesPerPartition(): Map[String, Int] =
      new java.io.File(path).listFiles().filter(_.getName.startsWith("lang=")).map { d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    val before = PartitionedLake.read(spark, path).collect().toSet
    assert(filesPerPartition().values.forall(_ >= 3))

    PartitionedLake.compact(spark, path, Seq("lang"))
    assert(filesPerPartition() == Map("lang=en" -> 1, "lang=fr" -> 1))
    assert(PartitionedLake.read(spark, path).collect().toSet == before)

    // jumbo-partition escape hatch: bounded rows per file
    PartitionedLake.compact(spark, path, Seq("lang"), maxRecordsPerFile = 4)
    assert(filesPerPartition().values.forall(_ == 4)) // 15 rows / 4 -> 4 files
    assert(PartitionedLake.read(spark, path).collect().toSet == before)
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val path = tempDir("lake-dpp")
    // fact partitioned on the join key; dim filter is NOT a literal on the
    // fact, so static pruning can't fire — DPP injects a runtime subquery
    // partition discovery infers part_key=<n> dirs as INT — the dim key
    // must match that type exactly: a cast() around the partition column
    // in the join key disqualifies it from DPP
    val fact = spark.range(2000)
      .select($"id", ($"id" % 10).cast("int").as("part_key"))
    PartitionedLake.write(fact, path, Seq("part_key"))
    // the dim must be a real relation with a surviving Filter: a local
    // Seq would be constant-folded (filter and all) into a LocalRelation
    // and DPP would see no selective predicate to prune with
    val dimDir = tempDir("lake-dpp-dim")
    (0 until 10).map(k => (k, if (k == 3 || k == 7) "keep" else "drop"))
      .toDF("part_key", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    val saved = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try {
      val joined = PartitionedLake.read(spark, path)
        .join(dim.where($"tag" === "keep"), "part_key")
      // execute THIS queryExecution so the adaptive plan finalizes — a
      // .count() would plan (and prune) in a separate query execution
      assert(joined.collect().length == 400) // 2 of 10 partitions x 200 rows
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), s"no DPP subquery in plan:\n$plan")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", v)
      case None    => spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    }
  }

  test("full write replaces the whole table (static overwrite contract)") {
    val path = tempDir("lake-static")
    PartitionedLake.write(docs3, path, Seq("lang"))
    PartitionedLake.write(docs3.where($"lang" === "zh"), path, Seq("lang"))
    val langs = PartitionedLake.read(spark, path).select($"lang").distinct().as[String].collect()
    assert(langs.toSeq == Seq("zh"))
  }
}
