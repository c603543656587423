package graft

import graft.jobs.{CsvBatchJob, JobEnv, JsonBatchJob, XmlBatchJob}
import graft.sinks.AuditSink
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** End-to-end runnable-job lifecycle: config file -> feed file -> conform
  * -> route -> SCD2 mart -> audit row, for all three per-source jobs
  * (reference ETL/{CSV,JSON,XML}_Batch_Processing.py main()).
  */
class JobMainSpec extends SparkSpec {
  import spark.implicits._

  private def writeDims(dir: String): Unit = {
    Seq(("agent_a", 11), ("agent_b", 12))
      .toDF("PSEUDO_CODE", "AGENT_ID")
      .write.mode("overwrite").parquet(s"$dir/agents")
    Seq(("Billing", 21), ("Tech", 22))
      .toDF("SUPPORT_AREA_NAME", "SUPPORT_AREA_ID")
      .write.mode("overwrite").parquet(s"$dir/support_areas")
    Seq(("Corporate", 31), ("Retail", 32))
      .toDF("CUSTOMER_TYPE_NAME", "CUSTOMER_TYPE_ID")
      .write.mode("overwrite").parquet(s"$dir/customer_types")
  }

  private def writeConfig(dir: String, loadTs: String): String = {
    val path = s"$dir/job.properties"
    Files.writeString(
      Paths.get(path),
      s"""mart.dir=$dir/mart
         |audit.dir=$dir/audit
         |dims.agents=$dir/dims/agents
         |dims.supportAreas=$dir/dims/support_areas
         |dims.customerTypes=$dir/dims/customer_types
         |load.ts=$loadTs
         |""".stripMargin
    )
    path
  }

  test("CsvBatchJob main(): two loads -> SCD2 mart + audit rows") {
    val dir = tempDir("graft_job_csv")
    writeDims(s"$dir/dims")

    val header =
      "TICKET_IDENTIFIER|SUPPORT_CATEGORY|AGENT_NAME|DATE_OF_CALL|CALL_STATUS|CALL_TYPE|TYPE_OF_CUSTOMER|DURATION|WORK_TIME|TICKET_STATUS|RESOLVED_IN_FIRST_CONTACT|RESOLUTION_CATEGORY|RATING"
    val feed1 = s"$dir/feed1.csv"
    Files.writeString(
      Paths.get(feed1),
      s"""$header
         |1|Billing|agent_a|01152024103000|Completed|Inbound|Corporate|120|30|Closed|1|Fixed|GOOD
         |2|Tech|agent_b|01152024110000|Completed|Inbound|Retail|60|10|Open|0|Pending|BAD
         |""".stripMargin
    )
    CsvBatchJob.main(Array(writeConfig(dir, "2024-01-20 00:00:00"), feed1, "1001"))

    val m1 = spark.read.parquet(s"$dir/mart")
    assert(m1.count() == 2)
    assert(m1.where(col("ACTIVE_FLAG") === 1).count() == 2)
    // the DEFAULT mart layout is the bucketed O(delta) one
    assert(
      new java.io.File(s"$dir/mart").listFiles().exists(_.getName.startsWith("KEY_BUCKET=")),
      "default layout must be bucketed")
    // conform really happened: lookup ids, decoded rating, parsed date
    val r1 = m1.where(col("SOURCE_SYSTEM_IDENTIFIER") === "AT&T - 1")
    assert(r1.select("AGENT_ID").as[Int].head() == 11)
    assert(r1.select("SUPPORT_AREA_ID").as[Int].head() == 21)
    assert(r1.select("CUSTOMER_TYPE_ID").as[Int].head() == 31)
    assert(r1.select("CUSTOMER_RATING").as[Int].head() == 4)
    assert(r1.select("INTERACTION_DATE").as[String].head() == "2024-01-15 10:30:00")

    // load 2: ticket 1 updated, ticket 2 unchanged (DUPLICATE), ticket 3 new
    val feed2 = s"$dir/feed2.csv"
    Files.writeString(
      Paths.get(feed2),
      s"""$header
         |1|Billing|agent_a|01152024103000|Reopened|Inbound|Corporate|120|30|Open|1|Fixed|GOOD
         |2|Tech|agent_b|01152024110000|Completed|Inbound|Retail|60|10|Open|0|Pending|BAD
         |3|Tech|agent_a|01162024090000|Completed|Outbound|Retail|45|5|Closed|1|Fixed|BEST
         |""".stripMargin
    )
    CsvBatchJob.main(Array(writeConfig(dir, "2024-02-20 00:00:00"), feed2, "1002"))

    val m2 = spark.read.parquet(s"$dir/mart")
    assert(m2.count() == 4) // ticket1 old+new, ticket2, ticket3
    assert(m2.where(col("ACTIVE_FLAG") === 1).count() == 3)
    val t1 = m2
      .where(col("SOURCE_SYSTEM_IDENTIFIER") === "AT&T - 1")
      .select("INTERACTION_STATUS", "ACTIVE_FLAG", "END_DATE")
      .as[(String, Int, String)]
      .collect()
      .sortBy(_._2)
    assert(t1(0) == ("Completed", 0, "2024-02-20 00:00:00"))
    assert(t1(1) == ("Reopened", 1, "2099-12-31 00:00:00"))

    // audit table: one row per load with the routed counts
    val audits = AuditSink
      .read(spark, s"$dir/audit")
      .select("DATA_LOAD_ID", "TOTAL_UPSERT_COUNT", "VALID_COUNT", "DATA_VALID_PERMILLE")
      .as[(Long, Long, Long, Long)]
      .collect()
      .sortBy(_._1)
    assert(audits.toSeq == Seq((1001L, 2L, 2L, 1000L), (1002L, 2L, 2L, 1000L)))
  }

  test("pipeline_e2e harness at sf0.1: audit counts are exact keyspace functions for all 3 sources") {
    val dir  = "/root/testdata/sf0.1"
    val work = tempDir("graft_e2e_spec")
    val out = graft.jobs.PipelineE2e
      .run(spark, dir, work)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    assert(out.keySet == Set("csv", "json", "xml"))

    // every emitted count is a pure function of the orders keyspace:
    // seed = keys with k%5 != 0; increment = all keys with k%7 == 0
    // mutated (UPDATE), k%5 == 0 new (INSERT), the rest DUPLICATE
    val k     = col("o_orderkey")
    val keys  = spark.read.parquet(s"$dir/orders.parquet").select(k).distinct()
    val n     = keys.count()
    val nSeed = keys.where(k % 5 =!= 0).count()
    val nUpd  = keys.where(k % 7 === 0 && k % 5 =!= 0).count()
    // the audit counts the LOADED batch — inserts + updates, duplicates
    // dropped (the reference's TOTAL_UPSERT_COUNT semantics)
    val nLoaded = (n - nSeed) + nUpd
    for (src <- Seq("csv", "json", "xml")) {
      val r = out(src)
      assert(r.getLong(1) == nSeed, s"$src seed_rows: ${r.getLong(1)} != $nSeed")
      assert(r.getLong(2) == nLoaded,
        s"$src inc_rows (inserts+updates): ${r.getLong(2)} != $nLoaded")
      assert(r.getLong(3) == nLoaded, s"$src inc_valid: every synthesized row is valid")
      assert(r.getLong(4) == n, s"$src active_rows: one active version per key")
      assert(r.getLong(5) == n + nUpd,
        s"$src mart_rows: actives plus the closed-out versions of updated keys")
      // the audit sink recorded both loads
      assert(AuditSink.read(spark, s"$work/$src/audit").count() == 2)
    }
  }

  test("partitioned mart layout: mart.partitionBy lays out hive dirs, reads stay correct") {
    val dir = tempDir("graft_job_part")
    writeDims(s"$dir/dims")
    val cfgPath = writeConfig(dir, "2024-01-20 00:00:00")
    Files.writeString(
      Paths.get(cfgPath),
      Files.readString(Paths.get(cfgPath)) + "mart.partitionBy=SOURCE_ID\n"
    )
    val header =
      "TICKET_IDENTIFIER|SUPPORT_CATEGORY|AGENT_NAME|DATE_OF_CALL|CALL_STATUS|CALL_TYPE|TYPE_OF_CUSTOMER|DURATION|WORK_TIME|TICKET_STATUS|RESOLVED_IN_FIRST_CONTACT|RESOLUTION_CATEGORY|RATING"
    val feed = s"$dir/feed.csv"
    Files.writeString(
      Paths.get(feed),
      s"""$header
         |1|Billing|agent_a|01152024103000|Completed|Inbound|Corporate|120|30|Closed|1|Fixed|GOOD
         |""".stripMargin
    )
    CsvBatchJob.main(Array(cfgPath, feed, "1001"))
    assert(new java.io.File(s"$dir/mart/SOURCE_ID=1").isDirectory)
    val m = spark.read.parquet(s"$dir/mart")
    assert(m.count() == 1)
    assert(m.where(col("SOURCE_ID") === 1).count() == 1) // partition col readable
  }

  test("pre-existing flat mart is honored: default config keeps merging flat, never mixes layouts") {
    val dir = tempDir("graft_job_flatcompat")
    writeDims(s"$dir/dims")
    val header =
      "TICKET_IDENTIFIER|SUPPORT_CATEGORY|AGENT_NAME|DATE_OF_CALL|CALL_STATUS|CALL_TYPE|TYPE_OF_CUSTOMER|DURATION|WORK_TIME|TICKET_STATUS|RESOLVED_IN_FIRST_CONTACT|RESOLUTION_CATEGORY|RATING"
    val feed1 = s"$dir/feed1.csv"
    Files.writeString(
      Paths.get(feed1),
      s"""$header
         |1|Billing|agent_a|01152024103000|Completed|Inbound|Corporate|120|30|Closed|1|Fixed|GOOD
         |""".stripMargin
    )
    // load 1 explicitly flat (a mart seeded by the legacy layout)
    val cfg1 = writeConfig(dir, "2024-01-20 00:00:00")
    Files.writeString(Paths.get(cfg1), Files.readString(Paths.get(cfg1)) + "mart.layout=flat\n")
    CsvBatchJob.main(Array(cfg1, feed1, "1001"))
    assert(!new java.io.File(s"$dir/mart").listFiles().exists(_.getName.startsWith("KEY_BUCKET=")))

    // load 2 with DEFAULT config: on-disk flat layout must win
    val feed2 = s"$dir/feed2.csv"
    Files.writeString(
      Paths.get(feed2),
      s"""$header
         |1|Billing|agent_a|01152024103000|Reopened|Inbound|Corporate|120|30|Open|1|Fixed|GOOD
         |""".stripMargin
    )
    CsvBatchJob.main(Array(writeConfig(dir, "2024-02-20 00:00:00"), feed2, "1002"))
    assert(!new java.io.File(s"$dir/mart").listFiles().exists(_.getName.startsWith("KEY_BUCKET=")))
    val m = spark.read.parquet(s"$dir/mart")
    assert(m.count() == 2 && m.where(col("ACTIVE_FLAG") === 1).count() == 1)
  }

  test("pre-existing bucketed mart is honored: mart.layout=flat cannot flip it") {
    val dir = tempDir("graft_job_bucketcompat")
    writeDims(s"$dir/dims")
    val header =
      "TICKET_IDENTIFIER|SUPPORT_CATEGORY|AGENT_NAME|DATE_OF_CALL|CALL_STATUS|CALL_TYPE|TYPE_OF_CUSTOMER|DURATION|WORK_TIME|TICKET_STATUS|RESOLVED_IN_FIRST_CONTACT|RESOLUTION_CATEGORY|RATING"
    val feed1 = s"$dir/feed1.csv"
    Files.writeString(
      Paths.get(feed1),
      s"""$header
         |1|Billing|agent_a|01152024103000|Completed|Inbound|Corporate|120|30|Closed|1|Fixed|GOOD
         |""".stripMargin
    )
    // load 1 with DEFAULT config: mart is created bucketed
    CsvBatchJob.main(Array(writeConfig(dir, "2024-01-20 00:00:00"), feed1, "1001"))
    assert(new java.io.File(s"$dir/mart").listFiles().exists(_.getName.startsWith("KEY_BUCKET=")))

    // load 2 requests the FLAT layout: the on-disk bucketed layout must
    // win (a flat full-rewrite against a bucketed mart would read the
    // KEY_BUCKET partition column into the payload and drop the
    // per-bucket swap discipline — i.e. corrupt the mart)
    val feed2 = s"$dir/feed2.csv"
    Files.writeString(
      Paths.get(feed2),
      s"""$header
         |1|Billing|agent_a|01152024103000|Reopened|Inbound|Corporate|120|30|Open|1|Fixed|GOOD
         |2|Tech|agent_b|01152024110000|Completed|Inbound|Retail|60|10|Open|0|Pending|BAD
         |""".stripMargin
    )
    val cfg2 = writeConfig(dir, "2024-02-20 00:00:00")
    Files.writeString(Paths.get(cfg2), Files.readString(Paths.get(cfg2)) + "mart.layout=flat\n")
    CsvBatchJob.main(Array(cfg2, feed2, "1002"))

    val martFiles = new java.io.File(s"$dir/mart").listFiles()
    assert(martFiles.exists(_.getName.startsWith("KEY_BUCKET=")), "bucketed layout must survive")
    assert(martFiles.forall(f => !f.getName.endsWith(".parquet") || f.getName.startsWith("_")),
      "no flat data files may appear beside the bucket dirs")
    // and the merge itself was a correct SCD2 roll
    val m = spark.read.parquet(s"$dir/mart")
    assert(m.count() == 3 && m.where(col("ACTIVE_FLAG") === 1).count() == 2)
    val t1 = m
      .where(col("SOURCE_SYSTEM_IDENTIFIER") === "AT&T - 1")
      .select("INTERACTION_STATUS", "ACTIVE_FLAG")
      .as[(String, Int)]
      .collect()
      .sortBy(_._2)
    assert(t1.toSeq == Seq(("Completed", 0), ("Reopened", 1)))
  }

  test("JsonBatchJob: envelope feed conforms and loads") {
    val dir = tempDir("graft_job_json")
    writeDims(s"$dir/dims")
    val feed = s"$dir/feed.json"
    Files.writeString(
      Paths.get(feed),
      """{"key": 1, "value": {"INTERACTION_ID": 7, "SUPPORT_CATEGORY": "Billing", "AGENT_PSEUDO_NAME": "agent_a", "CONTACT_DATE": "15/01/2024 10:30:00", "INTERACTION_STATUS": "Done", "INTERACTION_TYPE": "Chat", "TYPE_OF_CUSTOMER": "Corporate", "INTERACTION_DURATION": 100, "TOTAL_TIME": 130, "STATUS_OF_CUSTOMER_INCIDENT": "Closed", "RESOLVED_IN_FIRST_CONTACT": "yes", "SOLUTION_TYPE": "Fixed", "RATING": 9}}
        |""".stripMargin
    )
    val counts = JsonBatchJob.run(
      spark, JobEnv.loadConfig(writeConfig(dir, "2024-03-01 00:00:00")), feed, 2001L)
    assert(counts.total == 1 && counts.valid == 1)
    val row = spark.read.parquet(s"$dir/mart").where(col("SOURCE_SYSTEM_IDENTIFIER") === "AMAZON - 7")
    assert(row.select("WORK_TIME").as[Int].head() == 30)           // F10: TOTAL - DURATION
    assert(row.select("FIRST_CONTACT_RESOLUTION").as[Int].head() == 1) // yes -> 1
    assert(row.select("CUSTOMER_RATING").as[Int].head() == 4)      // 9 -> floor(9/2)
  }

  test("XmlBatchJob: payload lines parse and load") {
    val dir = tempDir("graft_job_xml")
    writeDims(s"$dir/dims")
    val feed = s"$dir/feed.xml"
    Files.writeString(
      Paths.get(feed),
      "<RECORD><SUPPORT_IDENTIFIER>42</SUPPORT_IDENTIFIER><CONTACT_REGARDING>Tech</CONTACT_REGARDING><AGENT_CODE>agent_b</AGENT_CODE><DATE_OF_INTERACTION>20240115103000</DATE_OF_INTERACTION><STATUS_OF_INTERACTION>Done</STATUS_OF_INTERACTION><TYPE_OF_INTERACTION>Call</TYPE_OF_INTERACTION><CUSTOMER_TYPE>Retail</CUSTOMER_TYPE><CONTACT_DURATION>0:02:30</CONTACT_DURATION><AFTER_CONTACT_WORK_TIME>0:00:45</AFTER_CONTACT_WORK_TIME><INCIDENT_STATUS>Closed</INCIDENT_STATUS><FIRST_CONTACT_RESOLUTION>true</FIRST_CONTACT_RESOLUTION><SOLUTION>Fixed</SOLUTION><RATING>5</RATING><TIME_STAMP>20240115103000</TIME_STAMP></RECORD>\n"
    )
    val counts = XmlBatchJob.run(
      spark, JobEnv.loadConfig(writeConfig(dir, "2024-03-01 00:00:00")), feed, 3001L)
    assert(counts.total == 1 && counts.valid == 1)
    val row = spark.read.parquet(s"$dir/mart").where(col("SOURCE_SYSTEM_IDENTIFIER") === "UBER - 42")
    assert(row.select("HANDLE_TIME").as[Int].head() == 150)  // U1: 0:02:30
    assert(row.select("WORK_TIME").as[Int].head() == 45)     // F11 via duration parse
    assert(row.select("AGENT_ID").as[Int].head() == 12)
    assert(row.select("INTERACTION_DATE").as[String].head() == "2024-01-15 10:30:00")
  }
}
