package graft.jobs

import graft.Tables
import graft.conform.{SourcePipelines, SyntheticFeeds}
import graft.queries.ConformQueries
import graft.sinks.AuditSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Orchestrated end-to-end run of the FULL reference operating mode —
  * feed -> per-source conform -> CDC route -> SCD2 upsert -> audit — for
  * all THREE sources against a pre-seeded snapshot
  * (`ETL/CSV_Batch_Processing.py:337-393` and siblings; SURVEY §2.11).
  *
  * The oracle gate checks operators one at a time; this harness times
  * and verifies the composed chain the reference actually runs in
  * production. Two loads per source:
  *
  *   1. SEED: 80% of the keyspace (keys with k % 5 != 0) — builds the
  *      active snapshot the real increment probes;
  *   2. INCREMENT: the full keyspace, with keys k % 7 == 0 carrying a
  *      mutated status (hash change -> UPDATE route), k % 5 == 0 new
  *      (INSERT), and everything else byte-identical (DUPLICATE) — the
  *      exact three-way route mix of a real day-2 load.
  *
  * Every count the summary emits is a deterministic function of the
  * orders keyspace, so the driver's rows/schema check and JobMainSpec's
  * audit-count assertions both pin it.
  */
object PipelineE2e {

  private val SeedTs = "2024-01-01 00:00:00"
  private val IncTs  = "2024-02-01 00:00:00"

  /** The shared deterministic feeds (SyntheticFeeds), with the day-2
    * status mutation (`variant`) that routes k % 7 == 0 keys as UPDATEs.
    */
  private def csvFeed(s: SparkSession, dir: String, variant: Int): DataFrame =
    SyntheticFeeds.csv(s, dir, Some(variant))
  private def jsonFeed(s: SparkSession, dir: String, variant: Int): DataFrame =
    SyntheticFeeds.json(s, dir, Some(variant))
  private def xmlFeed(s: SparkSession, dir: String, variant: Int): DataFrame =
    SyntheticFeeds.xml(s, dir, Some(variant))

  private def dims(s: SparkSession): SourcePipelines.Dims = {
    import s.implicits._
    SourcePipelines.Dims(
      agents = ConformQueries.Agents.toDF("PSEUDO_CODE", "AGENT_ID"),
      supportAreas = ConformQueries.Areas.toDF("SUPPORT_AREA_NAME", "SUPPORT_AREA_ID"),
      customerTypes = ConformQueries.CustTypes.toDF("CUSTOMER_TYPE_NAME", "CUSTOMER_TYPE_ID")
    )
  }

  /** Route + SCD2 upsert + audit — the shared job tail
    * ([[JobEnv.loadIncrement]] without the config plumbing).
    */
  private def loadTail(
      spark: SparkSession,
      martDir: String,
      auditDir: String,
      conformed: DataFrame,
      dataLoadId: Long,
      ts: String
  ): graft.sinks.AuditCounts = {
    // bucketed snapshot layout: probe and merge touch only the key
    // buckets this batch hits — O(delta) per load, not O(mart)
    val counts = BatchPipeline.loadIncrementBucketed(
      spark, martDir, conformed, ts, numBuckets = 16)
    AuditSink.record(spark, auditDir, dataLoadId, s"e2e_$dataLoadId", "SUCCESS", ts, ts, counts)
    counts
  }

  /** Seed + increment for the CSV source only, returning the full
    * post-increment mart projected to its deterministic columns — the
    * content-level correctness surface for the composed chain. Every
    * value is a closed-form function of the orders keyspace (the DuckDB
    * oracle replays conform + route + SCD2 analytically), so this turns
    * the e2e run from a rows-only check into a full row-multiset match.
    */
  def runCsvMart(spark: SparkSession, dir: String, workDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(workDir), true)
    val d     = dims(spark)
    val mart  = s"$workDir/csv/mart"
    val audit = s"$workDir/csv/audit"
    val tie   = Seq(col("DATE_OF_CALL").desc)
    loadTail(spark, mart, audit,
      SourcePipelines.conformCsv(
        csvFeed(spark, dir, 1).where(col("TICKET_IDENTIFIER") % 5 =!= 0), d, 1, 1001L, SeedTs, tie),
      1L, SeedTs)
    loadTail(spark, mart, audit,
      SourcePipelines.conformCsv(csvFeed(spark, dir, 2), d, 1, 1002L, IncTs, tie),
      2L, IncTs)
    spark.read.parquet(mart).select(
      col("SOURCE_SYSTEM_IDENTIFIER"), col("AGENT_ID"), col("SUPPORT_AREA_ID"),
      col("CUSTOMER_TYPE_ID"), col("INTERACTION_DATE"), col("INTERACTION_STATUS"),
      col("QUERY_STATUS"), col("HANDLE_TIME"), col("WORK_TIME"),
      col("FIRST_CONTACT_RESOLUTION"), col("SOLUTION_TYPE"), col("CUSTOMER_RATING"),
      col("IS_VALID_DATA"), col("DATA_LOAD_ID"), col("ACTIVE_FLAG"),
      col("START_DATE"), col("END_DATE"))
  }

  /** Run seed + increment for all three sources under `workDir`;
    * returns the 3-row summary (source, seed/increment audit counts,
    * post-increment active and total mart rows).
    */
  def run(spark: SparkSession, dir: String, workDir: String): DataFrame = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(workDir), true)
    val d = dims(spark)

    val sources: Seq[(String, Int => DataFrame, DataFrame => DataFrame, DataFrame => DataFrame)] =
      Seq(
        ("csv",
          (v: Int) => csvFeed(spark, dir, v),
          (f: DataFrame) => SourcePipelines.conformCsv(f, d, 1, 1001L, SeedTs,
            Seq(col("DATE_OF_CALL").desc)),
          (f: DataFrame) => SourcePipelines.conformCsv(f, d, 1, 1002L, IncTs,
            Seq(col("DATE_OF_CALL").desc))),
        ("json",
          (v: Int) => jsonFeed(spark, dir, v),
          (f: DataFrame) => SourcePipelines.conformJson(f, d, 2, 2001L, SeedTs,
            Seq(col("CONTACT_DATE").desc)),
          (f: DataFrame) => SourcePipelines.conformJson(f, d, 2, 2002L, IncTs,
            Seq(col("CONTACT_DATE").desc))),
        ("xml",
          (v: Int) => xmlFeed(spark, dir, v),
          (f: DataFrame) => SourcePipelines.conformXml(f, d, 3, 3001L, SeedTs,
            Seq(col("DATE_OF_INTERACTION").desc)),
          (f: DataFrame) => SourcePipelines.conformXml(f, d, 3, 3002L, IncTs,
            Seq(col("DATE_OF_INTERACTION").desc)))
      )

    // The three sources write to DISJOINT mart/audit dirs and share only
    // read-only inputs, so their load chains run CONCURRENTLY — Spark
    // accepts job submissions from multiple threads and interleaves
    // stages, which keeps the 32 cores busy while one source sits in a
    // write barrier (the multi-feed production shape; seed -> increment
    // order is preserved WITHIN each source's thread).
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(sources.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val rows =
      try {
        val futures = sources.map { case (name, feed, conformSeed, conformInc) =>
          Future {
            val mart  = s"$workDir/$name/mart"
            val audit = s"$workDir/$name/audit"
            val keyCol = name match {
              case "csv"  => "TICKET_IDENTIFIER"
              case "json" => "INTERACTION_ID"
              case _      => "SUPPORT_IDENTIFIER"
            }
            val seed = loadTail(spark, mart, audit,
              conformSeed(feed(1).where(col(keyCol) % 5 =!= 0)), 1L, SeedTs)
            val inc  = loadTail(spark, mart, audit, conformInc(feed(2)), 2L, IncTs)
            // one aggregation pass for both post-increment mart counts
            val stat = spark.read.parquet(mart)
              .agg(
                count(lit(1)).as("total"),
                coalesce(sum(when(col("ACTIVE_FLAG") === 1, 1L).otherwise(0L)), lit(0L)).as("actives"))
              .head()
            (name, seed.total, inc.total, inc.valid, stat.getLong(1), stat.getLong(0))
          }
        }
        futures.map(Await.result(_, Duration.Inf))
      } finally pool.shutdown()
    rows.toDF("source", "seed_rows", "inc_rows", "inc_valid", "active_rows", "mart_rows")
  }
}
