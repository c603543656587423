package graft.jobs

import graft.conform.SourcePipelines
import graft.sinks.{AuditCounts, AuditSink, SnapshotSink}
import graft.sources.Feeds
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Runnable per-source job entrypoints — the reference's
  * `main(file_path, data_load_id)` lifecycle
  * (ETL/CSV_Batch_Processing.py:337-393) with its Parameters.ini config
  * (Setup/Params_Setup.py:14-44) as a java.util.Properties file:
  *
  * {{{
  *   mart.dir        = /data/mart/csd_data_mart     # SCD2 parquet snapshot
  *   audit.dir       = /data/mart/csd_data_loads    # audit table (AuditSink)
  *   dims.agents        = /data/dims/agents.parquet        (PSEUDO_CODE, AGENT_ID)
  *   dims.supportAreas  = /data/dims/support_areas.parquet (SUPPORT_AREA_NAME, SUPPORT_AREA_ID)
  *   dims.customerTypes = /data/dims/customer_types.parquet(CUSTOMER_TYPE_NAME, CUSTOMER_TYPE_ID)
  *   load.ts         = 2024-06-01 00:00:00          # optional: frozen loadTs override
  *   spark.master    = local[*]                     # optional
  * }}}
  *
  * Usage: `graft.jobs.CsvBatchJob <config.properties> <feed-path> <data-load-id>`
  * (and JsonBatchJob / XmlBatchJob). Each job: read feed -> per-source
  * conform (SourcePipelines) -> CDC route against the mart's active rows
  * -> SCD2 upsert -> append an audit row. All distributed set operations;
  * the driver only freezes the load timestamp and records the audit row.
  */
object JobEnv {
  final case class Config(props: java.util.Properties) {
    def apply(key: String): String = {
      val v = props.getProperty(key)
      require(v != null, s"missing config key: $key")
      v
    }
    def opt(key: String): Option[String] = Option(props.getProperty(key))
  }

  def loadConfig(path: String): Config = {
    val props = new java.util.Properties()
    val in    = new java.io.FileInputStream(path)
    try props.load(in)
    finally in.close()
    Config(props)
  }

  def session(cfg: Config): SparkSession =
    SparkSession
      .builder()
      .master(cfg.opt("spark.master").getOrElse("local[*]"))
      .appName("graft-batch-job")
      .config("spark.sql.shuffle.partitions",
        cfg.opt("spark.sql.shuffle.partitions").getOrElse("32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()

  def dims(spark: SparkSession, cfg: Config): SourcePipelines.Dims =
    SourcePipelines.Dims(
      agents = spark.read.parquet(cfg("dims.agents")),
      supportAreas = spark.read.parquet(cfg("dims.supportAreas")),
      customerTypes = spark.read.parquet(cfg("dims.customerTypes"))
    )

  /** Frozen per-batch load timestamp (reference datetime.now() captured
    * once — SURVEY §7.4 risk 5); overridable for deterministic runs.
    */
  def loadTs(cfg: Config): String =
    cfg.opt("load.ts").getOrElse {
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
        .format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
    }

  /** Route the conformed mart frame against the snapshot, upsert, audit.
    * Shared tail of all three jobs (§2.11 steps 3-5 + K3).
    */
  def loadIncrement(
      spark: SparkSession,
      cfg: Config,
      conformed: DataFrame,
      dataLoadId: Long,
      dagId: String,
      ts: String
  ): AuditCounts = {
    val martDir = cfg("mart.dir")
    // Layout resolution. The bucketed O(delta) layout is the DEFAULT —
    // probe and merge touch only the key buckets the batch hits, so a
    // load is delta-proportional instead of rewriting a 100 TB mart.
    // An EXISTING mart's on-disk layout always wins (merging with the
    // wrong layout would corrupt it); config decides only for a new
    // mart: `mart.layout=flat` or `mart.partitionBy=...` opts into the
    // legacy whole-rewrite layout, `mart.buckets=<n>` sets the bucket
    // count at creation (persisted in the mart thereafter).
    val partitionBy =
      cfg.opt("mart.partitionBy").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
    val flatRequested = cfg.opt("mart.layout").contains("flat") || partitionBy.nonEmpty
    val bucketed = SnapshotSink.detectLayout(spark, martDir).getOrElse(!flatRequested)
    val counts =
      if (bucketed)
        BatchPipeline.loadIncrementBucketed(
          spark, martDir, conformed, ts,
          numBuckets = cfg.opt("mart.buckets").map(_.toInt).getOrElse(32))
      else {
        val snapshot = SnapshotSink.readSnapshot(
          spark,
          martDir,
          StructType(conformed.schema.fields :+ StructField("ACTIVE_FLAG", IntegerType))
        )
        val routed = BatchPipeline.route(conformed, snapshot)
        SnapshotSink.upsert(
          spark,
          martDir,
          routed,
          BatchPipeline.SsiCol,
          lit(ts),
          lit("2099-12-31 00:00:00"),
          validCol = Some("IS_VALID_DATA"),
          partitionBy = partitionBy
        )
      }
    AuditSink.record(
      spark, cfg("audit.dir"), dataLoadId, dagId, "SUCCESS", ts, ts, counts)
    counts
  }

  private[jobs] def parseArgs(args: Array[String], jobName: String): (Config, String, Long) = {
    require(
      args.length == 3,
      s"usage: graft.jobs.$jobName <config.properties> <feed-path> <data-load-id>"
    )
    (loadConfig(args(0)), args(1), args(2).toLong)
  }
}

/** CSV ("AT&T") batch job — ETL/CSV_Batch_Processing.py main(). */
object CsvBatchJob {
  def run(spark: SparkSession, cfg: JobEnv.Config, feedPath: String, dataLoadId: Long): AuditCounts = {
    val ts   = JobEnv.loadTs(cfg)
    val feed = Feeds.readCsvFeed(spark, feedPath)
    val conformed = SourcePipelines.conformCsv(
      feed,
      JobEnv.dims(spark, cfg),
      sourceId = 1,
      dataLoadId = dataLoadId,
      loadTs = ts,
      tiebreak = Seq(col("DATE_OF_CALL").desc)
    )
    JobEnv.loadIncrement(spark, cfg, conformed, dataLoadId, s"csv_batch_$dataLoadId", ts)
  }

  def main(args: Array[String]): Unit = {
    val (cfg, feedPath, loadId) = JobEnv.parseArgs(args, "CsvBatchJob")
    val spark  = JobEnv.session(cfg)
    val counts = run(spark, cfg, feedPath, loadId)
    println(s"csv load $loadId: $counts")
  }
}

/** JSON ("AMAZON") batch job — ETL/JSON_Batch_Processing.py main().
  * The key-value store's incremental cursor (`key > watermark`) comes
  * from the mart itself: the highest already-loaded INTERACTION_ID.
  */
object JsonBatchJob {
  def run(spark: SparkSession, cfg: JobEnv.Config, feedPath: String, dataLoadId: Long): AuditCounts = {
    val ts   = JobEnv.loadTs(cfg)
    val feed = Feeds.readJsonFeed(spark, feedPath, keyWatermark = -1L).drop("key")
    val conformed = SourcePipelines.conformJson(
      feed,
      JobEnv.dims(spark, cfg),
      sourceId = 2,
      dataLoadId = dataLoadId,
      loadTs = ts,
      tiebreak = Seq(col("CONTACT_DATE").desc)
    )
    JobEnv.loadIncrement(spark, cfg, conformed, dataLoadId, s"json_batch_$dataLoadId", ts)
  }

  def main(args: Array[String]): Unit = {
    val (cfg, feedPath, loadId) = JobEnv.parseArgs(args, "JsonBatchJob")
    val spark  = JobEnv.session(cfg)
    val counts = run(spark, cfg, feedPath, loadId)
    println(s"json load $loadId: $counts")
  }
}

/** XML ("UBER") batch job — ETL/XML_Batch_Processing.py main(): payload
  * strings (one XML record per line) parsed executor-side via from_xml.
  */
object XmlBatchJob {
  def run(spark: SparkSession, cfg: JobEnv.Config, feedPath: String, dataLoadId: Long): AuditCounts = {
    val ts   = JobEnv.loadTs(cfg)
    val feed = Feeds.parseXmlPayload(spark.read.text(feedPath), "value")
    val conformed = SourcePipelines.conformXml(
      feed,
      JobEnv.dims(spark, cfg),
      sourceId = 3,
      dataLoadId = dataLoadId,
      loadTs = ts,
      tiebreak = Seq(col("TIME_STAMP").desc)
    )
    JobEnv.loadIncrement(spark, cfg, conformed, dataLoadId, s"xml_batch_$dataLoadId", ts)
  }

  def main(args: Array[String]): Unit = {
    val (cfg, feedPath, loadId) = JobEnv.parseArgs(args, "XmlBatchJob")
    val spark  = JobEnv.session(cfg)
    val counts = run(spark, cfg, feedPath, loadId)
    println(s"xml load $loadId: $counts")
  }
}
