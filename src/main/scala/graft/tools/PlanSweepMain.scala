package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Whole-surface plan audit: parquet-scan and Exchange counts for every
  * declared query's formatted plan, as one CSV — the checklist evidence
  * base (round 14 introduced it; round 15 regenerates on the new HEAD).
  * Queries that execute at construction are NOT skipped here (their
  * final plans are checkpoint scans — the counts are still honest for
  * what the bench replays after construction); the eager set is named
  * in the OPTIMIZATION notes.
  *
  * Usage: PlanSweepMain OUTCSV
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object PlanSweepMain {
  def main(args: Array[String]): Unit = {
    val outCsv = args(0)
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder("query,parquet_scans,exchanges\n")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val txt = SparkEntry
          .queries(name)(spark, sfDir)
          .queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        // one "Location: InMemoryFileIndex" line per physical scan node;
        // exchange metric = every "Exchange" token (tree line + detail
        // header = 2 per node) — the SAME counting the r14 sweep used,
        // so the two CSVs diff cell-for-cell
        val scans = "Location: InMemoryFileIndex".r.findAllIn(txt).length
        val exch  = "Exchange".r.findAllIn(txt).length
        sb.append(s"$name,$scans,$exch\n")
        println(s"[sweep] $name $scans $exch")
      } catch {
        case e: Throwable =>
          sb.append(s"$name,ERR,ERR\n")
          System.err.println(s"[sweep] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(outCsv), sb.toString)
    spark.stop()
  }
}
