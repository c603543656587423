package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Measurement tool: dump `.explain("formatted")` for named queries to
  * files (plans/<round>/<q>_<tag>.txt) so optimization evidence is a
  * committed artifact, not a claim. Mirrors Bench's session config so
  * the dumped plan is the plan the bench actually runs.
  *
  * Usage: PlanDumpMain OUTDIR TAG [query ...]   (no queries = all)
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag    = args(1)
    val only   = args.drop(2).toSet
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
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => only.isEmpty || only(n))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        // same counting as the plan sweep: scans = unique Location lines,
        // exchanges = every "Exchange" token (2 per node: tree + detail)
        val scans = "Location: InMemoryFileIndex".r.findAllIn(txt).length
        val exch  = "Exchange".r.findAllIn(txt).length
        println(s"[plandump] $name scans=$scans exchanges=$exch -> $outDir/${name}_$tag.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
