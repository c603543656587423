package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark program over the testdata tables
  * plus (when SQL-expressible) a semantically identical DuckDB oracle.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

/** Per-application scratch directories for queries that materialize
  * state (signature stores, SCD2 marts). Namespacing by applicationId
  * keeps concurrent harness processes from racing on one path; the
  * age-based sweep of OTHER applications' dirs keeps repeated runs from
  * leaking tmp space forever. The current application's dir is never
  * swept (regardless of age — a directory's mtime does not track nested
  * writes, so age alone cannot prove liveness for ourselves) and is
  * re-touched on every call, so sibling processes see a soak run's
  * workspace as fresh for as long as it keeps allocating.
  */
object TmpWorkspace {
  private val RetainMillis = 12L * 3600 * 1000

  def scoped(s: SparkSession, family: String, dataDir: String): String = {
    val appId = s.sparkContext.applicationId
    val parent = new java.io.File(System.getProperty("java.io.tmpdir"), family)
    parent.mkdirs()
    val now = System.currentTimeMillis()
    val cutoff = now - RetainMillis
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      if (f.getName != appId && f.lastModified() < cutoff) deleteRecursively(f)
    }
    val own = new java.io.File(parent, appId)
    own.mkdirs()
    own.setLastModified(now)
    s"${own.getAbsolutePath}/" + dataDir.replaceAll("[^a-zA-Z0-9]", "_")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRecursively)
    f.delete()
    ()
  }
}
