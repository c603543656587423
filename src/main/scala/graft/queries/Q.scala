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
  * age-based sweep of SIBLING application dirs keeps repeated runs from
  * leaking tmp space forever (concurrent runs are minutes old, far
  * inside the retention window, so the sweep can never race a live one).
  */
object TmpWorkspace {
  private val RetainMillis = 6L * 3600 * 1000

  def scoped(s: SparkSession, family: String, dataDir: String): String = {
    val parent = new java.io.File(System.getProperty("java.io.tmpdir"), family)
    parent.mkdirs()
    val cutoff = System.currentTimeMillis() - RetainMillis
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      if (f.lastModified() < cutoff) deleteRecursively(f)
    }
    s"${parent.getAbsolutePath}/${s.sparkContext.applicationId}/" +
      dataDir.replaceAll("[^a-zA-Z0-9]", "_")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRecursively)
    f.delete()
    ()
  }
}
