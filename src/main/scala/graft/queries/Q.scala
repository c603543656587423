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
  * re-touched on every call. Liveness for SIBLING processes is keyed on
  * a `.heartbeat` file a per-JVM daemon re-touches every 15 minutes:
  * a run sitting in one long phase (> the retention window) without
  * calling scoped() again would otherwise look stale to a concurrently
  * launched session and lose its live workspace mid-run.
  */
object TmpWorkspace {
  private val RetainMillis    = 12L * 3600 * 1000
  private val HeartbeatMillis = 15L * 60 * 1000
  private val heartbeats =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def heartbeatFile(dir: java.io.File) = new java.io.File(dir, ".heartbeat")

  /** A sibling dir's last proof of life: its own mtime (re-touched per
    * scoped() call) or its heartbeat file's, whichever is newer.
    */
  private def lastAlive(dir: java.io.File): Long =
    math.max(dir.lastModified(), heartbeatFile(dir).lastModified())

  private def touchHeartbeat(dir: java.io.File): Unit = {
    try {
      val hb = heartbeatFile(dir)
      if (!hb.createNewFile()) { hb.setLastModified(System.currentTimeMillis()); () }
    } catch { case _: java.io.IOException => () } // liveness is best-effort
  }

  /** One daemon per (JVM, workspace dir): keeps the heartbeat fresh
    * through phases longer than the retention window.
    */
  private def startHeartbeat(dir: java.io.File): Unit =
    if (heartbeats.add(dir.getAbsolutePath)) {
      val t = new Thread(() => {
        while (dir.exists()) {
          touchHeartbeat(dir)
          Thread.sleep(HeartbeatMillis)
        }
      }, s"graft-tmp-heartbeat-${dir.getName}")
      t.setDaemon(true)
      t.start()
    }

  def scoped(s: SparkSession, family: String, dataDir: String): String = {
    val appId = s.sparkContext.applicationId
    val parent = new java.io.File(System.getProperty("java.io.tmpdir"), family)
    parent.mkdirs()
    val now = System.currentTimeMillis()
    val cutoff = now - RetainMillis
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      if (f.getName != appId && lastAlive(f) < cutoff) deleteRecursively(f)
    }
    val own = new java.io.File(parent, appId)
    own.mkdirs()
    own.setLastModified(now)
    touchHeartbeat(own)
    startHeartbeat(own)
    s"${own.getAbsolutePath}/" + dataDir.replaceAll("[^a-zA-Z0-9]", "_")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRecursively)
    f.delete()
    ()
  }
}
