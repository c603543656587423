package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink forces full evaluation of every column — count() would let
    // Catalyst prune the projections of map-only queries and under-measure.
    // Each query runs `Reps` times and reports the MINIMUM: the host shows
    // bursty CPU steal (identical plans vary 10-30x run-to-run), and min-of-N
    // is the standard steady-state estimator under asymmetric noise. Reps
    // are INTERLEAVED (full suite passes, not per-query triples) so a
    // minutes-long steal burst cannot capture every rep of one query.
    val reps  = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // optional comma-separated subset for local iteration on one query
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.filter(n => only.forall(_.contains(n)))
    val best   = scala.collection.mutable.Map.empty[String, Double]
    val failed = scala.collection.mutable.Map.empty[String, String]
    for (_ <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      // a rep that throws is a FAILURE, not a timing: record the error and
      // never fold its wall time into the min (a crashing query must not
      // masquerade as a fast one)
      try {
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
      } catch {
        case e: Throwable =>
          failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(200)
          System.err.println(s"[bench] FAILED $name: ${failed(name)}")
      }
    }
    // failed-only queries report -1 (the old sentinel) and are excluded
    // from the total so a crash cannot read as a fast suite
    val results = names.map(n => n -> best.getOrElse(n, -1.0)).toMap
    // 0.1 ms resolution keeps the one-line JSON short enough to survive a
    // bounded tail capture of the driver's log
    def fmt(v: Double): String = if (v < 0) "-1" else (math.round(v * 10000) / 10000.0).toString
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failures = failed.keys.toSeq.sorted.map(n => s"\"$n\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failures,"sf":"$sfDir"}"""
    // survive stdout truncation: persist the result next to the repo bench seals
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "tools/bench_last.json")),
      (line + "\n").getBytes("UTF-8"))
    catch {
      // never fail the bench for the backstop, but never fail SILENTLY
      // either — a cwd without tools/ would otherwise disable the
      // truncation insurance with no trace
      case e: Throwable => System.err.println(s"[bench] result file backstop failed: $e")
    }
    // stop Spark FIRST so its shutdown logging cannot land after the result
    // line — the driver tail-captures stdout and must see this line last
    spark.stop()
    System.err.flush()
    println(line)
    System.out.flush()
  }
}
