package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // A/B lever for partition-pressure adjudications (round-12 verdict
    // item 2): the session shuffle width defaults to the core count —
    // the seal configuration — but a solo run can scale it to the input
    // without a code change.
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // sized with the adjacency-broadcast budget (Triangles
      // .DefaultAdjBroadcastBytes = 2 GiB): broadcast builds collect
      // through the driver, and the 1g default would veto the exact
      // plan the budget admits. A deployment sizes these two together.
      .config("spark.driver.maxResultSize", "4g")
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
    // Host-noise control: a fixed cheap query re-run at the start and end
    // of every suite pass (plus its in-suite slot). Its timing SPREAD
    // self-describes the run's contamination — every seal adjudication
    // to date (r6-r8) had to hand-run this normalization after the fact;
    // now the artifact carries it. control_ratio = median/min of the
    // control samples: ~1.0 = clean run; >>1 = bursty CPU steal, read
    // per-query movers against it before calling anything a regression.
    val controlName   = "w1_window_dedup_latest"
    val controlTs     = scala.collection.mutable.ArrayBuffer.empty[Double]
    // control-run failures are recorded HERE, never in the suite-level
    // `failed` map: an out-of-suite control rep that crashes must not
    // report a failure for a query the suite excluded (via `only`) or
    // that passed all its in-suite reps
    val controlFailed = scala.collection.mutable.ArrayBuffer.empty[String]
    def runOnce(name: String, failSink: String => Unit): Option[Double] = {
      val t0 = System.nanoTime()
      // a rep that throws is a FAILURE, not a timing: record the error and
      // never fold its wall time into the min (a crashing query must not
      // masquerade as a fast one)
      try {
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(200)
          failSink(msg)
          System.err.println(s"[bench] FAILED $name: $msg")
          None
      }
    }
    def runControl(): Unit =
      if (SparkEntry.queries.contains(controlName))
        runOnce(controlName, controlFailed += _).foreach(controlTs += _)
    for (_ <- 1 to reps) {
      runControl()
      for (name <- names) {
        val t = runOnce(name, failed(name) = _)
        t.foreach(v => best(name) = math.min(best.getOrElse(name, Double.MaxValue), v))
        if (name == controlName) t.foreach(controlTs += _)
      }
      runControl()
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
    val control =
      if (controlTs.isEmpty) "null"
      else {
        val sorted = controlTs.sorted
        val med = sorted(sorted.size / 2)
        val min = sorted.head
        val cf  = if (controlFailed.isEmpty) "" else s""","control_failed":${controlFailed.size}"""
        s"""{"query":"$controlName","n":${sorted.size},"min":${fmt(min)},"median":${fmt(med)},"control_ratio":${fmt(med / min)}$cf}"""
      }
    // the full-scan recall yardsticks present in this run, so the
    // artifact self-describes which rows the scale surface excludes
    // (SparkEntry.Yardsticks is the registry; COVERAGE.md adjudicates)
    val yard = names.filter(SparkEntry.Yardsticks).sorted
      .map(n => s"\"$n\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failures,"control":$control,"yardsticks":$yard,"sf":"$sfDir"}"""
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
    // truncation insurance, part 2 (round 15): print the line IMMEDIATELY
    // too — r13's round-over-round comparison was lost to a capture that
    // truncated the tail mid-object; an early copy survives a tail-side
    // cut, the final copy survives a head-side cut, and a parser taking
    // the last parseable {"metric": …} line reads identical JSON either way
    println(line)
    System.out.flush()
    // stop Spark FIRST so its shutdown logging cannot land after the result
    // line — the driver tail-captures stdout and must see this line last
    spark.stop()
    System.err.flush()
    println(line)
    System.out.flush()
  }
}
