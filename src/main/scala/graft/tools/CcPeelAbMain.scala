package graft.tools

import graft.operators.ClusterDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main for the round-15 ClusterDedup adjudication (r14
  * carry-forward #3): does checkpointing each round's min-label
  * aggregation (`checkpointMinimized`) beat re-evaluating it in the
  * pointer-jump self-join?
  *
  * The declared dedup fixtures peel only 2-3 CC rounds — too shallow to
  * expose a per-round cost — so this main builds a DEEP-PEEL fixture: a
  * single path graph 0-1-2-…-(n-1). Hash-to-min with pointer jumping
  * converges in O(log diameter) rounds, so a 4M-node path peels ~20+
  * rounds with an edge frame heavy enough (n-1 rows) that each round's
  * join/agg is wall-visible.
  *
  * Usage: CcPeelAbMain ARM [N]   (ARM = a | b; N = nodes, default 4M)
  * Prints one JSON line {"arm":…,"n":…,"sec":…}. Alternate arms
  * externally (interleaved min-of-K per the PLANS.md protocol).
  */
object CcPeelAbMain {
  def main(args: Array[String]): Unit = {
    val arm = args(0)
    require(arm == "a" || arm == "b", s"arm must be a|b, got $arm")
    val n    = if (args.length > 1) args(1).toLong else 4000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = spark.range(n - 1).select(col("id").as("a"), (col("id") + 1L).as("b"))
    val t0 = System.nanoTime()
    ClusterDedup
      .connectedComponents(edges, "a", "b", maxIter = 50,
        checkpointMinimized = arm == "b")
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    println(s"""{"arm":"$arm","n":$n,"sec":${math.round(sec * 10000) / 10000.0}}""")
  }
}
