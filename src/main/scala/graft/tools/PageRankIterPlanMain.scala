package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Plan-evidence main for the round-15 PageRank partitioning fix
  * (ADVICE r14): the per-iteration join must read the checkpointed
  * `edeg` side with NO exchange because `edeg` was explicitly
  * hash-partitioned on `src` BEFORE materialization — not merely
  * because the rank side happens to broadcast. PageRank.ranks
  * materializes each iteration eagerly, so the returned frame's explain
  * is a checkpoint scan; this main mirrors the operator's edeg/iteration
  * construction (PageRank.scala `ranks`) to capture the ITERATION plan,
  * once with default settings and once with auto-broadcast disabled —
  * the cluster-scale regime where ranks exceed the broadcast threshold.
  *
  * Usage: PageRankIterPlanMain OUTDIR TAG
  */
object PageRankIterPlanMain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag    = args(1)
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    // same edge derivation as the graph_pagerank query (GraphQueries)
    val edges = Tables
      .lineitem(spark, sfDir)
      .select(
        explode(
          array(
            struct((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst")),
            struct((col("l_suppkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
          )
        ).as("e")
      )
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()

    // mirrors PageRank.ranks' upfront materializations (round 15:
    // framePartitioned states hash(src)/hash(id) on the checkpoints —
    // see Materialize.framePartitioned for why a bare repartition +
    // checkpoint loses the partitioning under AQE)
    val ep = graft.operators.Materialize.framePartitioned(
      edges.select(col("src"), col("dst")), Seq(col("src")), None)
    val deg = ep.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = ep
      .select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct()
      .localCheckpoint()
    val edeg = graft.operators.Materialize.framePartitioned(
      ep.join(deg, "src").select(col("src"), col("dst"), col("outdeg")),
      Seq(col("src")), None)

    def iterPlan(): String = {
      val r = nodes.withColumn("r", lit(1000000L))
      val contrib = edeg
        .join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("r div outdeg").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("s"))
      val next = nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(850 * coalesce(s, 0L)) div 1000")).as("r"))
      next.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }

    Files.writeString(Paths.get(s"$outDir/graph_pagerank_iter1_$tag.txt"), iterPlan())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Files.writeString(
      Paths.get(s"$outDir/graph_pagerank_iter1_nobcast_$tag.txt"), iterPlan())
    println(s"[prplan] wrote $outDir/graph_pagerank_iter1_{,nobcast_}$tag.txt")
    spark.stop()
  }
}
