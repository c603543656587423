package graft

import graft.operators.{Association, LinkPrediction, Materialize, Triangles}
import org.apache.spark.sql.functions._

/** The reliable-checkpoint seam (round 15): every one-shot
  * materialization threads `checkpointDir`, and passing one must take
  * the RELIABLE path (files under the dir — what survives executor
  * loss) while leaving results bit-identical to the executor-local
  * default.
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def reliableFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val root = new java.io.File(dir)
    if (root.exists()) walk(root) else Seq.empty
  }

  test("Materialize.frame: reliable when a dir is passed, local otherwise") {
    val dir = tempDir("graft_ckpt_seam")
    val df  = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val rel = Materialize.frame(df, Some(dir))
    assert(rel.collect().toSet === df.collect().toSet)
    assert(reliableFiles(dir).nonEmpty, s"no checkpoint files under $dir")
    // default arm: no files appear anywhere new; rdd is local-checkpointed
    val loc = Materialize.frame(df, None)
    assert(loc.collect().toSet === df.collect().toSet)
  }

  test("framePartitioned: stamped layout is true — joins/aggs on the stamp equal the plain plan") {
    import org.apache.spark.sql.functions._
    // enough keys to hit every one of the 4 test partitions, plus nulls
    val left = spark.range(5000)
      .select((col("id") % 997).as("k"), col("id").as("v"))
      .unionByName(Seq((null.asInstanceOf[java.lang.Long], 999999L)).toDF("k", "v"))
    val right = spark.range(400).select(col("id").as("k"), (col("id") * 10).as("w"))
    val stamped = graft.operators.Materialize.framePartitioned(left, Seq(col("k")), None)
    // the stamp must be visible to the planner...
    val plan = stamped
      .queryExecution.analyzed.toString() +
      stamped.join(right, Seq("k")).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("hashpartitioning(k"), plan)
    // ...and must STATE THE TRUTH: a join and an agg keyed on the stamped
    // column (the operations that would silently misplace rows if the
    // claimed placement were wrong) must equal the un-stamped results
    val j1 = stamped.join(right, Seq("k")).select("k", "v", "w").collect().toSet
    val j2 = left.join(right, Seq("k")).select("k", "v", "w").collect().toSet
    assert(j1 === j2)
    val a1 = stamped.groupBy("k").agg(sum("v")).collect().toSet
    val a2 = left.groupBy("k").agg(sum("v")).collect().toSet
    assert(a1 === a2)
  }

  test("one-shot operators take the reliable path when a dir is configured") {
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L), (4L, 3L), (5L, 2L), (2L, 3L))
      .toDF("src", "dst")

    val lpDir = tempDir("graft_ckpt_lp")
    val lp = LinkPrediction
      .predictLinks(edges, capDeg = 16, minCommon = 1L, topK = 10,
        checkpointDir = Some(lpDir))
      .select("node", "candidate", "cn", "rnk").collect().toSet
    val lpLocal = LinkPrediction
      .predictLinks(edges, capDeg = 16, minCommon = 1L, topK = 10)
      .select("node", "candidate", "cn", "rnk").collect().toSet
    assert(lp === lpLocal)
    assert(reliableFiles(lpDir).nonEmpty, s"no checkpoint files under $lpDir")

    val trDir = tempDir("graft_ckpt_tr")
    val tr = Triangles
      .perNode(edges, checkpointDir = Some(trDir))
      .as[(Long, Long)].collect().toSet
    val trLocal = Triangles.perNode(edges).as[(Long, Long)].collect().toSet
    assert(tr === trLocal)
    assert(reliableFiles(trDir).nonEmpty, s"no checkpoint files under $trDir")

    val asDir = tempDir("graft_ckpt_as")
    val baskets = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L))
      .toDF("basket", "item")
    val as = Association
      .pairRules(baskets, "basket", "item", minSupport = 2L,
        checkpointDir = Some(asDir))
      .select("ante", "cons", "s_pair").collect().toSet
    val asLocal = Association
      .pairRules(baskets, "basket", "item", minSupport = 2L)
      .select("ante", "cons", "s_pair").collect().toSet
    assert(as === asLocal)
    assert(reliableFiles(asDir).nonEmpty, s"no checkpoint files under $asDir")
  }
}
