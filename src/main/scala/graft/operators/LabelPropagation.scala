package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection as the relational sibling of [[PageRank]]: web-corpus
  * curation uses community structure (host clusters, topic families) as
  * a mixing/quality signal next to centrality.
  *
  * Semantics are the DETERMINISTIC synchronous variant: every node
  * starts labeled with its own id; each round every node adopts the most
  * frequent label among its in-neighbors, ties to the SMALLEST label;
  * a node with no in-edges keeps its current label. The usual async/
  * random-tie LPA is irreproducible by design — this variant is a pure
  * function of (edges, iterations), so an oracle can replay it and two
  * cluster runs agree bit-for-bit. Labels are ids (integers), so there
  * is no FP anywhere.
  *
  * Scale shape per round: one equi-join of the edge list against the
  * current labels (hash on src) and a TWO-LEVEL aggregation —
  * (dst, lbl) counts partial-agg map-side, then `max_by` with the
  * scalar (count, -label) key — never a window over raw neighbor rows
  * (the a11_mode_per_group discipline; the tie order is total because
  * label is unique within a (dst) group's count rows). Edge list and
  * node set checkpoint once upfront; labels checkpoint per
  * `checkpointEvery` rounds, local or RELIABLE via `checkpointDir`
  * (same lineage/fault contract as [[PageRank.ranks]]).
  */
object LabelPropagation {

  /** `edges`: (src: long, dst: long), directed influence src -> dst —
    * pass both directions for an undirected graph. Returns (id, lbl)
    * after `iterations` synchronous rounds.
    */
  def propagate(
      edges: DataFrame,
      iterations: Int,
      checkpointEvery: Int = 2,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    // edge staging (round 15, same shape as [[PageRank.ranks]]): one
    // materialization that STATES hash(src) + in-partition order on the
    // checkpoint (a bare repartition+checkpoint loses its partitioning
    // under AQE — see Materialize.framePartitioned — so the r14 shape
    // still reshuffled the edges every round). Each round's label join
    // reads the edge side with neither an exchange nor a sort; only the
    // node-scale label frame moves per round.
    val e = Materialize.framePartitioned(
      edges.select(col("src"), col("dst")), Seq(col("src")), checkpointDir)
    // node set stays a PLAIN checkpoint — stating hash(id) pins the
    // per-round label update into a no-exchange SMJ that AQE can never
    // rebroadcast (measured 2x slower per round in the round-15
    // PageRank phase probe; both sides are node-scale, so the kept
    // exchange is never the bottleneck)
    val nodes = Materialize.frame(
      e.select(explode(array(col("src"), col("dst"))).as("id")).distinct(),
      checkpointDir)

    var l = nodes.withColumn("lbl", col("id"))
    for (i <- 1 to iterations) {
      val pick = e
        .join(l.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max_by(col("lbl"), struct(col("c"), (-col("lbl")).as("nl"))).as("newLbl"))
        .withColumnRenamed("dst", "id")
      l = l
        .join(pick, Seq("id"), "left")
        .select(col("id"), coalesce(col("newLbl"), col("lbl")).as("lbl"))
      // label checkpoints stay plain (same adjudication as PageRank's
      // rank checkpoints: stating hash(id) here runs the update join
      // AQE-off per checkpoint — measured slower — for a node-scale
      // saving; the edge-scale exchange is the one `e` already removes)
      if (i % checkpointEvery == 0 || i == iterations)
        l = Materialize.frame(l, checkpointDir)
    }
    l
  }
}
