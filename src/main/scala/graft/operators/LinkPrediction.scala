package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction — "which non-edges look most like
  * edges" — the fourth member of the relational graph family next to
  * [[PageRank]], [[LabelPropagation]] and [[Triangles]]. For a
  * training-data pipeline this is the graph-side quality/densification
  * signal (recommend related items, find missing citations) computed
  * with the same integer-exact, join+agg-only discipline.
  *
  * Candidate generation is wedge enumeration at each common neighbor
  * `w`: every pair of `w`'s neighbors is a candidate link. Unlike
  * triangle counting, no orientation trick can bound this — the OUTPUT
  * at a hub is inherently deg(w)^2 pairs (all pairs of its neighbors
  * are candidates), so the scale lever is an explicit per-center CAP:
  * each center contributes wedges only among its `capDeg` smallest
  * neighbor ids (deterministic truncation — the `maxBucket` discipline
  * of the LSH pair kernels; a hub's long tail is dropped, never
  * sampled randomly). Scores therefore LOWER-BOUND the true common-
  * neighbor counts, identically on any engine — the oracle replays the
  * same cap.
  *
  * Scoring: cn = |N(u) ∩ N(v)| (capped), plus exact-integer Jaccard
  * against the TRUE degrees: jac_micro = 1e6 * cn / (du + dv - cn),
  * floored — no FP anywhere. Existing edges are anti-joined out;
  * predictions are ranked per endpoint (both orientations, so every
  * node sees its top-k) by (cn DESC, candidate ASC).
  *
  * Shuffle inventory: adjacency build (1), per-center cap window (on
  * w), wedge self-join (on w, bounded by cap^2/2 per center), cn agg
  * (u, v), anti-join on the canonical pair, degree joins (broadcast —
  * |nodes| rows), rank window (node). No stage is quadratic in a hub's
  * true degree.
  */
object LinkPrediction {

  /** Top-`topK` predicted links per node over the undirected graph
    * induced by `edges` (direction/duplicates ignored, self-loops
    * dropped). Returns (node, candidate, cn, du, dv, jac_micro, rnk).
    *
    * EAGER: construction materializes the undirected edge set and the
    * degree frame immediately ([[Materialize.frame]]) — building the
    * returned DataFrame runs those upstream jobs even if the caller only
    * explains the plan. `checkpointDir` selects RELIABLE checkpoints for
    * both (cluster-scale fault tolerance); the default is executor-local.
    */
  def predictLinks(
      edges: DataFrame,
      capDeg: Int,
      minCommon: Long,
      topK: Int,
      wedgePartitions: Int = 0,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(capDeg >= 2, s"capDeg must be >= 2, got $capDeg")
    require(topK >= 1 && minCommon >= 1, s"topK/minCommon must be >= 1")
    // the candidate-pair aggregation consumes the wedge intermediate —
    // the one stage whose input dwarfs the edge list — so its shuffle
    // width is sized from the data (same planning-time stats signal and
    // calibration as Triangles.wedgeShuffleWidth), not the session default
    val nWedge =
      if (wedgePartitions > 0) wedgePartitions
      else Triangles.wedgeShuffleWidth(edges)
    // the undirected edge set feeds FOUR otherwise-independent plan
    // branches (the capped adjacency, the existing-edge anti-join, and
    // both degree broadcasts) — materialize it ONCE so the caller's
    // edge derivation (often a multi-join + distinct) is evaluated once
    // instead of once per branch (round 14; the narrow two-long rows
    // make the checkpoint cheap, unlike the fat-array AllPairs case)
    val und = Materialize.frame(
      edges
        .select(
          least(col("src"), col("dst")).as("eu"),
          greatest(col("src"), col("dst")).as("ev")
        )
        .where(col("eu") =!= col("ev"))
        .distinct(),
      checkpointDir)
    // directed adjacency (both orientations): one row per (center, nbr)
    val adj = und.select(
      explode(array(struct(col("eu").as("w"), col("ev").as("n")),
        struct(col("ev").as("w"), col("eu").as("n")))).as("e")
    ).select(col("e.w").as("w"), col("e.n").as("n"))
    // node-scale true degrees, consumed by TWO broadcast builds —
    // materialized so the adjacency agg runs once, not per build
    val deg = Materialize.frame(
      adj.groupBy(col("w").as("id")).agg(count(lit(1)).as("d")),
      checkpointDir)
    val cw  = Window.partitionBy(col("w")).orderBy(col("n").asc)
    val capped = adj
      .withColumn("__rn", row_number().over(cw))
      .where(col("__rn") <= capDeg)
      .select(col("w"), col("n"))
    val wedges = capped
      .as("a")
      .join(capped.as("b"), col("a.w") === col("b.w") && col("a.n") < col("b.n"))
      .select(col("a.n").as("u"), col("b.n").as("v"))
    // explicit (u, v) hash partitioning at the data-sized width: the
    // aggregation's distribution is already satisfied, so no further
    // exchange — the wedge stream hash-aggregates over nWedge-way splits
    val cn = wedges
      .repartition(nWedge, col("u"), col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"))
      .where(col("cn") >= minCommon)
    val nonEdge = cn.join(
      und,
      col("u") === col("eu") && col("v") === col("ev"),
      "left_anti"
    )
    val scored = nonEdge
      .join(broadcast(deg.select(col("id").as("u"), col("d").as("du"))), "u")
      .join(broadcast(deg.select(col("id").as("v"), col("d").as("dv"))), "v")
      .withColumn("jac_micro", expr("(1000000 * cn) div (du + dv - cn)"))
    // both orientations so each node ranks its own candidates
    val sym = scored.select(
      explode(array(
        struct(col("u").as("node"), col("v").as("candidate"), col("du").as("dn"), col("dv").as("dc")),
        struct(col("v").as("node"), col("u").as("candidate"), col("dv").as("dn"), col("du").as("dc"))
      )).as("p"),
      col("cn"),
      col("jac_micro")
    ).select(
      col("p.node").as("node"), col("p.candidate").as("candidate"),
      col("cn"), col("p.dn").as("du"), col("p.dc").as("dv"), col("jac_micro")
    )
    val rw = Window.partitionBy(col("node")).orderBy(col("cn").desc, col("candidate").asc)
    sym
      .withColumn("rnk", row_number().over(rw))
      .where(col("rnk") <= topK)
  }
}
