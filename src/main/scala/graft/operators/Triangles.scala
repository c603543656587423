package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-node triangle counting — the local-clustering-coefficient
  * ingredient, the third classic of the relational graph family next to
  * [[PageRank]] and [[LabelPropagation]].
  *
  * Algorithm: degree-ordered orientation ("compact-forward", Latapy
  * 2008; the standard MapReduce formulation is Suri & Vassilvitskii,
  * WWW 2011). Each undirected edge is directed from its lower-degree
  * endpoint to its higher-degree endpoint (ties by id), which makes the
  * orientation acyclic with out-degree O(sqrt(m)) — so the wedge join
  * (two out-edges of one node) is bounded by sum(outdeg^2) = O(m^1.5)
  * instead of sum(deg^2), which a hub node would otherwise blow up:
  * a 10^7-degree hub contributes NOTHING to wedge fan-out because all
  * its edges point INTO it. Every triangle appears exactly once as a
  * wedge (a->b, a->c) with pi(b) < pi(c) closed by the oriented edge
  * b->c, so closing is ONE equi-join on (b, c) — no OR-condition, no
  * post-dedup.
  *
  * TWO physical plans compute that same oriented-triangle set, chosen
  * by an adjacency-size budget (round 14):
  *
  *  - **Adjacency-broadcast** (the default when it fits): build each
  *    node's out-neighbor list — total payload = one id per oriented
  *    edge, i.e. 8m bytes, NOT the O(m^1.5) wedge volume — broadcast
  *    it, and per oriented edge (u, v) intersect adj(u) with adj(v)
  *    in-place (`array_intersect`, codegen). No wedge row is ever
  *    materialized, shuffled, or sorted: the only shuffles are the
  *    adjacency build (m rows) and the node-scale count agg, whose
  *    explode input collapses in the map-side partial agg. The
  *    per-edge intersection cost is bounded by the orientation's
  *    out-degree cap O(sqrt(m)) exactly like the wedge fan-out.
  *  - **Chunked wedge join** (the capacity fallback): when the
  *    adjacency exceeds the broadcast budget (graphs with m over
  *    ~200M edges at the default 2 GiB), the round-13 wedge-pass plan
  *    runs unchanged — its scratch-disk contract bounds the peak
  *    intermediate instead.
  *
  * All plain equi-joins + aggs on integer ids: exact, order-free,
  * engine-portable; TrianglesSpec pins the two plans equal.
  */
object Triangles {

  /** Wedge-stage shuffle width sized from the DATA, not the session
    * default: the O(m^1.5) wedge intermediate is orders of magnitude
    * larger than the edge list, so a fixed `spark.sql.shuffle.partitions`
    * that suits every other stage under-partitions the closing join's
    * sort and spills (measured at the 10x fixture: 87.5 s at 32
    * partitions vs 40.2 s at 128 — sizing the shuffle to the data is
    * exactly what a real cluster config does). The size signal is the
    * planning-time SUM OF LEAF RELATION estimates under the edge
    * expression (file-size-derived, zero runtime cost — the same signal
    * broadcast-join thresholds use). Leaves, not the top-level plan
    * estimate: join selectivity guesses multiply upward through the
    * tree (a self-joined edge derivation estimates absurdly large),
    * while input bytes are the honest proxy for edge volume — and under
    * a degree-preserving scale-up, for wedge volume per partition. One
    * partition per MiB of input, clamped to [defaultParallelism, 4096].
    * Shared mechanism (incl. the stats-less-leaf sentinel exclusion, so
    * in-memory test graphs size to defaultParallelism, not 4096):
    * [[graft.plans.InputSizing]].
    */
  private[operators] def wedgeShuffleWidth(edges: DataFrame): Int =
    graft.plans.InputSizing.widthFor(edges)

  /** Measured shuffle footprint per materialized wedge, for the
    * auto-pass capacity arithmetic: the 100× fixture's 4.109 B wedges
    * produced ~100 GB of shuffle overflow (round-12/13 sf10 runs) —
    * 24.3 bytes per (a, b, c) long-triple row through the closing
    * join's exchange + sort. Rounded down so the estimate errs toward
    * MORE passes (the safe direction for a disk budget).
    */
  val BytesPerWedge = 24L

  /** Default per-run scratch budget for the wedge intermediate when
    * `wedgePasses = 0` (auto): at the measured 24 B/wedge, 16 GiB
    * auto-selects 1 pass through the 10× fixture (~10 GB of wedges)
    * and 6 passes at the 100× fixture (98.6 GB / 16 GiB = 5.74 →
    * ceil 6, measured: tools/bench_sf10_triangles_auto_r14.json
    * completed at that auto K in the regime the round-13 manual K=8
    * run needed on a 78 GB volume with ~10 GB observed high-water).
    * A deployment sets this from its per-node scratch allocation.
    */
  val DefaultWedgeDiskBudgetBytes = 16L << 30

  /** Estimated broadcast footprint per oriented edge for the adjacency
    * plan's fit test: each edge contributes one 8-byte id to exactly
    * one out-neighbor array, plus amortized per-node row/array
    * overhead (measured at the 10x co-purchase fixture: ~12 MB
    * broadcast for 1.2M edges). Rounded UP so the estimate errs toward
    * the wedge fallback — the safe direction for executor memory.
    */
  val BytesPerAdjEdge = 12L

  /** Default adjacency-broadcast budget: the whole out-adjacency (8m
    * bytes of ids + overhead) must fit comfortably in every executor
    * next to its task memory. 2 GiB admits graphs to ~180M edges —
    * the 100x co-purchase fixture (120M edges, ~1.2 GB measured) sits
    * inside it, and at that size the plan replaces a ~100 GB wedge
    * shuffle with one torrent broadcast. A deployment sets this from
    * its executor memory allocation; 0 disables the adjacency plan
    * outright (every input takes the wedge-pass path).
    */
  val DefaultAdjBroadcastBytes = 2L << 30

  /** The analytic wedge count Σ C(outdeg, 2) over the degree-ordered
    * orientation of `edges` — the EXACT number of wedge rows the
    * closing join materializes, computable by a node-scale aggregation
    * without generating a single wedge (the round-12 width pin used
    * this same identity to prove the 100× fixture's wedge set scales
    * ×10.00 per decade). One small Spark job; drives [[autoPasses]].
    */
  def analyticWedgeCount(edges: DataFrame): Long =
    wedgeCountOf(orient(dedupUndirected(edges)))

  private def wedgeCountOf(oriented: DataFrame): Long = {
    val n = oriented
      .groupBy(col("src"))
      .agg(count(lit(1)).as("d"))
      .agg(sum((col("d") * (col("d") - lit(1L))).cast("long") / lit(2L)).cast("long").as("w"))
      .head()
    if (n.isNullAt(0)) 0L else n.getLong(0)
  }

  /** Pass count for a wedge set of `wedgeCount` rows under a
    * `budgetBytes` scratch budget: K = ceil(wedge bytes / budget),
    * clamped to [1, 4096]. Pure arithmetic, spec-pinned.
    */
  def autoPasses(wedgeCount: Long, budgetBytes: Long): Int = {
    require(budgetBytes >= 1, s"budgetBytes must be >= 1, got $budgetBytes")
    val k = (BigInt(wedgeCount) * BytesPerWedge + budgetBytes - 1) / budgetBytes
    k.max(1).min(4096).toInt
  }

  /** Per-node triangle participation counts over the UNDIRECTED graph
    * induced by `edges` (direction and duplicates ignored, self-loops
    * dropped). Returns (id, n_tri) for every node, zeros included.
    *
    * `wedgePartitions` overrides the data-driven wedge-join shuffle
    * width (0 = size from the edge count).
    *
    * `wedgePasses` bounds the PEAK materialized wedge intermediate — the
    * operator's capacity contract. The O(m^1.5) wedge set can exceed a
    * node's spill disk even when every per-stage partition fits in
    * memory (measured: the 100x fixture's 4.1 B wedges ≈ 100 GB of
    * shuffle overflow a 78 GB scratch volume). With K passes the wedge
    * set is split into K DISJOINT chunks by hash of the wedge's first
    * endpoint `b` (every wedge has exactly one b, so the chunks
    * partition the wedge set and the per-pass triangle counts sum to
    * the single-pass result — TrianglesSpec pins the equality). Each
    * pass filters e1 by `hash(dst) % K == k` BEFORE the wedge join, so
    * only ~1/K of the wedges is ever generated, shuffled, or sorted at
    * once; the oriented edge list (tiny next to the wedges) is
    * materialized once and rescanned per pass. Cost: K extra scans of
    * the edge list + K join plans — noise against the wedge volume the
    * passes bound. 1 = single pass (identical to the round-11 plan);
    * 0 = AUTO: K is sized from the data as
    * ceil([[analyticWedgeCount]] × [[BytesPerWedge]] /
    * `wedgeDiskBudgetBytes`) — the exact wedge count costs one
    * node-scale aggregation over the (already-checkpointed) oriented
    * list before the first pass, so a deployment states its scratch
    * budget once instead of hand-picking K per input (TrianglesSpec
    * pins auto == explicit).
    *
    * EAGER (non-legacy arms): construction materializes the undirected
    * and oriented edge sets immediately ([[Materialize.frame]]) — the
    * plan-choice count needs them. `checkpointDir` makes every
    * materialization RELIABLE (cluster-scale fault tolerance); the
    * default is executor-local. The `adjBroadcastBytes = 0,
    * wedgePasses = 1` legacy A/B arm stays lazy and un-materialized.
    */
  private def dedupUndirected(edges: DataFrame): DataFrame =
    edges
      .select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")
      )
      .where(col("u") =!= col("v"))
      .distinct()

  // orient low-pi -> high-pi where pi = (degree, id); carry dst's pi
  // degree for the wedge ordering
  private def orient(und: DataFrame): DataFrame = {
    val deg = und
      .select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("d"))
    und
      .join(deg.withColumnRenamed("id", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v"))
          .as("src"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u"))
          .as("dst"),
        // the chosen dst's degree: the larger degree wins the pi
        // comparison outright, and on a degree tie both sides carry the
        // same d — so greatest(du, dv) is exact in every case
        greatest(col("du"), col("dv")).as("ddst")
      )
  }

  /** The adjacency-broadcast plan: per-node triangle partials off one
    * in-place intersection per oriented edge. For edge (u, v) the
    * witnesses are adj+(u) ∩ adj+(v) — the w with u->w AND v->w; by
    * the orientation argument in the scaladoc every triangle shows up
    * at exactly one edge (its two lowest-pi endpoints), so each edge
    * contributes |wits| triangles to u and to v and one to every
    * witness. The neighbor arrays are sets (edges are deduped), so
    * the set-semantics of `array_intersect` are exact, and only the
    * intersection's SIZE and MEMBERSHIP are consumed — collect_list
    * order never shows.
    *
    * The witness array is staged in its own projection and referenced
    * three times downstream (two sizes + the transform input), which
    * keeps CollapseProject from re-splicing the intersection into the
    * explode (the repo's staged-array discipline); the explode output
    * is two-long rows feeding a hash agg, so the map-side partial
    * collapses it to node scale before the only shuffle.
    */
  private def adjCounts(o: DataFrame, checkpointDir: Option[String]): DataFrame = {
    // the out-adjacency feeds TWO broadcast builds (the u side and the
    // v side differ by alias, so exchange reuse never fires) —
    // materialize it once so the collect_list agg runs once, and each
    // broadcast build is a node-scale block scan (round 14)
    val adj = Materialize.frame(
      o.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs")),
      checkpointDir)
    val staged = o
      .select(col("src"), col("dst"))
      .join(
        broadcast(adj.select(col("src").as("a_id"), col("nbrs").as("a_nbrs"))),
        col("src") === col("a_id"))
      .join(
        broadcast(adj.select(col("src").as("b_id"), col("nbrs").as("b_nbrs"))),
        col("dst") === col("b_id"))
      .select(
        col("src"),
        col("dst"),
        array_intersect(col("a_nbrs"), col("b_nbrs")).as("wits"))
    staged
      .select(
        explode(
          concat(
            array(
              struct(col("src").as("id"), size(col("wits")).cast("long").as("c")),
              struct(col("dst").as("id"), size(col("wits")).cast("long").as("c"))),
            transform(col("wits"), w => struct(w.as("id"), lit(1L).as("c")))
          )).as("x"))
      .select(col("x.id").as("id"), col("x.c").as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_tri"))
      .where(col("n_tri") > 0)
  }

  def perNode(
      edges: DataFrame,
      wedgePartitions: Int = 0,
      wedgePasses: Int = 1,
      wedgeDiskBudgetBytes: Long = DefaultWedgeDiskBudgetBytes,
      adjBroadcastBytes: Long = DefaultAdjBroadcastBytes,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(wedgePasses >= 0, s"wedgePasses must be >= 0 (0 = auto), got $wedgePasses")
    require(adjBroadcastBytes >= 0, s"adjBroadcastBytes must be >= 0 (0 = wedge plan), got $adjBroadcastBytes")
    val nWedge =
      if (wedgePartitions > 0) wedgePartitions else wedgeShuffleWidth(edges)
    val legacyWedgeArm = adjBroadcastBytes == 0 && wedgePasses == 1
    // the undirected edge set feeds the node set, the orientation's edge
    // side, AND the orientation's degree agg — materialize it once so
    // the caller's edge derivation (a multi-join + distinct for the
    // co-purchase graphs) is evaluated once, not once per branch
    // (round 14). The legacy A/B arm stays byte-for-byte un-materialized.
    val und =
      if (legacyWedgeArm) dedupUndirected(edges)
      else Materialize.frame(dedupUndirected(edges), checkpointDir)
    val nodes    = und.select(explode(array(col("u"), col("v"))).as("id")).distinct()
    val oriented = orient(und)
    // one pass's wedge-generate + close + per-node partial counts.
    // Co-partition both sides of the closing join at the pass-sized
    // width: each side's explicit hash partitioning satisfies the join's
    // distribution, so no further exchange is inserted and the SMJ sorts
    // run over nPass-way splits of the pass's wedge chunk.
    def passCounts(o: DataFrame, e1: DataFrame, nPass: Int): DataFrame = {
      val wedges = e1
        .as("e1")
        .join(o.as("e2"), col("e1.src") === col("e2.src"))
        .where(
          struct(col("e1.ddst"), col("e1.dst")) < struct(col("e2.ddst"), col("e2.dst"))
        )
        .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
      wedges
        .repartition(nPass, col("b"), col("c"))
        .join(
          o.repartition(nPass, col("src"), col("dst")).as("e3"),
          col("b") === col("e3.src") && col("c") === col("e3.dst"),
          "left_semi"
        )
        .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_tri"))
    }
    // Plan choice needs the oriented edge COUNT (the adjacency payload
    // is m ids); the checkpoint that makes the count cheap is also the
    // materialize-once both plans want (the adjacency plan scans o
    // three times, the wedge plan's passes rescan it). A zero budget
    // skips both and runs the legacy wedge path byte-for-byte — the
    // forced-wedge A/B arm.
    // The wedge-pass fallback over an already-checkpointed oriented
    // list: each pass's small per-node partial is eagerly materialized
    // (localCheckpoint truncates its lineage), so the pass's wedge
    // shuffle becomes unreachable and the context cleaner can reclaim
    // its spill before the next pass materializes — the explicit gc()
    // is the driver-side nudge that makes the reclaim prompt, not a
    // correctness dependency. The per-pass width is the full-wedge-set
    // width split across passes (each chunk is ~1/K of the wedges).
    def wedgeCounts(o: DataFrame): DataFrame = {
      // auto mode (wedgePasses = 0): size K from the analytic wedge
      // count — exact, node-scale, computed off the already-
      // checkpointed oriented list — against the disk budget
      val passes =
        if (wedgePasses > 0) wedgePasses
        else {
          val w = wedgeCountOf(o)
          val k = autoPasses(w, wedgeDiskBudgetBytes)
          System.err.println(
            s"[triangles] auto wedgePasses=$k (wedges=$w, " +
              s"bytes≈${w * BytesPerWedge}, budget=$wedgeDiskBudgetBytes)")
          k
        }
      if (passes == 1) passCounts(o, o, nWedge)
      else {
        val par   = edges.sparkSession.sparkContext.defaultParallelism
        val nPass = math.max(par, nWedge / passes)
        val partials = (0 until passes).map { k =>
          val e1 = o.where(pmod(xxhash64(col("dst")), lit(passes.toLong)) === k)
          val p  = Materialize.frame(passCounts(o, e1, nPass), checkpointDir)
          System.gc()
          p
        }
        partials
          .reduce(_.unionByName(_))
          .groupBy(col("id"))
          .agg(sum(col("n_tri")).as("n_tri"))
      }
    }
    val counts =
      if (legacyWedgeArm)
        // legacy single-pass wedge path byte-for-byte (no checkpoint,
        // no count job) — the forced-wedge A/B arm
        passCounts(oriented, oriented, nWedge)
      else {
        // materialize the oriented edges ONCE (tiny next to the wedges
        // either plan avoids): the count that drives the plan choice is
        // then a block scan, and every downstream rescan (the adjacency
        // plan reads o three times, the wedge passes K+1 times) hits
        // the checkpoint instead of re-deriving the edge expression.
        val o = Materialize.frame(oriented, checkpointDir)
        if (adjBroadcastBytes > 0 && o.count() <= adjBroadcastBytes / BytesPerAdjEdge) {
          System.err.println(
            s"[triangles] adjacency-broadcast plan (~${BytesPerAdjEdge} B/edge " +
              s"within budget=$adjBroadcastBytes)")
          adjCounts(o, checkpointDir)
        } else wedgeCounts(o)
      }
    counts
      .join(nodes, Seq("id"), "right")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }
}
