package graft.tools

import graft.{SparkEntry, Tables}
import graft.operators.{IvfCentroids, KMeans, Pq, PqCodebooks, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The IVF sublinearity artifact (round 10): measure ANN PER-QUERY cost
  * with the coarse cell count scaled to the corpus, C ~ sqrt(N) — the
  * FAISS deployment rule — against the correctness gate's pinned C=16.
  *
  * Why a dedicated main: the gate rows keep C=16 at every scale so the
  * DuckDB oracle's literal centroid table stays reviewable, which makes
  * their measured per-query scaling corpus-LINEAR by construction
  * (nProbe/C of the corpus is scanned, and cells widen with N). The
  * deployment claim — per-query cost ~ sqrt(N) when C grows as
  * sqrt(N) — was prose until this artifact (PLANS.md round-9 ANN
  * section). Training C centroids per scale cannot ship as checked-in
  * constants for every scale, so it happens HERE, off the clock, the
  * way a production quantizer is trained offline.
  *
  * Two row families, both over the SAME fixed ~20-query set the
  * `_fixedq` gate twins pin (vec_id % 100 == 0 && vec_id < 2000):
  *
  *   - `ann_search_*`: search over a PREBUILT index (ivfAssign /
  *     ivfPqEncode written to parquet untimed, read back) — pure
  *     serving cost, the number the sublinearity claim is about. The
  *     index build is one-time and amortized in production (AnnIndex
  *     appends increments; it never reruns per query).
  *   - `ann_knn_*_sqrtc_fixedq`: end-to-end (encode + search in one
  *     query), directly comparable to the r9 `ann_knn_*_fixedq` gate
  *     rows. Their corpus-side encode is O(N*C) and with C ~ sqrt(N)
  *     grows as N^1.5 — the artifact carries both so the decomposition
  *     (encode linear-or-worse, SEARCH sublinear) is measured, not
  *     argued.
  *
  * The sqrtc configs probe nProbe ∝ sqrt(C) ([[Similarity
  * .sqrtScaledProbe]], FAISS practice) — round 10 pinned nProbe while
  * cells shrank and recall@5 at sf0.1 dipped 0.53 -> 0.43; the scaled
  * probe holds the recall class while candidate mass stays sublinear
  * (~N^{3/4}). The JSON carries the probes used per config.
  *
  * Untimed recall@k vs exact brute force on the same queries rides in
  * the JSON: a sublinear search that lost its recall would be an empty
  * claim. TWO recall blocks: `recall_at_k` (raw, comparable to the r10
  * artifact) and `recall_at_k_nodup`, which excludes each query's own
  * fixture copies from both the truth set and the candidates. On the
  * scaled fixtures each query still carries `factor` jittered copies of
  * itself (MakeScaleMain draws copies at half the base corpus's median
  * 5-NN distance — round 12; the pre-r12 dim-0-epsilon fixture made
  * them byte-near twins), so the raw block stays inflated by the copy
  * family; the nodup block is the informative number at those scales.
  *
  * TWO recall floors, because they test different claims:
  *
  *   - `recall_floor_sqrtprobe_ok`: nodup(sqrtc @ nProbe ∝ sqrt(C)) >=
  *     nodup(c16) − 0.05 per family — the FAISS-regime claim that
  *     sublinear probing holds the recall class, which needs neighbors
  *     to concentrate in few cells. Holds at sf0.1 (the real corpus)
  *     AND, since round 12, on the jittered scale fixtures: sf1 reads
  *     nodup 0.61-vs-0.51 (ivf) / 0.70-vs-0.56 (ivfpq) at HALF the
  *     probed candidates (bench_ann_sqrtc_sf1_r12.json). Under the
  *     pre-r12 epsilon fixture this floor read FALSE at sf1 (0.35 vs
  *     0.50) because ×10 byte-near copies destroyed cross-base-id
  *     neighbor structure — a fixture artifact, adjudicated in round
  *     11 and FIXED by the jittered generator rather than re-waived.
  *   - `recall_floor_eqfrac_ok`: nodup(sqrtc @ nProbe scaled to the
  *     SAME cell fraction as c16, nProbe = C·base/16) >= nodup(c16) −
  *     0.05 — the index-soundness control. At equal probed fraction a
  *     sound C-cell quantizer should roughly match the 16-cell one on
  *     any data; a failure here is a STRONG signal of an index defect,
  *     not proof — finer partitions can split a query's true neighbors
  *     across more cell boundaries on clustered data, so equal probed
  *     fraction does not strictly guarantee recall parity. Triage a
  *     false reading by checking boundary-split mass before blaming
  *     the index. This is still the floor a
  *     structureless fixture can still falsify, so it is the one
  *     asserted at both scales. The eqfrac configs are recall-only
  *     diagnostics (never timed — their candidate mass is corpus-linear
  *     by construction and carries no sublinearity claim).
  *
  * Protocol mirrors Bench: min-of-REPS interleaved passes with the w1
  * control query's spread self-describing host noise.
  */
object AnnSqrtCMain {
  private val KnnK    = 5
  private val IvfProbe   = 4
  private val IvfPqProbe = 8
  private val Shortlist  = 50
  private val Dim        = 64
  private val Iters      = 5
  // the fixture's base vec_id space: scaled fixtures remap copies to
  // vec_id + copy*BaseIds (MakeScaleMain's offset contract), so
  // vec_id % BaseIds recovers the pre-remap id — same constant the
  // fixed query set's `< 2000` bound pins
  private val BaseIds = 2000L
  private val RecallEps = 0.05

  /** C ~ sqrt(N), calibrated so the two driver scales land on round
    * cell counts: N=2000 (sf0.1) -> 25, N=20000 (sf1) -> 80. The
    * constant is presentation, the sqrt is the claim.
    */
  def sqrtCells(n: Long): Int =
    math.max(16, math.round(math.sqrt(n / 3.125)).toInt)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps  = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val out   = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "tools/bench_ann_sqrtc.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism

    def emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    def corpus = emb.repartition(par)
    def fixedQ = emb.where(col("vec_id") % 100 === 0 && col("vec_id") < 2000L)

    val n = emb.count()
    val cSqrt = sqrtCells(n)
    // nProbe ∝ sqrt(C) for the sqrtc configs (round-11 recall fix);
    // c16 keeps the gate's pinned probes
    val ivfProbeSqrt   = Similarity.sqrtScaledProbe(IvfProbe, 16, cSqrt)
    val ivfPqProbeSqrt = Similarity.sqrtScaledProbe(IvfPqProbe, 16, cSqrt)
    // equal-cell-FRACTION probes for the index-soundness control:
    // probe the same share of cells c16 probes (base/16 of them)
    def eqFracProbe(baseProbe: Int): Int =
      math.min(cSqrt, math.max(1, math.round(cSqrt * baseProbe / 16.0).toInt))
    val ivfProbeEq   = eqFracProbe(IvfProbe)
    val ivfPqProbeEq = eqFracProbe(IvfPqProbe)
    System.err.println(
      s"[ann-sqrtc] n=$n cells: c16=16 sqrtc=$cSqrt probes: " +
        s"ivf=$IvfProbe->$ivfProbeSqrt(eq $ivfProbeEq) " +
        s"ivfpq=$IvfPqProbe->$ivfPqProbeSqrt(eq $ivfPqProbeEq)")

    // ---- OFFLINE (untimed): train the corpus-scaled quantizer, build
    //      both indexes to parquet. Production analogue: TrainIvfMain +
    //      AnnIndex store builds, amortized across every future query.
    val t0 = System.nanoTime()
    val centsSqrt = KMeans.trainIvfCentroids(emb, "vec_id", "embedding", k = cSqrt, dim = Dim, iters = Iters)
    val trainSec = (System.nanoTime() - t0) / 1e9
    val centsC16 = IvfCentroids.cells

    val work = java.nio.file.Files.createTempDirectory("graft_ann_sqrtc").toString
    val stores: Map[String, String] = Map(
      "ivf_c16"     -> s"$work/ivf_c16",
      "ivf_sqrtc"   -> s"$work/ivf_sqrtc",
      "ivfpq_c16"   -> s"$work/ivfpq_c16",
      "ivfpq_sqrtc" -> s"$work/ivfpq_sqrtc"
    )
    Similarity.ivfAssign(corpus, "vec_id", "embedding", centsC16)
      .write.mode("overwrite").parquet(stores("ivf_c16"))
    Similarity.ivfAssign(corpus, "vec_id", "embedding", centsSqrt)
      .write.mode("overwrite").parquet(stores("ivf_sqrtc"))
    Pq.ivfPqEncode(corpus, "vec_id", "embedding", centsC16, PqCodebooks.books)
      .write.mode("overwrite").parquet(stores("ivfpq_c16"))
    Pq.ivfPqEncode(corpus, "vec_id", "embedding", centsSqrt, PqCodebooks.books)
      .write.mode("overwrite").parquet(stores("ivfpq_sqrtc"))

    def searchIvf(store: String, cents: Seq[Array[Double]], nProbe: Int, k: Int = KnnK) =
      Similarity.ivfTopKAssigned(
        spark.read.parquet(stores(store)), fixedQ, "vec_id", "embedding",
        k, cents, nProbe)
    def searchIvfPq(store: String, cents: Seq[Array[Double]], nProbe: Int, k: Int = KnnK) =
      Pq.ivfPqTopKEncoded(
        spark.read.parquet(stores(store)), "vec_id", fixedQ, "embedding",
        k, cents, PqCodebooks.books, nProbe, math.max(Shortlist, k * 10))

    val queries: Seq[(String, () => DataFrame)] = Seq(
      // serving cost over the prebuilt index — the sublinearity rows
      "ann_search_ivf_c16_fixedq"     -> (() => searchIvf("ivf_c16", centsC16, IvfProbe)),
      "ann_search_ivf_sqrtc_fixedq"   -> (() => searchIvf("ivf_sqrtc", centsSqrt, ivfProbeSqrt)),
      "ann_search_ivfpq_c16_fixedq"   -> (() => searchIvfPq("ivfpq_c16", centsC16, IvfPqProbe)),
      "ann_search_ivfpq_sqrtc_fixedq" -> (() => searchIvfPq("ivfpq_sqrtc", centsSqrt, ivfPqProbeSqrt)),
      // end-to-end rows (encode in-query) at BOTH cell counts, measured
      // under identical host/run conditions so the C comparison never
      // crosses artifacts
      "ann_knn_ivf_c16_fixedq" -> (() =>
        Similarity.ivfTopK(corpus, fixedQ, "vec_id", "embedding", KnnK, centsC16, IvfProbe)),
      "ann_knn_ivf_sqrtc_fixedq" -> (() =>
        Similarity.ivfTopK(corpus, fixedQ, "vec_id", "embedding", KnnK, centsSqrt, ivfProbeSqrt)),
      "ann_knn_ivfpq_c16_fixedq" -> (() =>
        Pq.ivfPqTopK(corpus, fixedQ, "vec_id", "embedding", KnnK, centsC16,
          PqCodebooks.books, IvfPqProbe, Shortlist)),
      "ann_knn_ivfpq_sqrtc_fixedq" -> (() =>
        Pq.ivfPqTopK(corpus, fixedQ, "vec_id", "embedding", KnnK, centsSqrt,
          PqCodebooks.books, ivfPqProbeSqrt, Shortlist))
    )

    // ---- probed candidate mass (untimed, EXACT): the number the
    //      sublinearity claim actually is. Per config, the total corpus
    //      rows inside the queries' probed cells — wall-clock at this
    //      testbed scale is overhead-bound (every search row lands
    //      sub-second), but candidate mass is scale-exact: at fixed C it
    //      grows ~linearly with N; at C ~ sqrt(N) with fixed nProbe it
    //      grows ~sqrt(N).
    def candidateMass(store: String, cents: Seq[Array[Double]], nProbe: Int): Long = {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFunctions
      val pops = spark.read.parquet(stores(store))
        .groupBy(col("cell")).agg(count(lit(1)).as("pop"))
      val qd = fixedQ
        .withColumn("__cd", VectorFunctions.cellDots(col("embedding"), cents))
        .select(col("vec_id").as("qid"), posexplode(col("__cd")).as(Seq("cell", "celldot")))
      val w = Window.partitionBy(col("qid")).orderBy(col("celldot").desc, col("cell").asc)
      val probed = qd
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= nProbe)
        .select(col("qid"), col("cell"))
      probed.join(pops, "cell").agg(coalesce(sum(col("pop")), lit(0L))).head().getLong(0)
    }
    val candMass = Seq(
      "ivf_c16"     -> candidateMass("ivf_c16", centsC16, IvfProbe),
      "ivf_sqrtc"   -> candidateMass("ivf_sqrtc", centsSqrt, ivfProbeSqrt),
      "ivfpq_c16"   -> candidateMass("ivfpq_c16", centsC16, IvfPqProbe),
      "ivfpq_sqrtc" -> candidateMass("ivfpq_sqrtc", centsSqrt, ivfPqProbeSqrt),
      "ivf_sqrtc_eqfrac"   -> candidateMass("ivf_sqrtc", centsSqrt, ivfProbeEq),
      "ivfpq_sqrtc_eqfrac" -> candidateMass("ivfpq_sqrtc", centsSqrt, ivfPqProbeEq)
    )

    // ---- recall (untimed): each path vs exact brute force ----
    def pairs(df: DataFrame): Set[(Long, Long)] = df
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(corpus, fixedQ, "vec_id", "embedding", KnnK))
    val approx = Seq(
      "ivf_c16"     -> pairs(searchIvf("ivf_c16", centsC16, IvfProbe)),
      "ivf_sqrtc"   -> pairs(searchIvf("ivf_sqrtc", centsSqrt, ivfProbeSqrt)),
      "ivfpq_c16"   -> pairs(searchIvfPq("ivfpq_c16", centsC16, IvfPqProbe)),
      "ivfpq_sqrtc" -> pairs(searchIvfPq("ivfpq_sqrtc", centsSqrt, ivfPqProbeSqrt))
    )
    val recall = approx.map { case (name, got) =>
      name -> (got.intersect(exact).size.toDouble / exact.size)
    }

    // ---- copy-aware recall (untimed): scaled fixtures carry `factor`
    //      jittered copies of every query (MakeScaleMain: vec_id
    //      shifted by copy*BaseIds, full-dim jitter at half the median
    //      5-NN distance); the copy family still packs the raw truth
    //      set and inflates raw recall for any config. Exclude each
    //      query's own copies from truth AND candidates: search padded
    //      to k + copies, drop same-base-id neighbors, keep the top
    //      KnnK by the search's own rank. ----
    val copiesPerQuery = math.max(0, (n / BaseIds).toInt - 1)
    val kPad = KnnK + copiesPerQuery
    def noDupTop(df: DataFrame): Set[(Long, Long)] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("query_id")).orderBy(col("rank").asc)
      pairs(
        df.where(col("neighbor_id") % BaseIds =!= col("query_id") % BaseIds)
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= KnnK))
    }
    val exactNd = noDupTop(
      Similarity.bruteForceTopK(corpus, fixedQ, "vec_id", "embedding", kPad))
    val recallNd = Seq(
      "ivf_c16"     -> noDupTop(searchIvf("ivf_c16", centsC16, IvfProbe, kPad)),
      "ivf_sqrtc"   -> noDupTop(searchIvf("ivf_sqrtc", centsSqrt, ivfProbeSqrt, kPad)),
      "ivfpq_c16"   -> noDupTop(searchIvfPq("ivfpq_c16", centsC16, IvfPqProbe, kPad)),
      "ivfpq_sqrtc" -> noDupTop(searchIvfPq("ivfpq_sqrtc", centsSqrt, ivfPqProbeSqrt, kPad)),
      // recall-only diagnostics: the scaled index probed at c16's cell
      // FRACTION — index soundness, no sublinearity claim (never timed)
      "ivf_sqrtc_eqfrac"   -> noDupTop(searchIvf("ivf_sqrtc", centsSqrt, ivfProbeEq, kPad)),
      "ivfpq_sqrtc_eqfrac" -> noDupTop(searchIvfPq("ivfpq_sqrtc", centsSqrt, ivfPqProbeEq, kPad))
    ).map { case (name, got) =>
      name -> (got.intersect(exactNd).size.toDouble / exactNd.size)
    }
    val recallNdMap = recallNd.toMap
    // Two floors (scaladoc): sqrt-probe = the FAISS-regime claim,
    // holds only where the data has cluster structure (the real sf0.1
    // corpus; NOT the ×10-copy fixture); eqfrac = index soundness,
    // assertable on any data.
    val floorSqrtOk =
      recallNdMap("ivf_sqrtc") >= recallNdMap("ivf_c16") - RecallEps &&
        recallNdMap("ivfpq_sqrtc") >= recallNdMap("ivfpq_c16") - RecallEps
    val floorEqOk =
      recallNdMap("ivf_sqrtc_eqfrac") >= recallNdMap("ivf_c16") - RecallEps &&
        recallNdMap("ivfpq_sqrtc_eqfrac") >= recallNdMap("ivfpq_c16") - RecallEps

    // ---- timed passes: Bench's protocol (min-of-reps, interleaved,
    //      control spread self-describes noise) ----
    val best   = scala.collection.mutable.Map.empty[String, Double]
    val failed = scala.collection.mutable.Map.empty[String, String]
    val controlTs = scala.collection.mutable.ArrayBuffer.empty[Double]
    def time(body: () => DataFrame): Option[Double] = {
      val s0 = System.nanoTime()
      try {
        body().write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - s0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[ann-sqrtc] FAILED: ${e.getMessage}")
        None
      }
    }
    def runControl(): Unit =
      time(() => SparkEntry.queries("w1_window_dedup_latest")(spark, sfDir))
        .foreach(controlTs += _)
    for (_ <- 1 to reps) {
      runControl()
      for ((name, body) <- queries)
        time(body) match {
          case Some(t) => best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
          case None    => failed(name) = "error"
        }
      runControl()
    }

    def fmt(v: Double): String = (math.round(v * 10000) / 10000.0).toString
    val qs = queries.map(_._1).sorted
      .map(k => s"\"$k\":${best.get(k).map(fmt).getOrElse("-1")}").mkString("{", ",", "}")
    val rc  = recall.map { case (k, v) => s"\"$k\":${fmt(v)}" }.mkString("{", ",", "}")
    val rcn = recallNd.map { case (k, v) => s"\"$k\":${fmt(v)}" }.mkString("{", ",", "}")
    val cm  = candMass.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val probes =
      s"""{"ivf_c16":$IvfProbe,"ivf_sqrtc":$ivfProbeSqrt,""" +
        s""""ivfpq_c16":$IvfPqProbe,"ivfpq_sqrtc":$ivfPqProbeSqrt,""" +
        s""""ivf_sqrtc_eqfrac":$ivfProbeEq,"ivfpq_sqrtc_eqfrac":$ivfPqProbeEq}"""
    val control = {
      val s = controlTs.sorted
      if (s.isEmpty) "null"
      else s"""{"query":"w1_window_dedup_latest","n":${s.size},"min":${fmt(s.head)},"median":${fmt(s(s.size / 2))},"control_ratio":${fmt(s(s.size / 2) / s.head)}}"""
    }
    val total = best.values.sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
        s""""n_vectors":$n,"cells_c16":16,"cells_sqrtc":$cSqrt,"train_sec":${fmt(trainSec)},""" +
        s""""nprobe":$probes,"probed_candidates":$cm,"recall_at_$KnnK":$rc,""" +
        s""""recall_at_${KnnK}_nodup":$rcn,"recall_floor_sqrtprobe_ok":$floorSqrtOk,""" +
        s""""recall_floor_eqfrac_ok":$floorEqOk,""" +
        s""""failed":[${failed.keys.toSeq.sorted.map(f => s"\"$f\"").mkString(",")}],""" +
        s""""control":$control,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(out), (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[ann-sqrtc] result backstop failed: $e") }
    spark.stop()
    System.err.flush()
    println(line)
    System.out.flush()
  }
}
