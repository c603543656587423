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
  * Untimed recall@k vs exact brute force on the same queries rides in
  * the JSON: a sublinear search that lost its recall would be an empty
  * claim. Protocol mirrors Bench: min-of-REPS interleaved passes with
  * the w1 control query's spread self-describing host noise.
  */
object AnnSqrtCMain {
  private val KnnK    = 5
  private val IvfProbe   = 4
  private val IvfPqProbe = 8
  private val Shortlist  = 50
  private val Dim        = 64
  private val Iters      = 5

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
    System.err.println(s"[ann-sqrtc] n=$n cells: c16=16 sqrtc=$cSqrt")

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

    def searchIvf(store: String, cents: Seq[Array[Double]]) =
      Similarity.ivfTopKAssigned(
        spark.read.parquet(stores(store)), fixedQ, "vec_id", "embedding",
        KnnK, cents, IvfProbe)
    def searchIvfPq(store: String, cents: Seq[Array[Double]]) =
      Pq.ivfPqTopKEncoded(
        spark.read.parquet(stores(store)), "vec_id", fixedQ, "embedding",
        KnnK, cents, PqCodebooks.books, IvfPqProbe, Shortlist)

    val queries: Seq[(String, () => DataFrame)] = Seq(
      // serving cost over the prebuilt index — the sublinearity rows
      "ann_search_ivf_c16_fixedq"     -> (() => searchIvf("ivf_c16", centsC16)),
      "ann_search_ivf_sqrtc_fixedq"   -> (() => searchIvf("ivf_sqrtc", centsSqrt)),
      "ann_search_ivfpq_c16_fixedq"   -> (() => searchIvfPq("ivfpq_c16", centsC16)),
      "ann_search_ivfpq_sqrtc_fixedq" -> (() => searchIvfPq("ivfpq_sqrtc", centsSqrt)),
      // end-to-end rows (encode in-query) at BOTH cell counts, measured
      // under identical host/run conditions so the C comparison never
      // crosses artifacts
      "ann_knn_ivf_c16_fixedq" -> (() =>
        Similarity.ivfTopK(corpus, fixedQ, "vec_id", "embedding", KnnK, centsC16, IvfProbe)),
      "ann_knn_ivf_sqrtc_fixedq" -> (() =>
        Similarity.ivfTopK(corpus, fixedQ, "vec_id", "embedding", KnnK, centsSqrt, IvfProbe)),
      "ann_knn_ivfpq_c16_fixedq" -> (() =>
        Pq.ivfPqTopK(corpus, fixedQ, "vec_id", "embedding", KnnK, centsC16,
          PqCodebooks.books, IvfPqProbe, Shortlist)),
      "ann_knn_ivfpq_sqrtc_fixedq" -> (() =>
        Pq.ivfPqTopK(corpus, fixedQ, "vec_id", "embedding", KnnK, centsSqrt,
          PqCodebooks.books, IvfPqProbe, Shortlist))
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
      "ivf_sqrtc"   -> candidateMass("ivf_sqrtc", centsSqrt, IvfProbe),
      "ivfpq_c16"   -> candidateMass("ivfpq_c16", centsC16, IvfPqProbe),
      "ivfpq_sqrtc" -> candidateMass("ivfpq_sqrtc", centsSqrt, IvfPqProbe)
    )

    // ---- recall (untimed): each path vs exact brute force ----
    def pairs(df: DataFrame): Set[(Long, Long)] = df
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(corpus, fixedQ, "vec_id", "embedding", KnnK))
    val recall = Seq(
      "ivf_c16"     -> pairs(searchIvf("ivf_c16", centsC16)),
      "ivf_sqrtc"   -> pairs(searchIvf("ivf_sqrtc", centsSqrt)),
      "ivfpq_c16"   -> pairs(searchIvfPq("ivfpq_c16", centsC16)),
      "ivfpq_sqrtc" -> pairs(searchIvfPq("ivfpq_sqrtc", centsSqrt))
    ).map { case (name, got) =>
      name -> (got.intersect(exact).size.toDouble / exact.size)
    }

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
    val rc = recall.map { case (k, v) => s"\"$k\":${fmt(v)}" }.mkString("{", ",", "}")
    val cm = candMass.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val control = {
      val s = controlTs.sorted
      if (s.isEmpty) "null"
      else s"""{"query":"w1_window_dedup_latest","n":${s.size},"min":${fmt(s.head)},"median":${fmt(s(s.size / 2))},"control_ratio":${fmt(s(s.size / 2) / s.head)}}"""
    }
    val total = best.values.sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
        s""""n_vectors":$n,"cells_c16":16,"cells_sqrtc":$cSqrt,"train_sec":${fmt(trainSec)},""" +
        s""""probed_candidates":$cm,"recall_at_$KnnK":$rc,""" +
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
