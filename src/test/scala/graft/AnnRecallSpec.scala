package graft

import graft.functions.VectorFunctions
import graft.operators.{IvfCentroids, KMeans, Pq, PqCodebooks, PqResidualCodebooks, Similarity}
import org.apache.spark.sql.functions._

/** Measured recall floors for the two ANN scale paths against the exact
  * brute-force baseline on the sf0.01 embeddings — the quantitative
  * claim PLANS.md makes (random-direction IVF 0.48, 8-table multi-probe
  * LSH 0.72 at top-5), asserted slightly below the measured values so
  * the test fails on a real recall regression (plane/centroid/probe
  * changes), not on noise (everything here is deterministic — seeded
  * planes, fixed corpus — so the measured recall is exactly
  * reproducible).
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }

  test("IVF and multi-probe LSH hit their documented recall floors at top-5") {
    // sf0.01 explicitly: PLANS.md's recall claims are measured on the
    // 500-vector corpus (SparkSpec.Sf is the tiny sf0.001 fixture, whose
    // 50-vector recall numbers are not comparable)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding"))

    val exact = topSets(
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", K)
    )
    // 12 independent tables x 14 planes, depth-2 multi-probe — the
    // ann_knn_lsh production config (LshTuneMain sweep: recall 0.72 at
    // ~7.8% probed fraction; r6's 8x8 depth-1 hit the same recall at
    // ~28%, r5's single-table depth-2 measured 0.44)
    val lsh = topSets(
      Similarity.lshTopK(
        corpus, queries, "vec_id", "embedding", K,
        nPlanes = 14, dim = 64, probeDepth = 2, nTables = 12)
    )
    val ivf = topSets(
      Similarity.ivfTopK(
        corpus, queries, "vec_id", "embedding", K,
        centroids = VectorFunctions.randomPlanes(16, 64, 7L), nProbe = 4
      )
    )

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      per.sum / per.size
    }

    val lshR = recall(lsh)
    val ivfR = recall(ivf)
    info(f"recall@5: lsh=$lshR%.3f ivf=$ivfR%.3f")
    assert(lshR >= 0.70, f"LSH recall regressed: $lshR%.3f") // measured 0.72 @ 8 tables x 8 planes, depth 1
    assert(ivfR >= 0.44, f"IVF recall regressed: $ivfR%.3f") // measured 0.48 @ nProbe=4 (random dirs; trained k-means below reaches 0.84)
  }

  test("TRAINED IVF centroids: k-means lifts recall@5 to >= 0.72 at nProbe 4") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding"))

    val exact = topSets(
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", K)
    )
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      per.sum / per.size
    }

    // LIVE training run — proves the distributed trainer itself, not just
    // the checked-in artifact (measured 0.84 at 5 Lloyd rounds; floor
    // leaves room for fp merge-order wobble at assignment boundaries,
    // and 0.72 is still 1.5x the 0.48 random-direction recall)
    val trained = KMeans.trainIvfCentroids(
      corpus, "vec_id", "embedding", k = IvfCentroids.K, dim = IvfCentroids.Dim,
      iters = IvfCentroids.Iters
    )
    val liveR = recall(topSets(
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", K, trained, nProbe = 4)
    ))
    // the checked-in constants the ann_knn_ivf query ships must deliver
    // the same recall class (they came from this trainer on this corpus)
    val shippedR = recall(topSets(
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", K, IvfCentroids.cells, nProbe = 4)
    ))
    info(f"trained-IVF recall@5: live=$liveR%.3f shipped=$shippedR%.3f")
    assert(liveR >= 0.72, f"live-trained IVF recall regressed: $liveR%.3f")
    assert(shippedR >= 0.72, f"shipped IvfCentroids recall regressed: $shippedR%.3f")
  }

  test("IVF-PQ at nProbe 8 clears recall@5 >= 0.90 — raw, shipped-residual, live-residual") {
    // recall here is CEILING-limited by cell coverage, not PQ quality:
    // nProbe 8 of 16 cells covers 0.92 of true top-5 on this corpus
    // (PLANS.md ceiling table), and both codecs reach that ceiling —
    // raw PQ at shortlist 50, residual PQ at shortlist 80 (residual ADC
    // orders slightly worse on this isotropic corpus, where residuals
    // are LARGER than the unit vectors; see the PLANS.md analysis).
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding"))

    val exact = topSets(
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", K)
    )
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      per.sum / per.size
    }

    val raw = recall(topSets(
      Pq.ivfPqTopK(
        corpus, queries, "vec_id", "embedding", K,
        IvfCentroids.cells, PqCodebooks.books, nProbe = 8, shortlist = 50
      )
    ))
    val shippedRes = recall(topSets(
      Pq.ivfPqResidualTopK(
        corpus, queries, "vec_id", "embedding", K,
        IvfCentroids.cells, PqResidualCodebooks.books, nProbe = 8, shortlist = 80
      )
    ))
    // LIVE residual training proves the trainer, not just the artifact
    val liveBooks = Pq.trainResidual(
      corpus, "vec_id", "embedding",
      dim = PqResidualCodebooks.Dim, m = PqResidualCodebooks.M,
      ksub = PqResidualCodebooks.Ksub, iters = PqResidualCodebooks.Iters,
      centroids = IvfCentroids.cells
    )
    val liveRes = recall(topSets(
      Pq.ivfPqResidualTopK(
        corpus, queries, "vec_id", "embedding", K,
        IvfCentroids.cells, liveBooks, nProbe = 8, shortlist = 80
      )
    ))
    info(f"IVF-PQ recall@5 at nProbe 8: raw=$raw%.3f shippedResidual=$shippedRes%.3f liveResidual=$liveRes%.3f")
    assert(raw >= 0.90, f"raw IVF-PQ recall regressed: $raw%.3f (measured 0.92)")
    assert(shippedRes >= 0.90, f"shipped residual IVF-PQ recall regressed: $shippedRes%.3f (measured 0.92)")
    assert(liveRes >= 0.90, f"live-trained residual IVF-PQ recall regressed: $liveRes%.3f (measured 0.92)")
  }

  test("nProbe ~ sqrt(C): the artifact's sqrt-C config holds the recall class with scaled probes") {
    // the round-10 sqrt-C artifact showed recall@5 decaying 0.53 -> 0.43
    // when C grew 16 -> 25 under a PINNED nProbe
    // (tools/bench_ann_sqrtc_sf01_r10.json); the policy fix scales
    // nProbe ∝ sqrt(C) (Similarity.sqrtScaledProbe — FAISS practice).
    // Pin it live AT THE ARTIFACT'S OWN CONFIG — sf0.1 corpus, C=25,
    // p=sqrtScaledProbe(4,16,25)=5: measured 0.51 scaled vs 0.53 base vs
    // 0.43 pinned (probe sweep: p5 0.51, p6 0.55, p7 0.58, p8 0.63).
    // Note the policy's claim is calibrated to the DEPLOYMENT path (N
    // and C grow together, cell width constant); growing C at fixed N —
    // as here and in the artifact's same-corpus contrast — shrinks
    // cells, which is the harsher direction, and the sqrt-scaled probe
    // still holds the class within ε. Everything is deterministic
    // (seeded trainer, fixed corpus), so these values are exactly
    // reproducible.
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding"))
    val exact = topSets(
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", K)
    )
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      per.sum / per.size
    }

    val c25 = 25
    val probe25 = Similarity.sqrtScaledProbe(4, IvfCentroids.K, c25)
    assert(probe25 == 5, s"sqrtScaledProbe(4, 16, 25) should be 5, got $probe25")
    val cells25 = KMeans.trainIvfCentroids(
      corpus, "vec_id", "embedding", k = c25, dim = IvfCentroids.Dim,
      iters = IvfCentroids.Iters)
    val base = recall(topSets(
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", K, IvfCentroids.cells, nProbe = 4)))
    val scaled = recall(topSets(
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", K, cells25, nProbe = probe25)))
    val pinned = recall(topSets(
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", K, cells25, nProbe = 4)))
    info(f"recall@5: C=16/p4 $base%.3f | C=25/p5 $scaled%.3f | C=25/p4 (unscaled) $pinned%.3f")
    assert(scaled >= base - 0.05,
      f"scaled-probe recall broke the floor: C=$c25/p$probe25 $scaled%.3f vs C=16/p4 $base%.3f")
    // and the scaled probe must actually help over the pinned one —
    // otherwise the policy is dead weight
    assert(scaled > pinned, f"scaled probe did not improve on pinned: $scaled%.3f <= $pinned%.3f")
  }

  test("hardNegativeTopK: only cross-label neighbors, ranked by cosine, self never appears") {
    import spark.implicits._
    import graft.operators.Similarity
    // 2-d vectors, label = quadrant-ish class; query 0 (label 0) points
    // along +x: nearest cross-label by cosine is 10 (0.9, 0.1), then 11
    // (0.5, 0.5), then 12 (0.0, 1.0)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.95f, 0.05f), 0),  // same label: must NOT appear
      (10L, Array(0.9f, 0.1f), 1),
      (11L, Array(0.5f, 0.5f), 1),
      (12L, Array(0.0f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity
      .hardNegativeTopK(emb, emb.where($"vec_id" === 0L), "vec_id", "embedding", "label", k = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)]
      .collect()
      .toSeq
      .sortBy(_._3)
    assert(out == Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3)))
  }

  test("fixed-query ANN twins equal the base rows restricted to the fixed query ids") {
    // the _fixedq rows exist so the cross-SF bench ratio measures pure
    // per-query scaling (the base rows' query set grows with the
    // corpus); their Spark bodies are duplicated call sites, so pin
    // twin == base ∩ (query_id < 2000) to make drift impossible to miss
    val sf = "/root/testdata/sf0.01"
    def rows(name: String) = graft.SparkEntry.queries(name)(spark, sf)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .as[(Long, Long, Int)].collect().toSet
    for ((base, twin) <- Seq(
        "ann_knn_ivf" -> "ann_knn_ivf_fixedq",
        "ann_knn_ivfpq" -> "ann_knn_ivfpq_fixedq",
        "ann_knn_ivfpq_residual" -> "ann_knn_ivfpq_residual_fixedq",
        "ann_knn_lsh" -> "ann_knn_lsh_fixedq",
        "ann_knn_pq" -> "ann_knn_pq_fixedq",
        "ann_knn_bruteforce" -> "ann_knn_bruteforce_fixedq")) {
      val expected = rows(base).filter(_._1 < 2000L)
      assert(rows(twin) == expected, s"$twin drifted from $base")
    }
  }
}
