package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - `bruteForceTopK`: exact cosine against every corpus vector. The
  *     query set is broadcast (it is small by construction), so the
  *     corpus scan never shuffles for the join; only the final top-k
  *     ranking shuffles, keyed by query id.
  *   - `lshTopK`: the scale path — both sides are bucketed by
  *     random-hyperplane LSH with multi-probe (query also probes buckets
  *     at Hamming distance 1), so each corpus row joins only its bucket's
  *     queries. Recall < 1 by design; controlled by nPlanes/probes.
  */
object Similarity {
  /** Exact top-k by cosine for each query row. Deterministic tiebreak on
    * corpus id. Returns (query_id, neighbor_id, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    // pre-cast to double and precompute norms ONCE PER ROW — the join
    // would otherwise re-derive both norms for every (query, corpus) pair
    val q = queries.select(
      col(idCol).as("query_id"),
      VectorFunctions.toDouble(col(vecCol)).as("q_vec"),
      VectorFunctions.norm2(col(vecCol)).as("q_norm")
    )
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      VectorFunctions.toDouble(col(vecCol)).as("c_vec"),
      VectorFunctions.norm2(col(vecCol)).as("c_norm")
    )
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "cos",
        VectorFunctions.cosinePre(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"))
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the top-k most similar corpus vectors with a DIFFERENT label —
    * the negatives that actually teach (a random negative is usually
    * trivially far; the near-miss carries the gradient). Same scale
    * shape as [[bruteForceTopK]]: the query set broadcasts, the corpus
    * never shuffles for the join, only the k-bounded ranking exchanges.
    * Returns (query_id, neighbor_id, rank, cos).
    */
  def hardNegativeTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      col(labelCol).as("q_lbl"),
      VectorFunctions.toDouble(col(vecCol)).as("q_vec"),
      VectorFunctions.norm2(col(vecCol)).as("q_norm")
    )
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(labelCol).as("c_lbl"),
      VectorFunctions.toDouble(col(vecCol)).as("c_vec"),
      VectorFunctions.norm2(col(vecCol)).as("c_norm")
    )
    val scored = c
      .join(broadcast(q), col("q_lbl") =!= col("c_lbl"))
      .withColumn(
        "cos",
        VectorFunctions.cosinePre(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"))
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** The multi-probe masks of one LSH table: own bucket, every
    * single-bit flip (depth 1), every two-bit flip (depth 2).
    */
  def lshProbeMasks(nPlanes: Int, probeDepth: Int): Seq[Int] =
    Seq(0) ++
      (if (probeDepth >= 1) (0 until nPlanes).map(1 << _) else Seq.empty) ++
      (if (probeDepth >= 2)
         for { i <- 0 until nPlanes; j <- (i + 1) until nPlanes }
           yield (1 << i) | (1 << j)
       else Seq.empty)

  /** LSH-bucketed ANN top-k: candidates limited to matching buckets,
    * with multi-probe on the query side (all buckets within Hamming
    * distance `probeDepth` of the query's own bucket) and `nTables`
    * INDEPENDENT hash tables (distinct seeded plane sets) unioned on
    * the candidate side — the classic LSH recall lever: per-table miss
    * probabilities multiply, so recall ≈ 1-(1-r₁)^L for near-independent
    * tables. Same output shape as bruteForceTopK.
    *
    * Scale shape: the corpus side emits one (table, bucket) row per
    * table — a narrow L-fold explode, no shuffle — and each row joins
    * only its bucket's queries; probe cost is
    * ~L·(#probes / 2^nPlanes)·|corpus| candidate pairs. With several
    * tables a pair can collide more than once, so candidates dedup by
    * (query, neighbor) before ranking (single-table keeps the
    * dedup-free plan: a vector lives in exactly one bucket).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int,
      dim: Int,
      probeDepth: Int = 1,
      nTables: Int = 1,
      seed: Long = 42L
  ): DataFrame = {
    require(probeDepth >= 0 && probeDepth <= 2, "probeDepth must be 0, 1, or 2")
    require(nTables >= 1, s"nTables must be >= 1, got $nTables")
    // ALL nTables bucket ids in ONE native kernel call per row
    // (functions.LshBuckets): the pre-r7 form built nTables*nPlanes
    // separate dot-product expressions, and Catalyst planning + Janino
    // compilation of that tree dominated wall time (it scaled with the
    // expression count, not the data — see the kernel's scaladoc).
    // posexplode yields (table index, bucket id) pairs directly.
    def buckets(v: Column): Column =
      call_function("graft_lsh_buckets", v, lit(nTables), lit(nPlanes), lit(dim), lit(seed))

    val c = corpus
      .select(
        col(idCol).as("neighbor_id"),
        VectorFunctions.toDouble(col(vecCol)).as("c_vec"),
        VectorFunctions.norm2(col(vecCol)).as("c_norm"),
        posexplode(buckets(col(vecCol))).as(Seq("tbl", "bucket"))
      )

    // query side: own bucket per table, then every probe mask applied to
    // it — a second tiny explode over the constant mask list (query set
    // is small by construction)
    val masks = lshProbeMasks(nPlanes, probeDepth)
    val q = queries
      .select(
        col(idCol).as("query_id"),
        VectorFunctions.toDouble(col(vecCol)).as("q_vec"),
        VectorFunctions.norm2(col(vecCol)).as("q_norm"),
        posexplode(buckets(col(vecCol))).as(Seq("tbl", "b0"))
      )
      .select(
        col("query_id"), col("q_vec"), col("q_norm"), col("tbl"), col("b0"),
        explode(typedLit(masks)).as("mask")
      )
      .select(
        col("query_id"), col("q_vec"), col("q_norm"), col("tbl"),
        col("b0").bitwiseXOR(col("mask")).as("bucket"))

    val scored = c
      .join(broadcast(q), Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "cos",
        VectorFunctions.cosinePre(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"))
      )
    // cross-table collisions produce duplicate pairs (identical cos);
    // collapse them before ranking. nTables == 1 cannot duplicate —
    // keep its leaner no-dedup plan.
    val deduped =
      if (nTables == 1) scored.select(col("query_id"), col("neighbor_id"), col("cos"))
      else
        scored
          .groupBy(col("query_id"), col("neighbor_id"))
          .agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    deduped
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** IVF (inverted-file) ANN — the second scale path: a coarse quantizer
    * assigns every corpus vector to its best of `centroids.size` cells
    * (argmax dot product, first-max tiebreak), queries probe their
    * `nProbe` best cells, and exact cosine runs only within probed
    * cells. Corpus-side work is a narrow map stage (C dot products per
    * row, no explode); only the tiny query side fans out by nProbe.
    *
    * Centroids are data-independent seeded directions here so the DuckDB
    * oracle can share them as literals; a production deployment trains
    * them offline (k-means over a sample) and ships them as constants —
    * the engine-side plumbing is identical either way. Versus lshTopK:
    * cells partition the corpus (each vector scanned from exactly one
    * cell list), so probe cost scales as nProbe/C of the corpus instead
    * of per-plane collision rates.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Seq[Array[Double]],
      nProbe: Int
  ): DataFrame =
    ivfTopKAssigned(ivfAssign(corpus, idCol, vecCol, centroids), queries, idCol, vecCol, k, centroids, nProbe)

  /** The ASSIGN half of [[ivfTopK]] on its own: each corpus vector's
    * coarse cell (argmax centroid dot — array_position takes the FIRST
    * max, a deterministic lowest-index tiebreak the oracle mirrors with
    * (dot DESC, cell ASC)), plus the pre-cast vector and norm the exact
    * in-cell scoring reuses. This is the IVF posting-list build — the
    * one-time O(|batch| x C) map stage an incremental index pays per
    * arriving batch (never per query); [[ivfTopKAssigned]] is the
    * serving half that reads it back.
    * Output: (neighbor_id, c_vec, c_norm, cell).
    */
  def ivfAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Array[Double]]
  ): DataFrame =
    corpus
      .withColumn("__cd", VectorFunctions.cellDots(col(vecCol), centroids))
      .select(
        col(idCol).as("neighbor_id"),
        VectorFunctions.toDouble(col(vecCol)).as("c_vec"),
        VectorFunctions.norm2(col(vecCol)).as("c_norm"),
        (array_position(col("__cd"), array_max(col("__cd"))) - 1).cast("int").as("cell")
      )

  /** FAISS-practice probe scaling: when the coarse cell count grows
    * with the corpus (C ~ sqrt(N)), a PINNED nProbe probes a shrinking
    * fraction of the space and recall decays — measured at sf0.1:
    * recall@5 0.43 at C=25/nProbe=4 vs 0.53 at C=16/nProbe=4
    * (tools/bench_ann_sqrtc_sf01_r10.json). Scaling nProbe ∝ sqrt(C)
    * holds the recall class while keeping the probed-candidate mass
    * sublinear in N (nProbe·N/C ~ N^{3/4} when C ~ sqrt(N)).
    * AnnRecallSpec pins the policy's recall floor; AnnSqrtCMain emits
    * the measured artifact.
    */
  def sqrtScaledProbe(baseProbe: Int, baseCells: Int, cells: Int): Int = {
    require(baseProbe >= 1 && baseCells >= 1 && cells >= 1)
    math.min(cells, math.max(baseProbe,
      math.round(baseProbe * math.sqrt(cells.toDouble / baseCells)).toInt))
  }

  /** The SEARCH half of [[ivfTopK]] over an ALREADY-ASSIGNED corpus
    * (as [[ivfAssign]] emits) — per-query work only: probe the nProbe
    * best cells, exact cosine inside probed cells. Results identical
    * to ivfTopK over the raw corpus.
    */
  def ivfTopKAssigned(
      assigned: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Seq[Array[Double]],
      nProbe: Int
  ): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.size, "nProbe must be in [1, centroids.size]")
    def cellDots(v: Column): Column = VectorFunctions.cellDots(v, centroids)

    val c = assigned.select(col("neighbor_id"), col("c_vec"), col("c_norm"), col("cell"))

    val qw = Window.partitionBy(col("query_id")).orderBy(col("celldot").desc, col("cell").asc)
    val qProbes = queries
      .withColumn("__cd", cellDots(col(vecCol)))
      .select(
        col(idCol).as("query_id"),
        VectorFunctions.toDouble(col(vecCol)).as("q_vec"),
        VectorFunctions.norm2(col(vecCol)).as("q_norm"),
        // outer variant: plain posexplode would let InferFiltersFromGenerate
        // re-derive the staged cellDots array inside a pre-filter
        // (size(__cd) > 0); __cd is never empty (C literal centroids), so
        // the guard is a cheap isnotnull on the generated attribute
        posexplode_outer(col("__cd")).as(Seq("cell", "celldot"))
      )
      .where(col("cell").isNotNull)
      .withColumn("rn", row_number().over(qw))
      .where(col("rn") <= nProbe)
      .drop("rn", "celldot")

    // cells partition the corpus, so a (query, neighbor) pair meets at
    // most once — no dedup stage needed (unlike multi-probe LSH)
    val scored = c
      .join(broadcast(qProbes), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "cos",
        VectorFunctions.cosinePre(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"))
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
