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

  /** LSH-bucketed ANN top-k: candidates limited to matching buckets
    * (multi-probe distance-1 on the query side to recover near-boundary
    * neighbors). Same output shape as bruteForceTopK.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int,
      dim: Int
  ): DataFrame = {
    val planes = VectorFunctions.randomPlanes(nPlanes, dim)
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      VectorFunctions.toDouble(col(vecCol)).as("c_vec"),
      VectorFunctions.norm2(col(vecCol)).as("c_norm"),
      VectorFunctions.lshBucket(col(vecCol), planes).as("bucket")
    )
    val qBase = queries.select(
      col(idCol).as("query_id"),
      VectorFunctions.toDouble(col(vecCol)).as("q_vec"),
      VectorFunctions.norm2(col(vecCol)).as("q_norm"),
      VectorFunctions.lshBucket(col(vecCol), planes).as("bucket0")
    )
    // multi-probe: own bucket + all buckets at Hamming distance 1
    val probes = array((0 to nPlanes).map {
      case 0 => col("bucket0")
      case i => col("bucket0").bitwiseXOR(lit(1 << (i - 1)))
    }: _*)
    val q = qBase.select(col("query_id"), col("q_vec"), col("q_norm"), explode(probes).as("bucket"))
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn(
        "cos",
        VectorFunctions.cosinePre(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"))
      )
      // a (query, neighbor) pair can collide via several probes
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
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
  ): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.size, "nProbe must be in [1, centroids.size]")
    def cellDots(v: Column): Column =
      array(centroids.map(c => VectorFunctions.planeDot(v, c)): _*)

    // assignment: stage the dots array once per row, then argmax —
    // array_position takes the FIRST max, giving a deterministic
    // lowest-index tiebreak the oracle mirrors with (dot DESC, cell ASC)
    val c = corpus
      .withColumn("__cd", cellDots(col(vecCol)))
      .select(
        col(idCol).as("neighbor_id"),
        VectorFunctions.toDouble(col(vecCol)).as("c_vec"),
        VectorFunctions.norm2(col(vecCol)).as("c_norm"),
        (array_position(col("__cd"), array_max(col("__cd"))) - 1).cast("int").as("cell")
      )

    val qw = Window.partitionBy(col("query_id")).orderBy(col("celldot").desc, col("cell").asc)
    val qProbes = queries
      .withColumn("__cd", cellDots(col(vecCol)))
      .select(
        col(idCol).as("query_id"),
        VectorFunctions.toDouble(col(vecCol)).as("q_vec"),
        VectorFunctions.norm2(col(vecCol)).as("q_norm"),
        posexplode(col("__cd")).as(Seq("cell", "celldot"))
      )
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
