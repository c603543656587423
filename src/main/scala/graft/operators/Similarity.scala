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
}
