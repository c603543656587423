package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column (SemDeDup,
  * Abbas et al. 2023, arXiv:2303.09540): cluster the corpus with a
  * trained coarse quantizer, then inside each cluster drop every vector
  * that is within `threshold` cosine of a surviving lower-id vector.
  *
  * Relationship to the rest of the dedup family: MinHash/SimHash find
  * LEXICAL near-dups; this finds SEMANTIC ones (paraphrases, translations
  * re-encoded by the embedding model) that share no shingles. Same
  * bucket-then-verify scale shape as
  * [[ApproxDedup.cosineNearDupPairs]] — candidates are only generated
  * inside a cluster, never across the corpus.
  *
  * Representative election is "lowest id in the duplicate
  * neighborhood": a vector is pruned iff SOME lower-id vector in its
  * cell is >= threshold close. This is the greedy one-pass rule, not
  * connected components — two vectors both within threshold of a shared
  * lower-id anchor but not of each other are BOTH pruned (exactly the
  * paper's epsilon-ball sweep with id as the scan order, which makes the
  * result deterministic and oracle-expressible as one EXISTS).
  *
  * Scale notes (100 TB): the per-cell pair expansion is quadratic in
  * CELL width, not corpus size — the quantizer's K grows with the corpus
  * (SemDeDup uses 50k clusters for LAION) so cells stay bounded; the
  * `maxCell` cap (deterministic lowest-id truncation, same policy as the
  * LSH buckets) is the backstop against a degenerate quantizer, and the
  * single shuffle is the cell groupBy. The pruned-id set joins back
  * LEFT — at real dup rates it is a small fraction of the corpus and
  * AQE broadcasts it.
  */
object SemDedup {

  /** Returns (id, cell, pruned) for every corpus row.
    *
    * @param cells     trained coarse-quantizer centroids (e.g.
    *                  [[IvfCentroids.cells]]); assignment is argmax dot,
    *                  first-max tiebreak — identical to `ivfTopK`'s.
    * @param threshold cosine at/above which a pair is a semantic dup
    * @param maxCell   per-cell candidate cap (lowest ids kept)
    */
  def prune(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cells: Seq[Array[Double]],
      threshold: Double,
      maxCell: Int = ApproxDedup.DefaultMaxBucket
  ): DataFrame = {
    // argmax-dot cell assignment is a pure map stage; double vector +
    // norm are computed once per row and ride the groupBy as a struct,
    // so the in-cell verify is one dot and a divide per pair
    val assigned = emb.select(
      col(idCol).as("id"),
      struct(
        VectorFunctions.toDouble(col(vecCol)).as("v"),
        VectorFunctions.norm2(col(vecCol)).as("n")
      ).as("vn"),
      (array_position(
        array(cells.map(c => VectorFunctions.planeDot(col(vecCol), c)): _*),
        array_max(
          array(cells.map(c => VectorFunctions.planeDot(col(vecCol), c)): _*))
      ) - 1).cast("int").as("cell")
    )
    // one shuffle (cell), then the fused native expansion+verify kernel
    // emits only >=threshold pairs with id_a < id_b (array_sort puts the
    // struct list in id order; the kernel walks i < j)
    val pruned = assigned
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("id"), col("vn")))).as("xs"))
      .where(size(col("xs")) > 1)
      .select(
        explode(
          call_function("graft_cosine_pairs", col("xs"), lit(threshold), lit(maxCell))
        ).as("p")
      )
      .select(col("p.id_b").as("__pruned_id"))
      .distinct()
    assigned
      .join(pruned, assigned("id") === pruned("__pruned_id"), "left")
      .select(
        col("id"),
        col("cell"),
        col("__pruned_id").isNotNull.as("pruned")
      )
  }
}
