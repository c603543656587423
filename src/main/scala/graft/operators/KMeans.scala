package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spherical k-means — the coarse-quantizer trainer for
  * [[Similarity.ivfTopK]].
  *
  * Production shape for 100 TB: train on a SAMPLE (a few hundred
  * thousand vectors is ample for k<=4096 cells), ship the k x dim
  * centroids as constants to the query side — exactly how the engine's
  * IVF queries consume them ([[IvfCentroids]] is one such trained,
  * checked-in artifact). The trainer itself is all DataFrames:
  *
  *   - INIT: the k vectors with the smallest md5(id) — a uniform,
  *     engine-reproducible pseudo-random sample (no RNG state), each
  *     normalized to unit length;
  *   - ASSIGN (per Lloyd round): argmax dot product against the current
  *     centroids — the SAME staged-array + array_position formulation as
  *     ivfTopK's cell assignment, a narrow map stage with k compiled
  *     dot products per row and no shuffle;
  *   - UPDATE: groupBy(cell) with one sum per dimension — map-side
  *     partial aggregation makes the shuffle k x dim doubles per
  *     partition, independent of corpus size; the new centroid is the
  *     NORMALIZED per-cell sum (same direction as the mean, one fewer
  *     division), empty cells keep their centroid.
  *
  * Only k x (dim + 1) aggregated values ever reach the driver per round
  * — never rows. Iteration count is FIXED (no convergence probe): the
  * caller picks a small `iters` (3-8 moves recall most of the way; see
  * AnnRecallSpec's trained-centroid floor) and the cost is exactly
  * `iters` linear scans.
  *
  * Float sums commute only approximately: merge order of partial
  * aggregates can perturb low-order bits run-to-run, so two training
  * runs may differ at assignment boundaries. That is fine for a coarse
  * quantizer (recall, not identity, is the contract); anything needing
  * bit-stable results ships the TRAINED constants, as the IVF query
  * does.
  */
object KMeans {

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Train `k` unit-length centroids over `corpus.vecCol` with `iters`
    * Lloyd rounds. Deterministic given a fixed merge order; see scaladoc.
    */
  def trainIvfCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      iters: Int
  ): Seq[Array[Double]] = {
    require(k >= 1 && iters >= 0 && dim >= 1, s"bad k=$k/iters=$iters/dim=$dim")
    val v = corpus.select(
      col(idCol).as("id"),
      VectorFunctions.toDouble(col(vecCol)).as("v")
    )

    var centroids: IndexedSeq[Array[Double]] = v
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(k)
      .select(col("v"))
      .collect()
      .map(r => normalize(r.getSeq[Double](0).toArray))
      .toIndexedSeq
    require(centroids.size == k, s"corpus has fewer than k=$k vectors")

    val sumCols = (0 until dim).map(i => sum(element_at(col("v"), i + 1)).as(s"s$i"))
    for (_ <- 1 to iters) {
      // ONE kernel call for all k centroid dots: the k-wide literal
      // projection form drops to interpreted evaluation past Janino's
      // method limit once k ~ sqrt(N) (see CellDots scaladoc) — at k=80
      // it made each Lloyd pass ~15 s on a 20k-row corpus
      val dots = VectorFunctions.cellDots(col("v"), centroids)
      val assigned = v
        .withColumn("__cd", dots)
        .select(
          col("v"),
          (array_position(col("__cd"), array_max(col("__cd"))) - 1).cast("int").as("cell")
        )
      val rows = assigned
        .groupBy(col("cell"))
        .agg(sumCols.head, sumCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> Array.tabulate(dim)(i => r.getDouble(i + 1)))
        .toMap
      centroids = (0 until k).map(c => rows.get(c).map(normalize).getOrElse(centroids(c)))
    }
    centroids
  }
}
