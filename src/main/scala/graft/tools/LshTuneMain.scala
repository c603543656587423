package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline sweep of the lshTopK (tables, planes, depth) trade-off:
  * recall@5 vs the exact baseline and the probed-candidate count on
  * the sf0.01 embeddings — the measurement behind the production
  * config pinned in AnnRecallSpec. Usage: `runMain graft.tools.LshTuneMain`.
  */
object LshTuneMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val corpus  = emb.select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding"))
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
        .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))

    for {
      (tables, planes, depth) <- Seq(
        (8, 8, 1), (8, 9, 1), (8, 10, 1), (12, 9, 1), (12, 10, 1), (16, 10, 1), (16, 11, 1), (4, 7, 1),
        // depth-2 frontier: many more probes per table at far smaller
        // per-bucket populations — the <=10% probed-fraction candidates
        (3, 11, 2), (4, 12, 2), (5, 12, 2), (8, 13, 2), (12, 14, 2), (16, 14, 2)
      )
    } {
      val t0 = System.nanoTime()
      val approx = topSets(Similarity.lshTopK(
        corpus, queries, "vec_id", "embedding", 5,
        nPlanes = planes, dim = 64, probeDepth = depth, nTables = tables))
      val secs = (System.nanoTime() - t0) / 1e9
      val rec = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / exact.size
      val frac = tables.toDouble * Similarity.lshProbeMasks(planes, depth).size / (1 << planes)
      println(f"tables=$tables%2d planes=$planes%2d depth=$depth: recall@5=$rec%.3f probedFrac~$frac%.3f wall=$secs%.1fs")
    }
    spark.stop()
  }
}
