package graft.tools

import graft.Tables
import graft.operators.KMeans
import org.apache.spark.sql.SparkSession

/** Regenerates [[graft.operators.IvfCentroids]] — the checked-in trained
  * IVF coarse quantizer the ANN queries ship as constants.
  *
  * Usage: sbt "runMain graft.tools.TrainIvfMain [sfDir] [outFile]"
  * Defaults: /root/testdata/sf0.01 (the correctness-gate corpus) and
  * stdout. Training is [[KMeans.trainIvfCentroids]] with the constants
  * in [[graft.operators.IvfCentroids]].
  */
object TrainIvfMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.IvfCentroids.{Dim, Iters, K}
    val cents = KMeans.trainIvfCentroids(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      "vec_id",
      "embedding",
      k = K,
      dim = Dim,
      iters = Iters
    )

    val rows = cents
      .map(c => c.map(_.toString).mkString("    Array(", ", ", ")"))
      .mkString(",\n")
    val src =
      s"""package graft.operators
         |
         |/** TRAINED IVF coarse-quantizer centroids — generated artifact.
         |  *
         |  * Produced by `sbt "runMain graft.tools.TrainIvfMain"`:
         |  * [[KMeans.trainIvfCentroids]] over `$dir/embeddings.parquet`
         |  * (k = K cells, Iters Lloyd rounds, md5-ordered deterministic
         |  * init). Checked in as constants because that is how a
         |  * production IVF index consumes its quantizer — trained
         |  * offline on a sample, shipped to every query as literals —
         |  * and because the DuckDB correctness oracle must see the SAME
         |  * values the Spark plan uses. AnnRecallSpec retrains live and
         |  * pins the recall these centroids must deliver.
         |  */
         |object IvfCentroids {
         |  val K     = ${K}
         |  val Dim   = ${Dim}
         |  val Iters = ${Iters}
         |
         |  val cells: Seq[Array[Double]] = Seq(
         |$rows
         |  )
         |}
         |""".stripMargin

    args.lift(1) match {
      case Some(path) =>
        java.nio.file.Files.write(java.nio.file.Paths.get(path), src.getBytes("UTF-8"))
        println(s"wrote ${cents.size} centroids to $path")
      case None => println(src)
    }
    spark.stop()
  }
}
