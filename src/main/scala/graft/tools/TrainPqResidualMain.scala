package graft.tools

import graft.Tables
import graft.operators.{IvfCentroids, Pq}
import org.apache.spark.sql.SparkSession

/** Regenerates [[graft.operators.PqResidualCodebooks]] — the checked-in
  * RESIDUAL product-quantization codebooks ([[Pq.trainResidual]] against
  * the shipped [[IvfCentroids]]). Regenerate AFTER IvfCentroids changes:
  * residual codebooks are trained against a specific coarse quantizer.
  *
  * Usage: sbt "runMain graft.tools.TrainPqResidualMain [sfDir] [outFile]"
  */
object TrainPqResidualMain {
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

    import graft.operators.PqCodebooks.{Dim, Iters, Ksub, M}
    val books = Pq.trainResidual(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      "vec_id",
      "embedding",
      dim = Dim,
      m = M,
      ksub = Ksub,
      iters = Iters,
      centroids = IvfCentroids.cells
    )

    val rows = books.zipWithIndex
      .map { case (book, mi) =>
        val cents = book
          .map(c => c.map(_.toString).mkString("      Array(", ", ", ")"))
          .mkString(",\n")
        s"    /* subspace $mi */ Seq(\n$cents\n    )"
      }
      .mkString(",\n")
    val src =
      s"""package graft.operators
         |
         |/** TRAINED residual product-quantization codebooks — generated
         |  * artifact ([[Pq.trainResidual]] over `$dir/embeddings.parquet`
         |  * against the shipped [[IvfCentroids]] coarse quantizer).
         |  * Produced by `sbt "runMain graft.tools.TrainPqResidualMain"`.
         |  * Checked in for the same reason as [[PqCodebooks]]: production
         |  * trains offline and ships the codec, and the DuckDB oracle must
         |  * see the exact values. AnnRecallSpec retrains live and pins the
         |  * shipped-artifact recall floor.
         |  */
         |object PqResidualCodebooks {
         |  val Dim   = ${Dim}
         |  val M     = ${M}
         |  val Ksub  = ${Ksub}
         |  val Iters = ${Iters}
         |
         |  val books: Seq[Seq[Array[Double]]] = Seq(
         |$rows
         |  )
         |}
         |""".stripMargin

    args.lift(1) match {
      case Some(path) =>
        java.nio.file.Files.write(java.nio.file.Paths.get(path), src.getBytes("UTF-8"))
        println(s"wrote ${books.size} residual codebooks to $path")
      case None => println(src)
    }
    spark.stop()
  }
}
