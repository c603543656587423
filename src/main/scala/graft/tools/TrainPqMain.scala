package graft.tools

import graft.Tables
import graft.operators.Pq
import org.apache.spark.sql.SparkSession

/** Regenerates [[graft.operators.PqCodebooks]] — the checked-in trained
  * product-quantization codebooks the PQ queries ship as constants.
  *
  * Usage: sbt "runMain graft.tools.TrainPqMain [sfDir] [outFile]"
  */
object TrainPqMain {
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
    val books = Pq.train(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      "vec_id",
      "embedding",
      dim = Dim,
      m = M,
      ksub = Ksub,
      iters = Iters
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
         |/** TRAINED product-quantization codebooks — generated artifact.
         |  *
         |  * Produced by `sbt "runMain graft.tools.TrainPqMain"`:
         |  * [[Pq.train]] over `$dir/embeddings.parquet` (M subspaces x
         |  * Ksub centroids, md5-ordered deterministic init, unit-normalized
         |  * vectors). Checked in as constants for the same reason as
         |  * [[IvfCentroids]]: production trains offline and ships the
         |  * codec, and the DuckDB oracle must see the exact values. PqSpec
         |  * retrains live on the tiny fixture and pins shipped-codebook
         |  * recall.
         |  */
         |object PqCodebooks {
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
        println(s"wrote ${books.size} codebooks to $path")
      case None => println(src)
    }
    spark.stop()
  }
}
