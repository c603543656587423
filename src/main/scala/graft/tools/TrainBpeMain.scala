package graft.tools

import graft.Tables
import graft.operators.Bpe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Regenerates [[graft.operators.BpeMerges]] — the checked-in BPE merge
  * rules learned from the documents corpus by [[Bpe.train]].
  *
  * Usage: sbt "runMain graft.tools.TrainBpeMain [sfDir] [outFile]"
  */
object TrainBpeMain {
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

    val nMerges = 24
    val merges = Bpe.train(Tables.documents(spark, dir), col("text"), nMerges)

    // learned symbols are corpus-derived: escape Scala-literal
    // metacharacters or a quoted/backslashed corpus word breaks the
    // generated source exactly where escaping matters
    def q(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c    => c.toString
      } + "\""
    val rows = merges
      .map { case (x, y) => s"    (${q(x)}, ${q(y)})" }
      .mkString(",\n")
    val src =
      s"""package graft.operators
         |
         |/** LEARNED BPE merge rules — generated artifact ([[Bpe.train]]
         |  * over `$dir/documents.parquet`, $nMerges weighted merges,
         |  * deterministic count-desc/lexicographic tiebreak). Produced by
         |  * `sbt "runMain graft.tools.TrainBpeMain"`. Checked in for the
         |  * same reason as [[PqCodebooks]]: production trains the
         |  * tokenizer offline and ships it, and the DuckDB oracle must
         |  * see the exact rules. BpeSpec retrains live and pins equality.
         |  */
         |object BpeMerges {
         |  val NMerges = $nMerges
         |
         |  val merges: Seq[(String, String)] = Seq(
         |$rows
         |  )
         |}
         |""".stripMargin

    args.lift(1) match {
      case Some(path) =>
        java.nio.file.Files.write(java.nio.file.Paths.get(path), src.getBytes("UTF-8"))
        println(s"wrote ${merges.size} merges to $path")
      case None => println(src)
    }
    spark.stop()
  }
}
