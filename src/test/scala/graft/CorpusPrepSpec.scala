package graft

import graft.functions.TextFunctions
import graft.operators.CorpusPrep
import org.apache.spark.sql.functions._

/** Invariants of the composed training-data prep chain (each stage is
  * oracle-checked individually; these pin the COMPOSITION).
  */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private val Start = Seq("scan", "tab", "the") ++ "abcdefghijklmnoprstuvwy".map(_.toString)
  private val Cont  = Seq("le", "ue") ++ "abcdefghijklmnopqrstuvwy".map(_.toString)

  private def run() = {
    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    CorpusPrep.prepare(
      docs = all.where(col("doc_id") % 10 =!= 0),
      idCol = "doc_id", textCol = "text", langCol = "lang",
      refDocs = all.where(col("doc_id") % 10 === 0), refTextCol = "text",
      minQuality = 40, contamN = 3, contamThreshMil = 500,
      splitSalt = "spec-v1", trainPermille = 900,
      nShards = 4, shuffleSalt = "spec-v1",
      startVocab = Start, contVocab = Cont, packBudget = 512
    )
  }

  test("manifest rows satisfy every gate's invariant") {
    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = run().cache()
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length < all.where(col("doc_id") % 10 =!= 0).count())

    // survivors come from the corpus side only, pass the quality floor,
    // and sit in the train split
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.forall(_ % 10 != 0))
    assert(out.where(col("quality") < 40).count() == 0)
    val splitOk = out
      .withColumn("b", TextFunctions.splitBucket(col("doc_id"), 1000, "spec-v1"))
      .where(col("b") >= 900).count()
    assert(splitOk == 0)

    // exact dedup held: no two survivors share a content fingerprint
    val fps = all.where(col("doc_id").isin(ids.toSeq: _*))
      .select(TextFunctions.docFingerprint(col("text"))).as[String].collect()
    assert(fps.length == fps.distinct.length, "duplicate fingerprints survived")

    // shuffle positions are 1..k per shard; packing offsets are a
    // consistent running sum per language stream in doc_id order
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("pos_in_shard")).sorted.toSeq == (1L to rs.length).toSeq)
    }
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("doc_id"))
      var run = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("start_tok") == run, "packing offset broke the running sum")
        assert(r.getAs[Long]("seq_no") == run / 512)
        run += r.getAs[Int]("n_subtok")
      }
    }
    out.unpersist()
    ()
  }

  test("the chain is deterministic across reruns") {
    val a = run().collect().map(_.toString).sorted.toSeq
    val b = run().collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
