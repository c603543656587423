package graft

import graft.operators.{Pq, PqCodebooks, PqResidualCodebooks, Similarity}
import org.apache.spark.sql.functions._

/** Product-quantization codec: trainer mechanics on the tiny fixture,
  * then recall floors of the shipped codebooks on sf0.01 — ADC-only
  * ranking is weak on near-isotropic data (that is expected and
  * documented), the ADC-shortlist + exact-rerank two-stage is the
  * production contract.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5

  test("train: codebook shapes, deterministic sample init, codes land in range") {
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    val books = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, ksub = 8, iters = 2)
    assert(books.size == 8)
    assert(books.forall(_.size == 8))
    assert(books.forall(_.forall(_.length == 8)))
    val coded = Pq.withCodes(emb.select(col("vec_id"), col("embedding")), "embedding", books)
    val codes = coded.select(array((0 until 8).map(i => col(s"pq$i")): _*)).as[Seq[Int]].collect()
    assert(codes.nonEmpty && codes.flatten.forall(c => c >= 0 && c < 8))
    // unit normalization staged for rerank callers
    val norms = coded
      .select(sqrt(graft.functions.VectorFunctions.dotD(col("vn"), col("vn"))))
      .as[Double]
      .collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
    // an all-zero vector must not produce NaN codes (0/0): it stays the
    // zero vector and its argmax is the min-half-norm centroid — finite
    // and deterministic
    val zero = Seq((99L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val zcodes = Pq
      .withCodes(zero, "embedding", books)
      .select(array((0 until 8).map(i => col(s"pq$i")): _*))
      .as[Seq[Int]]
      .head()
    assert(zcodes.forall(c => c >= 0 && c < 8))
  }

  test("encode stage stays inside WholeStageCodegen (the r7 Janino-64KB regression guard)") {
    // the pre-r7 Column form (m x ksub slice+dot expressions, inlined
    // normalization lambda) blew the 64 KB generated-method limit: Spark
    // logged 'Failed to compile' and ran the stage interpreted. The
    // kernel-backed form must render as a codegen'd ('*(n)') Project.
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    val plan = Pq
      .withResidualCodes(
        emb.select(col("vec_id"), col("embedding")),
        "embedding",
        graft.operators.IvfCentroids.cells,
        PqResidualCodebooks.books
      )
      .queryExecution
      .executedPlan
      .toString
    val starredProject = """\*\(\d+\)\s*Project""".r
    assert(starredProject.findFirstIn(plan).isDefined, s"encode projection not codegen'd:\n${plan.take(2000)}")
  }

  test("shipped PqCodebooks: ADC shortlist + exact rerank hits the recall floor") {
    val emb     = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val corpus  = emb.select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding"))

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)]
        .collect()
        .groupBy(_._1)
        .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", K))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      per.sum / per.size
    }

    val reranked = recall(topSets(
      Pq.topK(corpus, queries, "vec_id", "embedding", K, PqCodebooks.books, shortlist = 50)
    ))
    // shortlist == k degenerates to pure-ADC candidate selection: the
    // rerank stage can only reorder the ADC top-k, so the SET equals
    // ADC's — this pins the raw codec quality floor
    val adcOnly = recall(topSets(
      Pq.topK(corpus, queries, "vec_id", "embedding", K, PqCodebooks.books, shortlist = K)
    ))
    info(f"PQ recall@5: adc-only=$adcOnly%.3f rerank50=$reranked%.3f")
    assert(reranked >= 0.84, f"PQ rerank recall regressed: $reranked%.3f (measured 0.92)")
    assert(adcOnly >= 0.30, f"raw ADC recall collapsed: $adcOnly%.3f (measured 0.40)")
    assert(reranked > adcOnly, "rerank must improve on raw ADC ordering")

    // composed IVF-PQ: cell pruning caps recall at the IVF ceiling
    // (0.84 at nProbe 4); PQ shortlist + rerank inside probed cells
    // should stay close to it
    val ivfpq = recall(topSets(
      graft.operators.Pq.ivfPqTopK(
        corpus, queries, "vec_id", "embedding", K,
        graft.operators.IvfCentroids.cells, PqCodebooks.books,
        nProbe = 4, shortlist = 50
      )
    ))
    info(f"IVF-PQ recall@5: $ivfpq%.3f")
    assert(ivfpq >= 0.72, f"IVF-PQ recall regressed: $ivfpq%.3f")
  }
}
