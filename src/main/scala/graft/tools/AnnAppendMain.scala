package graft.tools

import graft.{SparkEntry, Tables}
import graft.operators.{AnnIndex, KMeans, Pq, PqCodebooks, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The amortized ANN ingest path, measured at scale (round-13 verdict
  * item 5). PLANS explains the `ann_knn_ivfpq_sqrtc` end-to-end wall
  * (256 s at the 100x fixture) as the O(N·C) IN-QUERY corpus encode
  * that the bucketed index store ([[graft.operators.AnnIndex]])
  * amortizes to O(|batch|·C) per arriving batch — but the amortized
  * path had no measurement at the scale where the in-query number
  * looks alarming. This main takes, on the same fixture and at the
  * same corpus-scaled cell count as AnnSqrtCMain:
  *
  *   - `store_build_sec`: one-time encode + bucketed write of the base
  *     corpus (99%) — paid once, amortized over the store's lifetime;
  *   - `append_sec`: encode + [[AnnIndex.appendToStoreBucketed]] of a
  *     1% batch — the RECURRING production cost;
  *   - `search_sec`: [[Pq.ivfPqTopKEncoded]] over the appended store at
  *     the sqrt-scaled probe on the fixed query set — per-query serving,
  *     which never re-encodes the corpus;
  *   - `knn_inquery_sec`: the ivfPqTopK end-to-end on the SAME run —
  *     the in-artifact baseline the amortization claim is against.
  *
  * The w1 control query brackets the run (the house noise protocol);
  * quantizer training is untimed (offline by contract, same as
  * AnnSqrtCMain).
  */
object AnnAppendMain {
  private val KnnK       = 5
  private val IvfPqProbe = 8
  private val Shortlist  = 50
  private val Dim        = 64
  private val Iters      = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out   = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "tools/bench_ann_append.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism

    def emb    = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    def corpus = emb.repartition(par)
    def fixedQ = emb.where(col("vec_id") % 100 === 0 && col("vec_id") < 2000L)

    val n      = emb.count()
    val cSqrt  = AnnSqrtCMain.sqrtCells(n)
    val nProbe = Similarity.sqrtScaledProbe(IvfPqProbe, 16, cSqrt)

    val controlTs = scala.collection.mutable.ArrayBuffer.empty[Double]
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def runControl(): Unit = {
      val (_, t) = timed {
        SparkEntry.queries("w1_window_dedup_latest")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      controlTs += t
    }

    // offline (untimed): corpus-scaled quantizer, trained once
    val cents = KMeans.trainIvfCentroids(emb, "vec_id", "embedding", k = cSqrt, dim = Dim, iters = Iters)
    val books = PqCodebooks.books

    // 99% base corpus / 1% arriving batch — the daily-ingest shape
    val base  = emb.where(col("vec_id") % 100 =!= 1)
    val batch = emb.where(col("vec_id") % 100 === 1)
    val batchN = batch.count()
    val table  = "graft_ann_append_scale"
    val path   = java.nio.file.Files.createTempDirectory("graft_ann_append").toString + "/store"
    spark.sql(s"DROP TABLE IF EXISTS $table")

    runControl(); runControl()
    val (_, buildSec) = timed {
      AnnIndex.writeStoreBucketed(
        Pq.ivfPqEncode(base, "vec_id", "embedding", cents, books), table, path, nBuckets = par)
    }
    val (_, appendSec) = timed {
      AnnIndex.appendToStoreBucketed(
        Pq.ivfPqEncode(batch, "vec_id", "embedding", cents, books), table, expectedBuckets = par)
    }
    val (searchRows, searchSec) = timed {
      val r = Pq.ivfPqTopKEncoded(
        AnnIndex.readStore(spark, table), "vec_id", fixedQ, "embedding",
        KnnK, cents, books, nProbe, math.max(Shortlist, KnnK * 10))
      val c = r.count()
      r.write.format("noop").mode("overwrite").save()
      c
    }
    // stored rows must cover the whole corpus (append really landed)
    val storedN = AnnIndex.readStore(spark, table).count()
    val (_, inQuerySec) = timed {
      Pq.ivfPqTopK(corpus, fixedQ, "vec_id", "embedding", KnnK, cents, books, nProbe, Shortlist)
        .write.format("noop").mode("overwrite").save()
    }
    runControl(); runControl()
    spark.sql(s"DROP TABLE IF EXISTS $table")

    def fmt(v: Double): String = (math.round(v * 10000) / 10000.0).toString
    val sorted = controlTs.sorted
    val control =
      s"""{"query":"w1_window_dedup_latest","n":${sorted.size},"min":${fmt(sorted.head)},""" +
        s""""median":${fmt(sorted(sorted.size / 2))},"control_ratio":${fmt(sorted(sorted.size / 2) / sorted.head)}}"""
    val line =
      s"""{"metric":"ann_append_amortized","n":$n,"batch_n":$batchN,"stored_n":$storedN,""" +
        s""""cells":$cSqrt,"nprobe":$nProbe,"store_build_sec":${fmt(buildSec)},""" +
        s""""append_sec":${fmt(appendSec)},"search_sec":${fmt(searchSec)},""" +
        s""""search_rows":$searchRows,"knn_inquery_sec":${fmt(inQuerySec)},""" +
        s""""control":$control,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(out), (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[ann-append] result file write failed: $e") }
    spark.stop()
    println(line)
  }
}
