package graft.tools

import graft.{SparkEntry, Tables}
import graft.operators.{AnnIndex, KMeans, Pq, PqCodebooks, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Search-latency drift across MANY appends (round-13 verdict item 6).
  * [[AnnAppendMain]] pins the cost of ONE append + one post-append
  * search; the store's production claim is incremental at scale, where
  * dozens of appends race the auto-compaction threshold
  * ([[graft.operators.BucketedStores.AutoCompactMaxFilesPerBucket]]).
  * This main drives the steady state: build the store from 80% of the
  * corpus, then append the remaining 20% as `Appends` equal batches
  * under the DEFAULT compaction policy, recording
  *
  *   - per-append wall seconds (compaction cost rides inside the append
  *     that triggers it — the sawtooth is the policy working);
  *   - the store's data-file count after every append (rises one file
  *     per bucket per append, collapses to one per bucket at each
  *     triggered compaction);
  *   - search latency over the store every `SearchEvery` appends plus
  *     once right after the build — the drift claim under test: serving
  *     latency must stay flat across the append history because reads
  *     only ever see <= threshold files per bucket.
  *
  * The w1 control query brackets the run (house noise protocol);
  * quantizer training is untimed (offline by contract).
  */
object AnnAppendLoopMain {
  private val KnnK        = 5
  private val IvfPqProbe  = 8
  private val Shortlist   = 50
  private val Dim         = 64
  private val Iters       = 5
  private val Appends     = 25
  private val SearchEvery = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out   = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "tools/bench_ann_append_loop.json")
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

    // 80% base / 20% arriving in `Appends` equal batches
    val base  = emb.where(col("vec_id") % 5 =!= 0)
    def batch(i: Int) =
      emb.where(col("vec_id") % 5 === 0 && pmod(col("vec_id") / 5, lit(Appends.toLong)) === i)
    val table = "graft_ann_append_loop"
    val path  = java.nio.file.Files.createTempDirectory("graft_ann_loop").toString + "/store"
    spark.sql(s"DROP TABLE IF EXISTS $table")

    def dataFileCount(): Int = {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(loc).count(st => st.isFile && st.getPath.getName.startsWith("part-"))
    }
    def searchSec(): Double = {
      val (_, t) = timed {
        Pq.ivfPqTopKEncoded(
          AnnIndex.readStore(spark, table), "vec_id", fixedQ, "embedding",
          KnnK, cents, books, nProbe, math.max(Shortlist, KnnK * 10))
          .write.format("noop").mode("overwrite").save()
      }
      t
    }

    runControl(); runControl()
    val (_, buildSec) = timed {
      AnnIndex.writeStoreBucketed(
        Pq.ivfPqEncode(base, "vec_id", "embedding", cents, books), table, path, nBuckets = par)
    }
    val appendSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val fileCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val searches   = scala.collection.mutable.LinkedHashMap[Int, Double](0 -> searchSec())
    for (i <- 1 to Appends) {
      val (_, t) = timed {
        AnnIndex.appendToStoreBucketed(
          Pq.ivfPqEncode(batch(i - 1), "vec_id", "embedding", cents, books),
          table, expectedBuckets = par)
      }
      appendSecs += t
      fileCounts += dataFileCount()
      if (i % SearchEvery == 0) searches(i) = searchSec()
    }
    val storedN = AnnIndex.readStore(spark, table).count()
    runControl(); runControl()
    spark.sql(s"DROP TABLE IF EXISTS $table")

    def fmt(v: Double): String = (math.round(v * 10000) / 10000.0).toString
    val sorted = controlTs.sorted
    val control =
      s"""{"query":"w1_window_dedup_latest","n":${sorted.size},"min":${fmt(sorted.head)},""" +
        s""""median":${fmt(sorted(sorted.size / 2))},"control_ratio":${fmt(sorted(sorted.size / 2) / sorted.head)}}"""
    val line =
      s"""{"metric":"ann_append_loop","n":$n,"stored_n":$storedN,"cells":$cSqrt,""" +
        s""""nprobe":$nProbe,"buckets":$par,"appends":$Appends,""" +
        s""""store_build_sec":${fmt(buildSec)},""" +
        s""""append_sec":[${appendSecs.map(fmt).mkString(",")}],""" +
        s""""data_files_after_append":[${fileCounts.mkString(",")}],""" +
        s""""search_sec_at_append":{${searches.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString(",")}},""" +
        s""""control":$control,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(out), (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[ann-append-loop] result file write failed: $e") }
    spark.stop()
    println(line)
  }
}
