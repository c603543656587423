package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale-factor fixture from an existing one by
  * replicating fact tables N times with consistent key remapping.
  *
  * Scale-stability harness only (VERDICT r5 item 5): the driver's real
  * fixtures stop at sf0.1; this builds an sf1-shaped dataset so the full
  * Verify + oracle gate and the bench can run at 10x rows. Shapes follow
  * TPC-H scaling: region/nation stay fixed, everything else multiplies.
  *
  * Remapping contract (what keeps the data non-degenerate at 10x):
  *   - every scaled table's key gets `copy * (max_key + 1)` added, and
  *     foreign keys get the SAME offset as their parent, so join fan-outs
  *     per key are IDENTICAL to the source sf — the scale-up grows the
  *     number of keys, not the per-key row counts (matching how TPC-H
  *     itself scales);
  *   - `documents.text` gets a short per-copy suffix so cross-copy pairs
  *     are near-dups, not byte-identical (exercises MinHash/SimHash at
  *     realistic, non-tied hash distributions);
  *   - `embeddings.embedding` copies get FULL-DIMENSION deterministic
  *     jitter calibrated to the base corpus's own neighbor scale
  *     (round-12, replacing round-9's dim-0 epsilon). The epsilon made
  *     every copy a byte-near-identical twin of its base vector, which
  *     destroyed cross-base-id neighbor structure by construction:
  *     each base's entire copy family was mutually tied at ~0 distance,
  *     so raw recall@k read 1.0 for ANY config and the nodup metric
  *     degraded toward probed-cell-fraction — the sqrt-probe recall
  *     floor failure at sf1 was a fixture artifact, not an index
  *     property (round-11 verdict item 2). Jitter instead draws each
  *     copy as a NEW sample at half the base corpus's median ANGULAR
  *     5-NN gap from its source vector (normalized-space calibration
  *     scaled by each vector's own norm — round-13; cosine is the
  *     geometry the recall floors measure, and a fixed absolute L2
  *     radius was a much larger angular move for low-norm vectors):
  *     far enough that distances to neighbors genuinely reshuffle
  *     (ties break in all 64 dims), near enough that the copy stays
  *     inside its source's cluster (half the angular gap to the nearest
  *     neighbor), so coarse-quantizer geometry —
  *     and with it every IVF/PQ recall claim — carries over from the
  *     base corpus. Noise is hash-derived per (vec_id, dim), so the
  *     fixture stays bit-reproducible across sessions.
  *
  * Usage: MakeScaleMain <srcSfDir> <outDir> <factor>
  */
object MakeScaleMain {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, out, factor)
    spark.stop()
  }

  def scale(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    new java.io.File(out).mkdirs()
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    // single-FILE parquet per table, exactly the driver fixture shape
    // (check.py and the oracle glob a file path, not a directory) — but
    // with SMALL ROW GROUPS (8 MB blocks): a coalesce(1) default write
    // produced one row group per table, and Spark can split a parquet
    // file only at row-group boundaries, so every scan-side stage of the
    // r7 sf1 bench ran on ONE task (map-only queries measured serial
    // time, not engine scaling — f7_timestamp_formats read 73x instead
    // of ~10x). ~10+ row groups restores scan parallelism while keeping
    // the one-file oracle contract.
    def write(df: DataFrame, t: String): Unit = {
      val tmp = s"$out/_tmp_$t"
      // 512 KB: the writer's row-group size check runs against the
      // BUFFERED (dictionary-encoded) estimate, which for small-int
      // tables stays far below the written size — 8 MB still produced
      // single-group files for events/documents
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 512L * 1024)
        .parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for $t"))
      val dest = new java.io.File(s"$out/$t.parquet")
      if (dest.exists()) dest.delete()
      java.nio.file.Files.move(part.toPath, dest.toPath)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
    }

    // fixed dims: copy through untouched
    Seq("region", "nation").foreach(t => write(read(t), t))

    // one offset per scaled key domain, derived from the source data so
    // remapped keys never collide with originals
    def off(t: String, c: String): Long =
      read(t).agg(max(col(c))).head.getLong(0) + 1L

    val custOff = off("customer", "c_custkey")
    val suppOff = off("supplier", "s_suppkey")
    val partOff = off("part", "p_partkey")
    val ordOff = off("orders", "o_orderkey")
    val evOff = off("events", "event_id")
    val userOff = off("events", "user_id")
    val docOff = off("documents", "doc_id")
    val vecOff = off("embeddings", "vec_id")

    // cross-join each fact with the copy index; keys shift by copy*offset
    def copies(df: DataFrame): DataFrame =
      df.crossJoin(
        spark.range(factor.toLong).select(col("id").as("__copy")))

    def shift(c: String, o: Long) = col(c) + col("__copy") * lit(o)

    write(
      copies(read("customer"))
        .withColumn("c_custkey", shift("c_custkey", custOff))
        .drop("__copy"),
      "customer")
    write(
      copies(read("supplier"))
        .withColumn("s_suppkey", shift("s_suppkey", suppOff))
        .drop("__copy"),
      "supplier")
    write(
      copies(read("part"))
        .withColumn("p_partkey", shift("p_partkey", partOff))
        .drop("__copy"),
      "part")
    write(
      copies(read("orders"))
        .withColumn("o_orderkey", shift("o_orderkey", ordOff))
        .withColumn("o_custkey", shift("o_custkey", custOff))
        .drop("__copy"),
      "orders")
    write(
      copies(read("lineitem"))
        .withColumn("l_orderkey", shift("l_orderkey", ordOff))
        .withColumn("l_partkey", shift("l_partkey", partOff))
        .withColumn("l_suppkey", shift("l_suppkey", suppOff))
        .drop("__copy"),
      "lineitem")
    write(
      copies(read("events"))
        .withColumn("event_id", shift("event_id", evOff))
        .withColumn("user_id", shift("user_id", userOff))
        .drop("__copy"),
      "events")
    // near-dup (not identical) text across copies: suffix breaks exact
    // hash ties while keeping >0.9 Jaccard to the source doc
    write(
      copies(read("documents"))
        .withColumn("doc_id", shift("doc_id", docOff))
        .withColumn(
          "text",
          when(col("__copy") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" rev"), col("__copy"))))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .drop("__copy"),
      "documents")
    // full-dimension jitter at half the base corpus's median ANGULAR
    // 5-NN gap (see scaladoc): copies become genuine new cluster
    // samples instead of byte-near twins, so neighbor structure — and
    // the ANN recall floors measured on the scaled fixture — stay
    // informative. The half-width is RELATIVE (calibrated on normalized
    // vectors, round-13) and scaled by each vector's own norm, so the
    // angular perturbation is uniform across the corpus's norm spread —
    // an absolute L2 half-width was a proportionally much larger
    // angular move for below-median-norm vectors, which could eject
    // those copies from their source's cosine neighborhood while the
    // recall floors measure cosine. Copy 0 is bit-identical to the
    // base corpus.
    val h = jitterHalfWidth(spark, read("embeddings"))
    System.err.println(f"[make-scale] embedding jitter relative half-width per dim: $h%.6f")
    locally {
      import graft.functions.VectorFunctions.dotHof
      write(
        copies(read("embeddings"))
          .withColumn("vec_id", shift("vec_id", vecOff))
          // the vector's own norm, STAGED in its column (never spliced
          // into the lambda body — it would re-evaluate per element)
          .withColumn("__vn", sqrt(dotHof(col("embedding"), col("embedding"))))
          .withColumn(
            "embedding",
            when(col("__copy") === 0, col("embedding")).otherwise(
              // hash-derived uniform noise in [-h·‖v‖, h·‖v‖] per
              // (vec_id, dim): vec_id is already copy-shifted, so every
              // copy of every base vector draws its own independent
              // stream; xxhash64 is cheap per element and deterministic
              // across sessions
              transform(
                col("embedding"),
                (x, i) =>
                  (x + (pmod(xxhash64(col("vec_id"), i), lit(2000001L)) / lit(1000000.0) - lit(1.0))
                    * lit(h) * col("__vn")).cast("float"))))
          .drop("__copy", "__vn"),
        "embeddings")
    }
  }

  /** RELATIVE per-dimension half-width of the uniform jitter: targets
    * an ANGULAR perturbation of half the base corpus's median
    * NORMALIZED-space distance to the 5th nearest neighbor — the
    * geometry the ANN families and recall floors actually measure is
    * cosine, so the gap is computed on unit-normalized vectors
    * (round-13; the raw-L2 calibration was a proportionally much larger
    * angular move for low-norm vectors). Uniform[-h·‖v‖, h·‖v‖] per dim
    * has variance (h·‖v‖)²/3, so E‖noise‖²/‖v‖² = dim·h²/3 = (nn5/2)²
    * → h = (nn5/2)·sqrt(3/dim), with nn5 the normalized-space gap —
    * every vector's copies land at the same relative (angular) radius
    * regardless of its norm. Estimated from a ~100-query exact scan of
    * the base corpus — driver-cheap at fixture scale, and
    * deterministic.
    */
  def jitterHalfWidth(spark: SparkSession, emb: DataFrame): Double = {
    import graft.functions.VectorFunctions.dotHof
    import org.apache.spark.sql.expressions.Window
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val n   = emb.count()
    val step = math.max(1L, n / 100L)
    // unit-normalize once, staged (never inside a per-element lambda)
    def unit(e: org.apache.spark.sql.Column, vn: org.apache.spark.sql.Column) =
      transform(e, x => x / vn)
    val base = emb
      .withColumn("__vn", sqrt(dotHof(col("embedding"), col("embedding"))))
      .where(col("__vn") > 0)
      .select(col("vec_id"), unit(col("embedding"), col("__vn")).as("ue"))
    val q = base.where(col("vec_id") % step === 0)
      .select(col("vec_id").as("qid"), col("ue").as("qe"))
    val c = base.select(col("vec_id").as("cid"), col("ue").as("ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("d2").asc)
    val nn5d2 = q.crossJoin(c)
      .where(col("qid") =!= col("cid"))
      .select(
        col("qid"),
        (dotHof(col("qe"), col("qe")) + dotHof(col("ce"), col("ce"))
          - lit(2.0) * dotHof(col("qe"), col("ce"))).as("d2"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 5)
      .select(col("d2"))
      .as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .collect()
      .sorted
    require(nn5d2.nonEmpty, "jitter calibration found no neighbors — empty embeddings table?")
    val nn5 = math.sqrt(math.max(0.0, nn5d2(nn5d2.length / 2)))
    (nn5 / 2.0) * math.sqrt(3.0 / dim)
  }
}
