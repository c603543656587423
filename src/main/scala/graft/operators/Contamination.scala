package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: for every corpus document, how many
  * of its distinct word n-grams also occur in a REFERENCE set (eval
  * benchmarks, held-out test sets) — the standard pre-training hygiene
  * check that a training corpus does not contain the data it will be
  * evaluated on.
  *
  * 100 TB shape: the reference side is small (benchmarks are MBs, the
  * corpus is the 100 TB side), so its distinct shingle hashes are
  * BROADCAST and the corpus is processed in ONE pass — per-doc shingle
  * hashes from the native [[graft.functions.NgramHashes]] kernel (no
  * shingle strings), exploded, matched map-side against the broadcast
  * hash set, then one partial-aggregated groupBy(doc) shuffle whose
  * volume is |docs|, not |shingles|. The corpus never joins itself and
  * never shuffles its text.
  *
  * The contamination flag is computed in LONG integer arithmetic
  * (n_overlap * 1000 >= threshMil * n_shingles, all operands widened to
  * BIGINT) so the decision is bit-identical on any engine — no
  * double-division portability risk and no 32-bit wrap for documents
  * with >2M distinct shingles.
  */
object Contamination {
  /** Per-doc overlap counts + contamination flag.
    *
    * Output: (id, n_shingles, n_overlap, contaminated) where
    * `contaminated` = 1 iff n_overlap/n_shingles >= threshMil/1000.
    * Docs with fewer than `n` tokens are excluded (no shingles).
    */
  def ngramOverlap(
      docs: DataFrame,
      idCol: String,
      text: Column,
      refDocs: DataFrame,
      refText: Column,
      n: Int,
      threshMil: Int
  ): DataFrame = {
    def shingleSets(df: DataFrame, t: Column): DataFrame =
      df.withColumn("__toks", TextFunctions.tokens(t))
        .where(size(col("__toks")) >= n)
        .withColumn(
          "__sh",
          array_distinct(call_function("graft_ngram_hashes", col("__toks"), lit(n)))
        )

    val corpus = shingleSets(docs, text)
      .select(col(idCol).as("id"), size(col("__sh")).as("n_shingles"), col("__sh"))
      .select(col("id"), col("n_shingles"), explode(col("__sh")).as("h"))

    val ref = shingleSets(refDocs, refText)
      .select(explode(col("__sh")).as("h"))
      .distinct()
      .withColumn("__hit", lit(1))

    corpus
      .join(broadcast(ref), Seq("h"), "left")
      .groupBy(col("id"), col("n_shingles"))
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("int").as("n_overlap"))
      .withColumn(
        "contaminated",
        when(
          col("n_overlap").cast("long") * lit(1000L) >=
            lit(threshMil.toLong) * col("n_shingles").cast("long"),
          1
        ).otherwise(0)
      )
  }

  /** The REMOVAL half: `docs` with contaminated documents filtered out —
    * the anti-join a training pipeline actually runs after the report.
    * Documents too short to shingle (< n tokens) cannot be contaminated
    * and are KEPT (they never enter the overlap computation). The
    * contaminated-id side is a left-anti join: typically a tiny
    * fraction of the corpus, so AQE broadcasts it; the corpus side
    * streams through untouched either way.
    */
  def decontaminate(
      docs: DataFrame,
      idCol: String,
      text: Column,
      refDocs: DataFrame,
      refText: Column,
      n: Int,
      threshMil: Int
  ): DataFrame = {
    val contaminatedIds = ngramOverlap(docs, idCol, text, refDocs, refText, n, threshMil)
      .where(col("contaminated") === 1)
      .select(col("id").as("__contam_id"))
    docs.join(contaminatedIds, docs(idCol) === col("__contam_id"), "left_anti")
  }
}
