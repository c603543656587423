package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact SUBSTRING-level deduplication statistics (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): find
  * repeated token SPANS across the corpus, not just near-duplicate whole
  * documents — the memorization risk the doc-level family cannot see
  * (boilerplate, licenses, quoted passages embedded in otherwise-unique
  * documents).
  *
  * Formulation: every length-`n` token window gets a 64-bit rolling
  * hash from the native [[graft.functions.NgramHashes]] kernel (no
  * window strings are ever materialized); a window is REPEATED if its
  * hash occurs at more than one (doc, position) in the corpus — the
  * sliding-window equivalent of the paper's suffix-array match, at
  * span granularity n.
  *
  * Scale shape: two passes over the exploded window frame —
  *   1. `groupBy(hash).count()` with map-side partial aggregation
  *      (8-byte keys, combiner collapses each partition's repeats);
  *   2. join windows against the `count > 1` survivors (a small
  *      fraction of distinct hashes on real corpora) and aggregate per
  *      doc.
  * The |tokens|-row shuffle is the inherent cost of exact substring
  * matching (the paper's suffix array pays the same linear blow-up);
  * the compact per-hash count frame and the narrow (id, pos, hash)
  * rows are what keep it a plain well-partitioned aggregation at
  * 100 TB. 64-bit collisions would need two distinct spans on the same
  * hash to flip a count — the same accepted ~2^-64 risk as the
  * n-gram Jaccard path.
  */
object SubstringDedup {

  /** Per-document repeated-span statistics:
    * (id, n_windows, n_dup_windows, max_multiplicity) where
    * `n_dup_windows` counts this doc's windows whose span occurs at
    * more than one (doc, pos) corpus-wide, and `max_multiplicity` is
    * the highest corpus-wide occurrence count among them (1 if none).
    * Docs with fewer than `n` tokens are excluded (no windows).
    */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      text: Column,
      n: Int
  ): DataFrame = {
    require(n >= 1, s"span length must be >= 1, got $n")
    val windows = docs
      .select(col(idCol).as("id"), TextFunctions.tokens(text).as("__toks"))
      .where(size(col("__toks")) >= n)
      .withColumn("__wh", call_function("graft_ngram_hashes", col("__toks"), lit(n)))
      .select(col("id"), explode(col("__wh")).as("h"))

    val repeated = windows
      .groupBy(col("h"))
      .agg(count(lit(1)).as("mult"))
      .where(col("mult") > 1)

    windows
      .join(repeated, Seq("h"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).cast("int").as("n_windows"),
        sum(when(col("mult").isNotNull, 1).otherwise(0)).cast("int").as("n_dup_windows"),
        coalesce(max(col("mult")), lit(1L)).as("max_multiplicity")
      )
  }
}
