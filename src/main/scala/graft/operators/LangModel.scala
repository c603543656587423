package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model quality scoring — the
  * CCNet-style "does this document look like the corpus" filter signal
  * (Wenzek et al. 2020 score documents with a KenLM n-gram model; the
  * distributed shape is identical with the model trained on the corpus
  * itself).
  *
  * Two passes, both plain relational:
  *   1. TRAIN — bigram transition counts (one shuffled aggregation on
  *      (w1, w2)) with context totals via a `w1`-partitioned window;
  *      the model is O(vocab²) rows, tiny next to the corpus.
  *   2. SCORE — every in-document transition equi-joins the model on
  *      (w1, w2) and aggregates per document. When the model fits an
  *      executor (the usual case even at 100 TB corpus scale — the
  *      model grows with vocab, not corpus), Spark broadcasts it and
  *      the corpus side never shuffles.
  *
  * All scoring arithmetic is 64-bit integer (micro-scaled transition
  * probability `p_micro = 10^6·c(w1,w2) div c(w1,·)`, document score =
  * mean p_micro, integer-divided). Integer sums are order-free, so the
  * result is bit-identical across engines and partitionings — no
  * float-reduction ordering trap. A document's score is the
  * arithmetic-mean transition probability (geometric/log scoring would
  * put floats back on the hot path for no extra oracle power).
  * Documents with fewer than two tokens score -1 by contract.
  */
object LangModel {
  /** Per-document adjacent-token transitions. Documents with <2 tokens
    * surface as a single (doc, NULL, NULL) row (`explode_outer`), so a
    * downstream null-skipping count sees them as zero transitions
    * without a second pass over the corpus.
    */
  def transitions(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("__t"))
      .select(
        col(idCol),
        explode_outer(
          when(
            size(col("__t")) >= 2,
            expr("transform(sequence(0, size(__t)-2), i -> struct(__t[i] AS w1, __t[i+1] AS w2))")
          ).otherwise(expr("CAST(array() AS array<struct<w1: string, w2: string>>)"))
        ).as("__bg")
      )
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))

  /** Bigram model: (w1, w2, p_micro) with p_micro = 10^6·c(w1,w2) div
    * c(w1,·). Probabilities normalize over observed continuations, so
    * sum_{w2} p ≈ 10^6 per context (up to the div floor).
    */
  def bigramModel(transitions: DataFrame): DataFrame =
    transitions
      .where(col("w1").isNotNull)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cb"))
      .withColumn("cc", sum(col("cb")).over(Window.partitionBy(col("w1"))))
      .select(col("w1"), col("w2"), expr("(1000000L * cb) div cc").as("p_micro"))

  /** Per-document scores against `model` (from [[bigramModel]]):
    * (idCol, n_trans, score_micro). Self-trained models match every
    * transition; a foreign model's unseen transitions are left-join
    * misses and score 0 via the null-skipping sum — the natural add-0
    * smoothing for integer arithmetic.
    */
  def scoreDocs(transitions: DataFrame, model: DataFrame, idCol: String): DataFrame =
    transitions
      .join(model, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("w1")).as("n_trans"),
        coalesce(sum(col("p_micro")), lit(0L)).as("__sp")
      )
      .select(
        col(idCol),
        col("n_trans"),
        when(col("n_trans") > 0, expr("__sp div n_trans")).otherwise(lit(-1L)).as("score_micro")
      )

  /** CCNet-style per-language perplexity terciles (Wenzek et al. 2020
    * §4.4: score every document with the LM, split each language into
    * head / middle / tail thirds, and train on the head first). Input
    * is [[scoreDocs]] output joined with the language column.
    *
    * The scale-critical choice: bucket boundaries come from a
    * HISTOGRAM of (lang, score), not a per-language sort of the
    * corpus. `score_micro` lives in [-1, 10^6], so the histogram is at
    * most |langs|·(10^6+2) rows no matter how large the corpus — the
    * cumulative window runs over that bounded table and the resulting
    * per-language (t1, t2) thresholds broadcast back over the scored
    * corpus. No corpus-sized window, no single-task sort.
    *
    * Ties share a bucket by construction (the boundary is a score
    * threshold, not a rank), which keeps the labeling deterministic
    * and engine-independent: t1 = min score with cum·3 >= n,
    * t2 = min score with cum·3 >= 2n; bucket = head if score > t2,
    * middle if score > t1, else tail (higher mean transition
    * probability = more corpus-like = head, mirroring CCNet's
    * lower-perplexity-is-better orientation).
    *
    * Rows whose `langCol` is null are DROPPED: the bounds join is an
    * inner join keyed by language, and a null key matches nothing.
    * This is intentional — a doc with no language has no per-language
    * score distribution to bucket against; pre-filter or impute a
    * language upstream if those rows must be retained.
    */
  def perplexityBuckets(
      scored: DataFrame,
      idCol: String,
      langCol: String,
      scoreCol: String
  ): DataFrame = {
    val hist = scored
      .groupBy(col(langCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
    val cum = hist
      .withColumn(
        "__cum",
        sum(col("__c")).over(Window.partitionBy(col(langCol)).orderBy(col(scoreCol)))
      )
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(langCol))))
    val bounds = cum
      .groupBy(col(langCol))
      .agg(
        min(when(col("__cum") * 3 >= col("__n"), col(scoreCol))).as("t1"),
        min(when(col("__cum") * 3 >= col("__n") * 2, col(scoreCol))).as("t2")
      )
    scored
      .join(broadcast(bounds), Seq(langCol))
      .select(
        col(idCol),
        col(langCol),
        col(scoreCol),
        col("t1"),
        col("t2"),
        when(col(scoreCol) > col("t2"), lit("head"))
          .when(col(scoreCol) > col("t1"), lit("middle"))
          .otherwise(lit("tail"))
          .as("bucket")
      )
  }
}
