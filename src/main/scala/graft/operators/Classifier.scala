package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed bag-of-words quality classifier — the "does this look
  * like the curated corpus" filter signal used to select web data for
  * LLM pretraining (the GPT-3 / CCNet recipe: train a cheap linear
  * classifier with the curated corpus as positives and raw crawl as
  * negatives, keep high-scoring documents).
  *
  * TRAIN is one token-level aggregation: per-token positive/negative
  * occurrence counts with add-1 smoothing folded into an integer
  * class-affinity weight `w_ppm = 10^6·(c_pos+1) div (c_pos+c_neg+2)`
  * (the smoothed P(positive | token) on a parts-per-million grid). The
  * model is vocab-sized — it grows with the vocabulary, not the corpus,
  * so at 100 TB it still fits an executor and broadcasts.
  *
  * SCORE is one equi-join of the exploded corpus against the model plus
  * a per-document mean: Spark broadcasts the vocab-sized model, so the
  * corpus never shuffles for the join; the per-document aggregation
  * collapses token rows to per-doc partials map-side before its single
  * exchange. All arithmetic is 64-bit integer (sums of ppm weights,
  * integer division) — order-free, bit-identical across engines and
  * partitionings. Tokens absent from the model carry no signal and are
  * skipped (the natural treatment for a minCount-pruned vocabulary);
  * a document with NO in-vocabulary tokens scores -1 by contract.
  */
object Classifier {

  /** Train the token model: (token, c_pos, c_neg, w_ppm), one row per
    * token with total count >= minCount. `isPositive` labels each
    * document (boolean column over `docs`).
    */
  def train(docs: DataFrame, textCol: Column, isPositive: Column, minCount: Long): DataFrame =
    trainOnFeatures(
      docs.select(
        isPositive.as("__lbl"),
        explode(TextFunctions.tokens(textCol)).as("token")
      ),
      "token",
      col("__lbl"),
      minCount
    )

  /** [[train]] over an ALREADY-FEATURIZED frame: one row per (feature
    * occurrence), labeled by `isPositive`. This is the hashed-feature
    * entry point — at open-vocabulary scale the model is kept bounded
    * by hashing features into a fixed-width space FIRST (the
    * hashing-trick / DSIR discipline: the model size is then a chosen
    * constant, not a function of the corpus), and the same train
    * arithmetic applies to the bucket ids.
    */
  def trainOnFeatures(
      featureRows: DataFrame,
      featureCol: String,
      isPositive: Column,
      minCount: Long
  ): DataFrame =
    featureRows
      .select(isPositive.cast("boolean").as("__pos"), col(featureCol).as("token"))
      .groupBy(col("token"))
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("c_neg")
      )
      .where(col("c_pos") + col("c_neg") >= minCount)
      .select(
        col("token"),
        col("c_pos"),
        col("c_neg"),
        expr("(1000000L * (c_pos + 1)) div (c_pos + c_neg + 2)").as("w_ppm")
      )

  /** Score every document against `model` (from [[train]]):
    * (idCol, n_scored, score_ppm, keep) where score_ppm is the mean
    * w_ppm over the document's in-vocabulary token OCCURRENCES
    * (bag-of-words: repeats count) and keep = score_ppm >= threshold.
    * Documents with no in-vocabulary tokens score -1 and are dropped.
    */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      model: DataFrame,
      keepThresholdPpm: Long = 500000L
  ): DataFrame =
    scoreOnFeatures(
      docs.select(col(idCol), explode_outer(TextFunctions.tokens(textCol)).as("token")),
      idCol,
      "token",
      model,
      keepThresholdPpm
    )

  /** [[score]] over an already-featurized frame: one row per (idCol,
    * feature occurrence); a document with no features must still carry
    * one (idCol, NULL) row to surface in the output (scored -1), the
    * shape `explode_outer` produces naturally. The model's feature
    * column is `token` whatever the features are (words, hash buckets).
    */
  def scoreOnFeatures(
      featureRows: DataFrame,
      idCol: String,
      featureCol: String,
      model: DataFrame,
      keepThresholdPpm: Long = 500000L
  ): DataFrame =
    featureRows
      .select(col(idCol), col(featureCol).as("token"))
      .join(model.select(col("token"), col("w_ppm")), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("w_ppm")).as("n_scored"),
        coalesce(sum(col("w_ppm")), lit(0L)).as("__sw")
      )
      .select(
        col(idCol),
        col("n_scored"),
        when(col("n_scored") > 0, expr("__sw div n_scored")).otherwise(lit(-1L)).as("score_ppm")
      )
      .withColumn("keep", col("score_ppm") >= keepThresholdPpm)
}
