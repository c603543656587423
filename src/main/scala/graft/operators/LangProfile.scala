package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** TRAINED language identification — Cavnar & Trenkle 1994 ("N-Gram-
  * Based Text Categorization"), the rank-profile method production
  * lang-ID tools descend from. The heuristic marker-vocabulary
  * [[graft.functions.TextFunctions.langId]] needs hand-picked words;
  * this learns per-language character-trigram RANK profiles from a
  * labeled seed corpus and classifies by the out-of-place distance
  * between a document's own trigram ranks and each profile.
  *
  * Everything is integer-exact and order-deterministic: ranks break
  * ties by (count DESC, trigram ASC), a document trigram absent from a
  * profile costs the maximum displacement `topN`, and argmin breaks
  * ties by language code — so a SQL oracle replays training AND
  * classification bit-for-bit.
  *
  * Scale shape: training shuffles (lang, trigram) pairs (vocabulary-
  * sized after the map-side partial agg, NOT corpus-sized) and keeps
  * topN rows per language; the learned profile is |langs| x topN rows
  * and BROADCASTS at classify time. Classification is doc-keyed
  * throughout: per-doc trigram agg, per-doc rank window, per-(doc,
  * lang) distance agg, per-doc argmin — linear in the corpus, no
  * corpus-side join ever shuffles the profile side.
  */
object LangProfile {

  /** Character trigrams of `t` (positions 1..len-2, each exactly 3
    * chars); empty for texts shorter than 3. Column-only — stays in
    * codegen. (A bare `sequence(1, len-2)` would generate DESCENDING
    * for len < 3 — Spark's sequence reverses when stop < start — hence
    * the explicit guard.)
    */
  def trigrams(t: Column): Column =
    when(length(t) < 3, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))

  /** Learn rank profiles from labeled docs: (lang, tg, pr) with
    * pr in [1, topN] by (count DESC, tg ASC) within each language.
    */
  def train(docs: DataFrame, langCol: String, textCol: String, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("tg").asc)
    docs
      .select(col(langCol).as("lang"), explode(trigrams(col(textCol))).as("tg"))
      .groupBy(col("lang"), col("tg"))
      .agg(count(lit(1)).as("n"))
      .withColumn("pr", row_number().over(w))
      .where(col("pr") <= topN)
      .select(col("lang"), col("tg"), col("pr"))
  }

  /** Train on the labeled corpus AND classify that same corpus in one
    * fused plan (round 14). [[train]] followed by [[classify]] over
    * the same docs evaluates the corpus trigram explode — the
    * dominant phase: one substr per character of every document —
    * TWICE, because the two branches shuffle on different keys
    * ((lang, tg) vs (id, tg)) and share no exchange Catalyst could
    * reuse. This path stages the per-(doc, lang, trigram) counts
    * once (`localCheckpoint` — the language totals are exactly the
    * per-doc counts re-summed, since each doc carries one language)
    * and derives BOTH the rank profiles and the doc profiles from the
    * staged frame. Result-identical to train-then-classify on the
    * same corpus — LangProfileSpec pins it; the self-classification
    * query shape (fit + transform on the training corpus, the
    * standard seed-corpus evaluation) is the only caller that can
    * fuse, so [[train]]/[[classify]] stay for the serve path.
    */
  def trainAndClassifySelf(
      docs: DataFrame,
      langCol: String,
      idCol: String,
      textCol: String,
      topN: Int
  ): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val dtc = docs
      .select(col(idCol), col(langCol).as("lang"), explode(trigrams(col(textCol))).as("tg"))
      .groupBy(col(idCol), col("lang"), col("tg"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val pw = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("tg").asc)
    val profiles = dtc
      .groupBy(col("lang"), col("tg"))
      .agg(sum(col("n")).as("n"))
      .withColumn("pr", row_number().over(pw))
      .where(col("pr") <= topN)
      .select(col("lang"), col("tg"), col("pr"))
    val dw = Window.partitionBy(col(idCol)).orderBy(col("n").desc, col("tg").asc)
    val docProf = dtc
      .withColumn("dr", row_number().over(dw))
      .where(col("dr") <= topN)
      .select(col(idCol), col("tg"), col("dr"))
    // identical lang set to profiles' (any lang with >= 1 trigram row in
    // dtc survives the per-lang topN rank filter), but read off the
    // CHECKPOINTED frame — deriving it from `profiles` would replay the
    // profile agg + rank window just to list the languages
    val langs = dtc.select(col("lang")).distinct()
    val aw    = Window.partitionBy(col(idCol)).orderBy(col("dist").asc, col("lang").asc)
    docProf
      .crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("lang", "tg"), "left")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(coalesce(abs(col("dr") - col("pr")), lit(topN.toLong))).as("dist"))
      .withColumn("__rn", row_number().over(aw))
      .where(col("__rn") === 1)
      .select(col(idCol), col("lang").as("pred_lang"), col("dist"))
  }

  /** Classify each doc against the learned `profiles`: returns
    * (idCol, pred_lang, dist) — the argmin out-of-place distance, ties
    * by language code. `topN` must match training (it is both the doc
    * profile depth and the missing-trigram penalty).
    */
  def classify(
      docs: DataFrame,
      profiles: DataFrame,
      idCol: String,
      textCol: String,
      topN: Int
  ): DataFrame = {
    val dw = Window.partitionBy(col(idCol)).orderBy(col("n").desc, col("tg").asc)
    val docProf = docs
      .select(col(idCol), explode(trigrams(col(textCol))).as("tg"))
      .groupBy(col(idCol), col("tg"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dr", row_number().over(dw))
      .where(col("dr") <= topN)
      .select(col(idCol), col("tg"), col("dr"))
    val langs = profiles.select(col("lang")).distinct()
    val aw = Window.partitionBy(col(idCol)).orderBy(col("dist").asc, col("lang").asc)
    docProf
      .crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("lang", "tg"), "left")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(coalesce(abs(col("dr") - col("pr")), lit(topN.toLong))).as("dist"))
      .withColumn("__rn", row_number().over(aw))
      .where(col("__rn") === 1)
      .select(col(idCol), col("lang").as("pred_lang"), col("dist"))
  }
}
