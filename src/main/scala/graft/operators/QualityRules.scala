package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality filters (Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", 2021,
  * Appendix A1.1) — the rule-based half of a training-corpus curation
  * stack, next to the learned classifier ([[Classifier]]) and the dedup
  * families: cheap, interpretable per-document gates that remove
  * machine-generated and degenerate text BEFORE any expensive model
  * scoring runs.
  *
  * Both operators are PURE PER-ROW map stages — higher-order functions
  * over the token array, zero shuffles, zero joins (plan-pinned in
  * QualityRulesSpec). At 100 TB that is the whole story: linear scan,
  * perfectly partition-parallel, pushdown-friendly (only the text
  * column is read).
  *
  * All ratios are integer ppm/milli (cross-multiplied comparisons, no
  * floating point), so Spark and the DuckDB oracle agree exactly by
  * construction.
  *
  * Reference scope note: the reference pipeline has no text-quality
  * stage (its DATA_QUALITY flags are schema-validity checks,
  * `ETL/CSV_Batch_Processing.py:69-90`); this family is part of the
  * beyond-reference LLM-pipeline surface, like [[Classifier]].
  */
object QualityRules {

  /** Gopher rule E1: minimum distinct-stopword hits. The shipped list
    * is the English marker vocabulary the lang-id heuristic already
    * uses plus the function words Gopher names.
    */
  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "is", "to", "in", "that", "with", "for")

  /** Per-document rule bits + the measurements behind them.
    *
    * Output: (id, n_words, mean_len_milli, alpha_ppm, stop_hits,
    * word_count_ok, mean_len_ok, alpha_ok, stop_ok, keep) — one row per
    * input row; `keep` is the conjunction. Thresholds are Gopher's
    * defaults scaled to ppm/milli:
    *   - word count in [minWords, maxWords]            (Gopher: 50..100k)
    *   - mean word length in [3, 10] characters        (milli: 3000..10000)
    *   - >= 80% purely-alphabetic words                (Gopher: 80% with
    *     an alphabetic character; the corpus convention here is
    *     whole-word)
    *   - >= 2 distinct stopwords present
    */
  def gopherQuality(
      df: DataFrame,
      idCol: String,
      text: Column,
      minWords: Int = 50,
      maxWords: Int = 100000,
      stopwords: Seq[String] = DefaultStopwords
  ): DataFrame = {
    val toks = TextFunctions.tokens(text)
    df.select(col(idCol), toks.as("__t"))
      .select(
        col(idCol),
        col("__t").as("__t"),
        size(col("__t")).as("n_words"),
        // sum of word lengths via one fold — no explode, no shuffle
        aggregate(col("__t"), lit(0L), (acc, t) => acc + length(t)).as("__sumlen"),
        size(filter(col("__t"), t => t.rlike("^[A-Za-z]+$"))).cast("long").as("__alpha"),
        size(array_intersect(
          array_distinct(col("__t")),
          array(stopwords.map(lit): _*)
        )).cast("long").as("stop_hits")
      )
      .select(
        col(idCol),
        col("n_words").cast("long").as("n_words"),
        when(col("n_words") > 0, expr("(__sumlen * 1000L) div n_words"))
          .otherwise(lit(-1L)).cast("long").as("mean_len_milli"),
        when(col("n_words") > 0, expr("(__alpha * 1000000L) div n_words"))
          .otherwise(lit(-1L)).cast("long").as("alpha_ppm"),
        col("stop_hits")
      )
      .withColumn(
        "word_count_ok",
        (col("n_words") >= minWords && col("n_words") <= maxWords).cast("int"))
      .withColumn(
        "mean_len_ok",
        (col("mean_len_milli") >= 3000L && col("mean_len_milli") <= 10000L).cast("int"))
      .withColumn("alpha_ok", (col("alpha_ppm") >= 800000L).cast("int"))
      .withColumn("stop_ok", (col("stop_hits") >= 2L).cast("int"))
      .withColumn(
        "keep",
        (col("word_count_ok") === 1 && col("mean_len_ok") === 1 &&
          col("alpha_ok") === 1 && col("stop_ok") === 1).cast("int"))
  }

  /** Token-level repetition measurements (Gopher's duplicate-n-gram
    * family, restated at token granularity because the corpus is
    * single-line):
    *
    *   - `top_token_ppm`: occurrences of the most frequent token / n.
    *     Computed per row as the longest equal-run of the SORTED token
    *     array — one O(n log n) sort + one fold, instead of the
    *     explode + two-level count-aggregation that would shuffle the
    *     whole corpus keyed by (doc, token).
    *   - `dup_2gram_ppm` / `dup_3gram_ppm`: fraction of n-gram
    *     occurrences that are repeats of an earlier occurrence
    *     (= (total - distinct) / total) — array_distinct, per row.
    *   - `distinct_ppm`: type-token ratio (distinct tokens / tokens).
    *
    * Degenerate inputs report -1 (empty docs for the token ratios;
    * docs shorter than n for an n-gram column).
    */
  def repetitionStats(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val toks = TextFunctions.tokens(text)

    // longest equal-run over the sorted array = max token multiplicity
    def topRun(t: Column): Column =
      aggregate(
        array_sort(t),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (a, x) => {
          val run = when(x === a.getField("prev"), a.getField("run") + 1L).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"), greatest(a.getField("best"), run).as("best"))
        },
        a => a.getField("best")
      )

    // sequence(0, n-k) DESCENDS when n < k — guard to an empty gram list
    def grams(t: Column, k: Int): Column =
      when(
        size(t) >= k,
        transform(
          sequence(lit(0), size(t) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(t, i + j + 1)): _*)
        )
      ).otherwise(array().cast("array<string>"))

    def intDiv(num: Column, den: Column): Column =
      floor(num.cast("decimal(26,0)") / den.cast("decimal(26,0)")).cast("long")

    def dupPpm(g: Column): Column =
      when(
        size(g) > 0,
        intDiv((size(g) - size(array_distinct(g))).cast("long") * 1000000L, size(g))
      ).otherwise(lit(-1L))

    df.select(col(idCol), toks.as("__t"))
      .select(
        col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        when(size(col("__t")) > 0,
          intDiv(topRun(col("__t")) * 1000000L, size(col("__t"))))
          .otherwise(lit(-1L)).cast("long").as("top_token_ppm"),
        when(size(col("__t")) > 0,
          intDiv(size(array_distinct(col("__t"))).cast("long") * 1000000L, size(col("__t"))))
          .otherwise(lit(-1L)).cast("long").as("distinct_ppm"),
        dupPpm(grams(col("__t"), 2)).cast("long").as("dup_2gram_ppm"),
        dupPpm(grams(col("__t"), 3)).cast("long").as("dup_3gram_ppm")
      )
  }
}
