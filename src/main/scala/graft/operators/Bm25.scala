package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a corpus against a fixed query-term set —
  * the retrieval primitive behind quality filtering ("score documents
  * against a topic description") and retrieval-augmented data curation.
  * (Robertson & Zaragoza, "The Probabilistic Relevance Framework: BM25
  * and Beyond", FnTIR 2009.)
  *
  * 100 TB shape — exactly TWO linear passes and one scalar broadcast:
  *
  *   1. STATS pass: one aggregation row holds N, sum(dl), and one
  *      document-frequency counter per query term (terms are literals,
  *      so each df is a conditional sum in the same partial-aggregated
  *      scan — no explode, no per-term job);
  *   2. the 1-row stats frame cross-joins back BROADCAST;
  *   3. SCORE pass: per doc, tf per term is a compiled filter over the
  *      staged token array; idf and the length normalization are plain
  *      double arithmetic; the final score is a FIXED left-to-right sum
  *      over terms (deterministic, oracle-mirrorable term by term).
  *
  * No shuffle of document data ever happens — the only exchange is the
  * single stats row.
  */
object Bm25 {

  /** Per-document BM25 score against `terms`. Output: df columns
    * (id, dl, tf_<i> per term, bm25_micro) where bm25_micro is the
    * score on a 1e-6 grid (engine log() implementations may differ in
    * the last ulp; raw doubles are not hash-comparable).
    */
  def scoreAll(
      docs: DataFrame,
      idCol: String,
      text: Column,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val toks = docs
      .select(col(idCol).as("id"), TextFunctions.tokens(text).as("__toks"))
      .withColumn("dl", size(col("__toks")))

    // keep the stats row well-defined on an empty corpus: sum over zero
    // rows is NULL (coalesced here), and the avgdl denominator below
    // guards n=0 — a caller joining empty-corpus stats against a
    // non-empty frame gets finite scores, not NULL/NaN poison
    val statCols =
      count(lit(1)).cast("double").as("n") +:
        coalesce(sum(col("dl")), lit(0L)).cast("double").as("sumdl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("__toks"), t), 1).otherwise(0)).cast("double").as(s"df$i")
        }
    val stats = toks.agg(statCols.head, statCols.tail: _*)

    val scored = toks.crossJoin(broadcast(stats))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("__toks"), x => x === t)).cast("double").as(s"tf$i")
    }
    val staged = scored.select(
      Seq(col("id"), col("dl"), col("n"), col("sumdl")) ++
        terms.indices.map(i => col(s"df$i")) ++ tfCols: _*
    )
    // one term's contribution; operation order mirrored verbatim in SQL
    def term(i: Int): Column = {
      val idf = log(lit(1.0) + (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
      // avgdl guards n=0 (empty-corpus stats joined externally): the
      // branch is never taken on a non-empty corpus, so the evaluated
      // arithmetic — and the oracle mirror — is unchanged there
      val avgdl = when(col("n") === 0.0, lit(1.0)).otherwise(col("sumdl") / col("n"))
      val norm = col(s"tf$i") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl)
      idf * (col(s"tf$i") * lit(k1 + 1.0)) / norm
    }
    val score = terms.indices.map(term).reduce(_ + _)
    staged.select(
      Seq(col("id"), col("dl")) ++
        terms.indices.map(i => col(s"tf$i").cast("int").as(s"tf$i")) :+
        round(score * 1e6).cast("long").as("bm25_micro"): _*
    )
  }
}
