package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: a lexical (inverted-index token-overlap) candidate
  * list fused with a semantic (embedding-cosine) candidate list by
  * Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
  * the standard production shape for RAG retrieval and
  * retrieval-augmented data curation, where neither signal alone is
  * reliable (lexical misses paraphrase, dense misses rare literals).
  *
  * Scale shape:
  *   - the lexical leg is a POSTING-LIST equi-join on the token, never
  *     a query×corpus product, with the classic stop-token discipline:
  *     tokens whose document frequency exceeds `maxDfPpm` of the corpus
  *     are dropped from the index (a hot token's posting list is what
  *     turns an inverted index quadratic; its selectivity is nil). The
  *     df filter is one vocab-sized aggregation joined back on the
  *     token — corpus-size-independent state.
  *   - the semantic leg reuses [[Similarity.bruteForceTopK]] (query set
  *     broadcast; swap in ivfTopK at scale — any (query_id, neighbor_id,
  *     rank) frame fuses identically).
  *   - the fusion is a full-outer join of two k-bounded rank lists —
  *     |queries|·k rows a side, trivially small — and the final top-k is
  *     one per-query window.
  *
  * RRF arithmetic: score = Σ_legs 1/(k0 + rank). Each term is one
  * double division and the two-term sum is a single fixed-shape add, so
  * both engines produce bit-identical doubles; the score is then
  * rounded to a 1e-9 grid and RANKED BY THE INTEGER — the float never
  * enters a comparison whose outcome the grid doesn't determine.
  */
object HybridSearch {

  /** Lexical top-k per query by distinct-token overlap via an inverted
    * index. `queries` is (query_id) — a subset of `docs` ids. Tokens
    * with df > maxDfPpm·N/10^6 are excluded from the index (integer
    * cross-multiplied — no FP boundary). Self-matches are excluded.
    * Returns (query_id, neighbor_id, rank), rank 1..k by
    * (overlap DESC, neighbor_id ASC).
    *
    * EAGER: construction materializes the posting list and the
    * stop-token-filtered index immediately ([[Materialize.frame]]) —
    * the posting set feeds the df aggregation AND the gate join's probe
    * side, and the filtered index feeds both the query semi-join and
    * the overlap join, so without the two cuts the doc scan + tokenize
    * is planted four times in one plan (round 15: search_hybrid_rrf
    * read 10 parquet scans / 50 Exchanges). `checkpointDir` selects
    * RELIABLE checkpoints; the default is executor-local.
    */
  def lexicalTopK(
      docs: DataFrame,
      idCol: String,
      textCol: Column,
      queryIds: DataFrame,
      k: Int,
      maxDfPpm: Long,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val pairs = Materialize.frame(
      docs
        .select(col(idCol).as("__id"), explode(array_distinct(split(textCol, " "))).as("token")),
      checkpointDir)
    val n  = docs.select(count(lit(1)).as("__n"))
    val df = pairs.groupBy(col("token")).agg(count(lit(1)).as("__df"))
    // stop-token gate: df·10^6 <= maxDfPpm·N, exact in integers
    val kept = Materialize.frame(
      pairs
        .join(df, "token")
        .crossJoin(broadcast(n))
        .where(col("__df") * lit(1000000L) <= lit(maxDfPpm) * col("__n"))
        .select(col("__id"), col("token")),
      checkpointDir)
    val q = kept
      .join(broadcast(queryIds.select(col(idCol).as("__qid"))), col("__id") === col("__qid"), "left_semi")
      .select(col("__id").as("query_id"), col("token"))
    val overlaps = q
      .join(kept.withColumnRenamed("__id", "neighbor_id"), "token")
      .where(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(count(lit(1)).as("overlap"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("overlap").desc, col("neighbor_id").asc)
    overlaps
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Fuse two (query_id, neighbor_id, rank) lists by RRF and keep the
    * per-query top `k` by (rrf_nano DESC, neighbor_id ASC). A neighbor
    * present in only one list contributes that one term (the other is
    * 0) — the standard RRF treatment of disjoint index coverage.
    */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k0: Int, k: Int): DataFrame = {
    val l = lex.select(col("query_id"), col("neighbor_id"), col("rank").as("__rl"))
    val s = sem.select(col("query_id"), col("neighbor_id"), col("rank").as("__rs"))
    val fused = l
      .join(s, Seq("query_id", "neighbor_id"), "full_outer")
      .select(
        col("query_id"),
        col("neighbor_id"),
        (coalesce(lit(1.0) / (lit(k0.toDouble) + col("__rl")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0.toDouble) + col("__rs")), lit(0.0))).as("__rrf")
      )
      .withColumn("rrf_nano", round(col("__rrf") * 1e9).cast("long"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rrf_nano").desc, col("neighbor_id").asc)
    fused
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rrf_nano"), col("rnk"))
  }
}
