package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining (market basket): for item pairs
  * co-occurring in >= minSupport baskets, emit both directed rules
  * a -> b with exact-integer confidence and lift. The curation use is
  * co-occurrence structure over corpora (tags, hosts, entities):
  * which items predict which.
  *
  * Apriori discipline: pair candidates are generated ONLY among items
  * that are individually frequent (support >= minSupport) — the
  * downward-closure prune that keeps the per-basket pair expansion off
  * the long tail. The quadratic term is bounded by the largest
  * SURVIVING basket: pair generation is a per-basket self-join after
  * the frequent-item semi-join, so a basket contributes
  * C(|frequent items in it|, 2) pairs. (Degenerate giant baskets are a
  * data bug this operator surfaces rather than hides; cap upstream if
  * they are legitimate.)
  *
  * Exactness: support counts are integers; confidence and lift ship
  * micro-scaled by integer floor division — conf_micro =
  * 1e6*s(a,b)/s(a), lift_micro = 1e6*s(a,b)*N/(s(a)*s(b)) — no FP
  * anywhere, BIGINT headroom to ~1e5 supports x 1e6 baskets.
  *
  * Shuffle inventory: item-support agg (item); basket semi-join +
  * per-basket pair self-join (basket); pair-support agg (a, b);
  * N is one broadcast scalar. The frequent-item joins carry NO explicit
  * broadcast hint: with a low minSupport `freq` approaches the whole
  * item vocabulary — at corpus scale that can exceed executor memory,
  * so the strategy choice is left to AQE, which broadcasts exactly when
  * the runtime size is actually broadcast-range and falls back to a
  * shuffled join when it is not.
  */
object Association {

  /** `baskets`: rows of (basketCol, itemCol), duplicates tolerated.
    * Returns (ante, cons, s_pair, s_ante, s_cons, conf_micro,
    * lift_micro) — one row per direction per qualifying pair.
    *
    * EAGER: construction materializes the deduplicated basket-item set
    * immediately ([[Materialize.frame]]); `checkpointDir` makes that
    * checkpoint RELIABLE for cluster-scale fault tolerance.
    */
  def pairRules(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    // the deduplicated basket-item set feeds every downstream branch
    // (the basket count, the support agg reached through three separate
    // joins, and both sides of the per-basket pair self-join) —
    // materialize it ONCE so the caller's scan + distinct is evaluated
    // once instead of once per branch; rows are two longs, so the
    // checkpoint is narrow (round 14)
    val items = Materialize.frame(
      baskets
        .select(col(basketCol).as("b"), col(itemCol).as("i"))
        .distinct(),
      checkpointDir)
    val n = items.select(countDistinct(col("b")).as("n_baskets"))
    val supp = items.groupBy(col("i")).agg(count(lit(1)).as("s"))
    val freq = supp.where(col("s") >= minSupport)
    val fitems = items.join(freq.select(col("i")), "i", "left_semi")
    val pairs = fitems
      .as("x")
      .join(fitems.as("y"), col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("pa"), col("y.i").as("pb"))
      .agg(count(lit(1)).as("s_pair"))
      .where(col("s_pair") >= minSupport)
    val scored = pairs
      .join(freq.select(col("i").as("pa"), col("s").as("s_a")), "pa")
      .join(freq.select(col("i").as("pb"), col("s").as("s_b")), "pb")
      .crossJoin(broadcast(n))
    // both directions: confidence is directional, lift symmetric
    scored
      .select(
        explode(array(
          struct(col("pa").as("ante"), col("pb").as("cons"),
            col("s_a").as("s_ante"), col("s_b").as("s_cons")),
          struct(col("pb").as("ante"), col("pa").as("cons"),
            col("s_b").as("s_ante"), col("s_a").as("s_cons"))
        )).as("r"),
        col("s_pair"),
        col("n_baskets")
      )
      .select(
        col("r.ante").as("ante"),
        col("r.cons").as("cons"),
        col("s_pair"),
        col("r.s_ante").as("s_ante"),
        col("r.s_cons").as("s_cons"),
        expr("(1000000 * s_pair) div r.s_ante").as("conf_micro"),
        expr("(1000000 * s_pair * n_baskets) div (r.s_ante * r.s_cons)").as("lift_micro")
      )
  }
}
