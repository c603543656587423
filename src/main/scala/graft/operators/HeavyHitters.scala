package graft.operators

import graft.functions.Fingerprint
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an unbounded item stream, computed with a
  * count-min-sketch prefilter expressed RELATIONALLY — the sketch-then-
  * verify shape every 100 TB frequency query wants:
  *
  *   1. BUILD: one pass counts item occurrences into `depth` seeded hash
  *      bucket tables of `width` counters each (the CMS matrix as a
  *      (seed, bucket) -> count relation). Map-side partial aggregation
  *      collapses each task to <= depth x width rows, so the shuffle
  *      carries a few thousand rows regardless of corpus size.
  *   2. PROBE: the tiny counter relation broadcasts back onto the item
  *      stream; an occurrence survives iff its minimum seeded bucket
  *      count clears the threshold. CMS counters only ever OVER-estimate
  *      (collisions add, never subtract), so survivors are a superset of
  *      the true heavy hitters — no false negatives, ever.
  *   3. VERIFY: exact groupBy-count over surviving occurrences only,
  *      re-filtered on the true count. At scale this is the only
  *      vocabulary-keyed shuffle, and it carries just the candidate
  *      tokens — the long tail (most of a web corpus's vocabulary by
  *      item count) never reaches an exchange.
  *
  * The result is therefore EXACT (deterministic, oracle-checkable
  * against a plain GROUP BY ... HAVING), while the plan stays sketch-
  * shaped. Everything is codegen'd built-ins — the seeded hashes are the
  * md5-affine family shared with MinHash (engine-portable, no JVM
  * hashCode dependence).
  *
  * Width/depth defaults suit corpora where heavy hitters are ~1e-4 of
  * occurrences; at 100 TB raise `width` (counter table is depth x width
  * x 16 bytes — 1 M counters is still a trivially broadcastable 16 MB).
  */
object HeavyHitters {

  /** Candidate occurrences: input rows whose `itemCol` value's CMS
    * estimate clears `threshold`. Exposed for tests to pin the pruning
    * behavior; `exact` is the user API.
    */
  def candidates(
      items: DataFrame,
      itemCol: Column,
      threshold: Long,
      width: Int,
      depth: Int
  ): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2 (got $depth x $width)")
    // hash the CANONICAL rendering (NULL -> the "NULL" token): a raw NULL
    // item would hash to NULL buckets and be silently dropped by the
    // inner probe joins, breaking the exact-result contract. The NULL
    // group now shares counters with the literal string "NULL" — a pure
    // over-estimate, which the exact verify stage resolves; the final
    // groupBy keys on the ORIGINAL item value, so NULL comes back out as
    // its own group exactly like plain GROUP BY.
    val hashed = Fingerprint.canonical(itemCol)
    val withBuckets = items.select(
      itemCol.as("item") +:
        (0 until depth).map(i =>
          pmod(Fingerprint.seededLongHash(hashed, i), lit(width)).as(s"__hh_b$i")): _*
    )
    // CMS matrix: every occurrence contributes one count per seed row.
    // posexplode keeps it ONE aggregation (not `depth` passes over the
    // corpus); partial agg bounds the exchange at depth x width rows.
    val counters = withBuckets
      .select(posexplode(array((0 until depth).map(i => col(s"__hh_b$i")): _*)).as(Seq("__hh_seed", "__hh_bucket")))
      .groupBy(col("__hh_seed"), col("__hh_bucket"))
      .agg(count(lit(1)).as("__hh_c"))
    // probe: one broadcast hash join per seed (depth is 2-4; each join
    // is map-side against the <= width-row slice of the counter table)
    val probed = (0 until depth).foldLeft(withBuckets) { (df, i) =>
      val slice = counters
        .where(col("__hh_seed") === i)
        .select(col("__hh_bucket").as(s"__hh_k$i"), col("__hh_c").as(s"__hh_c$i"))
      df.join(broadcast(slice), col(s"__hh_b$i") === col(s"__hh_k$i"))
    }
    val cmsEstimate =
      if (depth == 1) col("__hh_c0")
      else least((0 until depth).map(i => col(s"__hh_c$i")): _*)
    probed.where(cmsEstimate >= threshold).select(col("item"))
  }

  /** Items occurring at least `threshold` times, with their EXACT
    * counts, as (item, n).
    */
  def exact(
      items: DataFrame,
      itemCol: Column,
      threshold: Long,
      width: Int = 8192,
      depth: Int = 3
  ): DataFrame =
    candidates(items, itemCol, threshold, width, depth)
      .groupBy(col("item"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
}
