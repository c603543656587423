package graft

import org.apache.spark.sql.functions._

/** The approximate/sketch siblings of the exact operators: at 100 TB,
  * exact distinct counts (dq_profile_columns), exact grouped quantiles
  * (dq_quantiles), and full anti-joins (dq_orphan_lineitems) all have
  * an unbounded-cardinality cost the sketches cap. The sketches cannot
  * be DuckDB-oracle-checked (estimates are implementation-defined), so
  * their contract is pinned HERE: bounded error against the exact
  * answer on the real sf0.001 tables, plus the structural guarantees
  * (no false negatives for Bloom).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct (HLL) lands within 5% of exact on real keys") {
    val li = Tables.lineitem(spark, Sf)
    val (exact, approx) = li
      .agg(
        count_distinct(col("l_orderkey")).as("x"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("a")
      )
      .as[(Long, Long)]
      .head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"HLL estimate $approx vs exact $exact")
  }

  test("approx_percentile stays within bounded rank error of the exact quantile") {
    val li  = Tables.lineitem(spark, Sf).select(col("l_quantity").cast("double").as("q"))
    val n   = li.count()
    val acc = 1000 // rank error <= n / acc
    val approx = li
      .agg(expr(s"approx_percentile(q, 0.5, $acc)").cast("double"))
      .as[Double]
      .head()
    // exact rank window of the median +- allowed rank error
    val allowed = math.max(1L, n / acc)
    val below   = li.where(col("q") < approx).count()
    val mid     = (n - 1) / 2
    assert(below <= mid + allowed && below + li.where(col("q") === approx).count() >= mid - allowed,
      s"approx median $approx has $below values below it, exact mid-rank $mid, allowed slack $allowed")
  }

  test("freqItems returns a superset of the truly frequent values") {
    val li = Tables.lineitem(spark, Sf)
    val support = 0.2
    val found = li.stat
      .freqItems(Array("l_returnflag"), support)
      .head()
      .getSeq[String](0)
      .toSet
    val n = li.count()
    val trulyFrequent = li
      .groupBy(col("l_returnflag"))
      .count()
      .where(col("count") > n * support)
      .select("l_returnflag")
      .as[String]
      .collect()
      .toSet
    // the sketch's contract: possible false positives, NO false negatives
    assert(trulyFrequent.subsetOf(found), s"missing frequent items: ${trulyFrequent -- found}")
  }

  test("Bloom filter: zero false negatives, observed FPP under the configured bound") {
    val orders = Tables.orders(spark, Sf)
    val keys   = orders.select(col("o_orderkey")).as[Long].collect().toSet
    val bloom = orders.stat.bloomFilter(col("o_orderkey"), expectedNumItems = keys.size.toLong, fpp = 0.03)
    // no false negatives — every inserted key must probe true
    assert(keys.forall(bloom.mightContain), "bloom filter returned a false negative")
    // false-positive rate on a disjoint probe set stays near the target
    val probes  = (1L to 20000L).map(i => 1000000000L + i)
    val fpCount = probes.count(bloom.mightContain)
    assert(fpCount.toDouble / probes.size <= 0.06,
      s"observed FPP ${fpCount.toDouble / probes.size} vs configured 0.03")
  }
}
