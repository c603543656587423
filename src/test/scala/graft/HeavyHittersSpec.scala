package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

/** The CMS-prefiltered heavy-hitter operator's two contracts:
  * exactness (the sketch must never cost a true heavy hitter — CMS
  * over-estimates only) and pruning (on a skewed stream the candidate
  * stage must discard the long tail BEFORE the vocabulary shuffle —
  * that pruning is the entire 100 TB story).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: item_i appears ceil(N / (i+1)) times, i in [0, 200).
    * head items are heavy, the tail is a sea of near-singletons.
    */
  private def skewed(n: Int) = {
    val rows = for {
      i <- 0 until 200
      reps = math.max(1, n / (i + 1))
      _ <- 0 until reps
    } yield s"item_$i"
    rows.toDF("item").repartition(8)
  }

  test("exact: equals the plain groupBy-count result at every tested threshold") {
    val df = skewed(1000)
    for (t <- Seq(1L, 10L, 100L, 400L)) {
      val got = HeavyHitters
        .exact(df, col("item"), t, width = 64, depth = 3)
        .as[(String, Long)].collect().toMap
      val want = df.groupBy("item").agg(count(lit(1)).as("n"))
        .where(col("n") >= t).as[(String, Long)].collect().toMap
      assert(got == want, s"threshold $t: got ${got.size} items, want ${want.size}")
    }
  }

  test("exact: NULL items count as their own group, matching plain groupBy semantics") {
    val df = (Seq.fill(40)(Option.empty[String]) ++ Seq.fill(35)(Some("a")) ++
      Seq.fill(10)(Some("b")) ++ Seq.fill(30)(Some("NULL"))) // literal "NULL" collides in the sketch, not the result
      .toDF("item").repartition(4)
    val got = HeavyHitters.exact(df, col("item"), 25L, width = 64, depth = 3)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == Map(None -> 40L, Some("a") -> 35L, Some("NULL") -> 30L))
  }

  test("exact: narrow width (guaranteed collisions) still yields the exact answer") {
    val df = skewed(500)
    // width 4 << 200 items forces every counter to blend many items —
    // candidates inflate, but the exact verify must discard them all
    val got = HeavyHitters.exact(df, col("item"), 50L, width = 4, depth = 2)
      .as[(String, Long)].collect().toMap
    val want = df.groupBy("item").agg(count(lit(1)).as("n"))
      .where(col("n") >= 50).as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("candidates: superset of true heavy hitters, and prunes the tail on skewed data") {
    val df = skewed(1000)
    val t = 100L
    val candidateItems = HeavyHitters
      .candidates(df, col("item"), t, width = 1024, depth = 3)
      .distinct().as[String].collect().toSet
    val trueHh = df.groupBy("item").agg(count(lit(1)).as("n"))
      .where(col("n") >= t).select("item").as[String].collect().toSet
    assert(trueHh.subsetOf(candidateItems), "CMS prefilter lost a true heavy hitter")
    // with 1024 counters over 200 items, collisions are rare — the
    // candidate set must be far closer to the 10 true heavy hitters
    // than to the 200-item vocabulary
    assert(candidateItems.size <= trueHh.size + 20,
      s"prefilter kept ${candidateItems.size} of 200 items for ${trueHh.size} true heavy hitters")
  }

  test("plan: counter build is partially aggregated and probe joins broadcast") {
    val df = skewed(200)
    val plan = HeavyHitters.exact(df, col("item"), 20L, width = 64, depth = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probe must broadcast the counter slices:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"counter probe must never sort-merge:\n$plan")
  }

  test("plan: the depth counter slices reuse ONE counter-build exchange, not depth rebuilds") {
    val df = skewed(200)
    val out = HeavyHitters.exact(df, col("item"), 20L, width = 64, depth = 3)
    out.collect() // finalize THIS DataFrame's adaptive plan (reuse appears post-execution)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedSubquery") ||
      plan.contains("TableCacheQueryStage") || plan.contains("reuse"),
      s"per-seed probe slices must reuse the counter-build exchange:\n$plan")
  }
}
