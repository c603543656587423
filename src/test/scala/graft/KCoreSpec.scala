package graft

import graft.operators.KCore
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Reference synchronous peel, in memory. */
  private def naive(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = Int.MaxValue)
      : Map[Long, Int] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      if (a != b) {
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
      }
    }
    var alive = adj.keySet.toSet
    val out = scala.collection.mutable.Map.empty[Long, Int]
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      val drop = alive.filter(n => adj(n).count(alive) < k)
      if (drop.isEmpty) done = true
      else { drop.foreach(out(_) = round); alive = alive -- drop }
    }
    alive.foreach(out(_) = 0)
    out.toMap
  }

  private def run(edges: Seq[(Long, Long)], k: Long, maxRounds: Option[Int] = None,
      dir: Option[String] = None) =
    KCore.peel(edges.toDF("src", "dst"), k, maxRounds, dir)
      .as[(Long, Int)].collect().toMap

  test("peel rounds on a crafted onion: star periphery, path, clique core") {
    // K5 clique (1..5) + a path 5-6-7 + leaf 8 on 7
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val edges = clique ++ Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val got = run(edges, 2)
    // round 1 removes leaf 8 (deg 1); round 2 removes 7 (now deg 1);
    // round 3 removes 6; clique survives (all deg >= 4 inside)
    assert(got === Map(8L -> 1, 7L -> 2, 6L -> 3, 1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0))
    assert(got === naive(edges, 2))
  }

  test("uncapped fixpoint equals the naive peel on a messy random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    for (k <- Seq(2, 5, 9)) {
      assert(run(edges, k) === naive(edges, k), s"k=$k")
    }
  }

  test("maxRounds caps identically to the naive synchronous cap") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val capped = run(edges, 6, maxRounds = Some(2))
    assert(capped === naive(edges, 6, maxRounds = 2))
    // a capped run marks late-round removals as survivors (round 0)
    val full = run(edges, 6)
    assert(capped.count(_._2 == 0) >= full.count(_._2 == 0))
  }

  test("k above the max degree removes everything in round 1; self-loops/dups ignored") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L))
    assert(run(edges, 100) === Map(1L -> 1, 2L -> 1, 3L -> 1))
    // self-loop must not count toward degree: node 1 has true degree 1
    assert(run(edges, 2) === naive(edges, 2))
  }

  test("incremental and reaggregate degree plans are result-identical") {
    // the round-14 A/B lever: same peel, two physical degree
    // strategies — every (k, cap) combination must agree exactly
    val rnd = new scala.util.Random(19)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val df = edges.toDF("src", "dst")
    for ((k, cap) <- Seq((2L, None), (5L, None), (80L, Some(4)))) {
      val inc = KCore.peel(df, k, cap).as[(Long, Int)].collect().toMap
      val re  = KCore.peel(df, k, cap, plan = KCore.Plan.Reaggregate)
        .as[(Long, Int)].collect().toMap
      assert(inc === re, s"k=$k cap=$cap")
      assert(inc === naive(edges, k.toInt, cap.getOrElse(Int.MaxValue)), s"k=$k cap=$cap vs naive")
    }
  }

  test("deep peel with a tiny collapse threshold equals the naive peel") {
    // a path graph at k=2 peels from both ends — ~n/2 rounds, the
    // pathological depth the deferred-union collapse exists for.
    // collapseEvery=3 forces many collapses; the balanced union and
    // the collapse are capacity knobs, never semantics knobs.
    val path = (1L until 24L).map(i => (i, i + 1))
    val got = KCore.peel(path.toDF("src", "dst"), 2, collapseEvery = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === naive(path, 2))
    assert(got.values.max === 12) // genuinely deep: 12 peel rounds
  }

  test("reliable checkpoint variant returns identical rounds") {
    val rnd = new scala.util.Random(3)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val local = run(edges, 4)
    val reliable = run(edges, 4, dir = Some(tempDir("kcore_ckpt")))
    assert(local === reliable)
  }
}
