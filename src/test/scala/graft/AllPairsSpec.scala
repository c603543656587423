package graft

import graft.operators.AllPairs
import org.apache.spark.sql.functions._

/** Differential contract for the prefix-filtered all-pairs join: the
  * result must equal the NAIVE all-pairs threshold join exactly — the
  * prefix index and length filter are performance devices and any
  * false negative they introduced would show here.
  */
class AllPairsSpec extends SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[(Long, Seq[String])], num: Int, den: Int) = {
    val sets = rows.map { case (id, es) => id -> es.distinct.toSet }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if ia < ib
      inter = (sa intersect sb).size
      uni = (sa union sb).size
      if inter * den >= uni * num
    } yield (ia, ib, inter.toLong, uni.toLong)).toSet
  }

  private def run(rows: Seq[(Long, Seq[String])], num: Int, den: Int) =
    AllPairs
      .jaccardPairs(rows.toDF("id", "es"), "id", "es", num, den)
      .as[(Long, Long, Long, Long)]
      .collect()
      .toSet

  test("equals the naive threshold join on random set corpora, several thresholds") {
    val r = new java.util.Random(23)
    val vocab = (0 until 40).map(i => s"e$i")
    val rows = (1L to 120L).map { id =>
      val n = r.nextInt(12) + 1
      id -> Seq.fill(n)(vocab(r.nextInt(vocab.length)))
    }
    for ((num, den) <- Seq((3, 10), (1, 2), (7, 10), (9, 10))) {
      val got = run(rows, num, den)
      val want = naive(rows, num, den)
      assert(got == want, s"mismatch at t=$num/$den: extra=${got -- want} missing=${want -- got}")
      assert(want.nonEmpty || num >= 7, s"degenerate fixture at t=$num/$den")
    }
  }

  test("threshold 1/1 returns exactly the equal-set pairs") {
    val rows = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("c", "b", "a", "a")), // same set, duplicates deduped
      (3L, Seq("a", "b")),
      (4L, Seq.empty[String]) // empty sets drop
    )
    assert(run(rows, 1, 1) == Set((1L, 2L, 3L, 3L)))
  }

  private def naiveContain(rows: Seq[(Long, Seq[String])], num: Int, den: Int) = {
    val sets = rows.map { case (id, es) => id -> es.distinct.toSet }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if ia != ib
      inter = (sa intersect sb).size
      if inter * den >= sa.size * num
    } yield (ia, ib, inter.toLong, sa.size.toLong, sb.size.toLong)).toSet
  }

  private def runContain(rows: Seq[(Long, Seq[String])], num: Int, den: Int) =
    AllPairs
      .containmentPairs(rows.toDF("id", "es"), "id", "es", num, den)
      .as[(Long, Long, Long, Long, Long)]
      .collect()
      .toSet

  test("containmentPairs equals the naive directed containment join, several thresholds") {
    val r = new java.util.Random(31)
    val vocab = (0 until 40).map(i => s"e$i")
    val rows = (1L to 100L).map { id =>
      val n = r.nextInt(14) + 1
      id -> Seq.fill(n)(vocab(r.nextInt(vocab.length)))
    }
    for ((num, den) <- Seq((1, 2), (7, 10), (9, 10), (1, 1))) {
      val got = runContain(rows, num, den)
      val want = naiveContain(rows, num, den)
      assert(got == want, s"mismatch at t=$num/$den: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("containment catches the quote-wrapped pair symmetric Jaccard misses") {
    // small doc fully embedded in a big page: Jaccard 5/50 = 0.1 fails
    // a 0.3 threshold, containment 5/5 = 1.0 passes 0.9
    val small = (1 to 5).map(i => s"q$i")
    val big   = small ++ (1 to 45).map(i => s"page$i")
    val rows  = Seq((1L, small), (2L, big))
    assert(run(rows, 3, 10).isEmpty, "Jaccard must miss the asymmetric pair")
    assert(runContain(rows, 9, 10) == Set((1L, 2L, 5L, 5L, 50L)),
      "containment must flag small-inside-big, in that direction only")
  }

  test("skewed corpus: one corpus-hot element never forces candidates on its own") {
    // 60 sets all share 'hot' but are otherwise disjoint -> no pair
    // reaches 1/2; plus one true near-dup pair
    val rows = (1L to 60L).map(i => i -> Seq("hot", s"x$i", s"y$i", s"z$i")) ++
      Seq(100L -> Seq("p", "q", "r", "s"), 101L -> Seq("p", "q", "r", "t"))
    val got = run(rows, 1, 2)
    assert(got == Set((100L, 101L, 3L, 5L)))
  }
}
