package graft

import graft.functions.JaroWinklerKernel
import graft.operators.EntityResolution
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the native `graft_jaro_winkler` kernel to (a) the published
  * reference values the DuckDB builtin was probed against — exact
  * doubles, no tolerance, since the oracle gate compares raw bits — and
  * (b) an independent in-spec reference implementation on random ASCII
  * strings; then pins the blocked-pair and best-match-election operators
  * to their naive formulations.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: index-set formulation (collect match index
    * pairs greedily, then count out-of-order matched pairs) rather than
    * the kernel's two boolean work arrays.
    */
  private def refJw(a: String, b: String): Double = {
    def jaro(s1: String, s2: String): Double = {
      if (s1.isEmpty || s2.isEmpty) return 0.0
      if (s1 == s2) return 1.0
      val window = math.max(math.max(s1.length, s2.length) / 2 - 1, 0)
      val taken = collection.mutable.Set[Int]()
      val pairs = collection.mutable.ArrayBuffer[(Int, Int)]()
      for (i <- s1.indices) {
        val cand = (math.max(0, i - window) until math.min(i + window + 1, s2.length))
          .find(j => !taken.contains(j) && s1(i) == s2(j))
        cand.foreach { j => taken += j; pairs += ((i, j)) }
      }
      val m = pairs.size
      if (m == 0) return 0.0
      // both sequences of matched chars, in their own string order
      val aChars = pairs.map(p => s1(p._1))
      val bChars = pairs.sortBy(_._2).map(p => s2(p._2))
      val t = aChars.zip(bChars).count { case (x, y) => x != y } / 2
      (m.toDouble / s1.length + m.toDouble / s2.length + (m - t).toDouble / m) / 3.0
    }
    val j = jaro(a, b)
    if (j > 0.7) {
      val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches the DuckDB-probed reference values bit-exactly") {
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("", "abc", 0.0),
      ("abc", "", 0.0),
      ("", "", 0.0), // DuckDB convention: empty-vs-anything is 0, even empty-empty
      ("a", "a", 1.0),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("hello world", "hello wrold", 0.9818181818181818),
      ("ab", "ba", 0.0),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("abcdexxxx", "abcdeyyyy", 0.8222222222222222),
      ("aluminium bronze", "aluminum bronze", 0.9874999999999999),
      ("promo burnished copper", "promo burnished coper", 0.990909090909091)
    )
    cases.foreach { case (a, b, expected) =>
      assert(
        java.lang.Double.doubleToLongBits(jw(a, b)) ==
          java.lang.Double.doubleToLongBits(expected),
        s"jw($a, $b) = ${jw(a, b)}, expected $expected"
      )
    }
  }

  test("kernel equals the independent reference on random ASCII strings") {
    val r = new java.util.Random(41)
    val alphabet = "abcdefg "
    def rand(n: Int): String = (0 until n).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
    (1 to 2000).foreach { _ =>
      val a = rand(r.nextInt(16))
      val b = rand(r.nextInt(16))
      assert(
        java.lang.Double.doubleToLongBits(jw(a, b)) ==
          java.lang.Double.doubleToLongBits(refJw(a, b)),
        s"kernel vs reference diverged on ($a, $b)"
      )
    }
  }

  test("expression null-propagates and runs inside codegen") {
    val df = Seq(
      (1L, "martha", "marhta"),
      (2L, null.asInstanceOf[String], "x"),
      (3L, "x", null.asInstanceOf[String])
    ).toDF("id", "a", "b")
      .select(col("id"), call_function("graft_jaro_winkler", col("a"), col("b")).as("s"))
      .orderBy("id")
      .collect()
    assert(df(0).getDouble(1) == 0.9611111111111111)
    assert(df(1).isNullAt(1) && df(2).isNullAt(1))
  }

  test("blockedPairs equals the naive blocked cross join") {
    val rows = Seq(
      (1L, "small ring", "ring"),
      (2L, "small rng", "ring"),
      (3L, "smoll ring", "ring"),
      (4L, "red widget", "widget"),
      (5L, "red widgett", "widget"),
      (6L, "blue bolt", "bolt")
    ).toDF("id", "txt", "blk")
    val got = EntityResolution
      .blockedPairs(rows, col("id"), col("txt"), col("blk"), minSim = 0.9)
      .select("id_a", "id_b", "sim")
      .as[(Long, Long, Double)]
      .collect()
      .toSet
    val naive = rows
      .as("a")
      .join(rows.as("b"), col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(
        col("a.id"),
        col("b.id"),
        call_function("graft_jaro_winkler", col("a.txt"), col("b.txt")).as("s")
      )
      .as[(Long, Long, Double)]
      .collect()
      .filter(_._3 >= 0.9)
      .toSet
    assert(got == naive && got.nonEmpty)
  }

  test("linkBest elects max score with ties to the lowest right id") {
    val left = Seq((10L, "small ring", "small")).toDF("id", "txt", "blk")
    // two right rows with IDENTICAL text (equal scores) and one lower-scoring
    val right = Seq(
      (7L, "small rin", "small"),
      (5L, "small rin", "small"),
      (9L, "small gizmo", "small")
    ).toDF("id", "txt", "blk")
    val out = EntityResolution
      .linkBest(
        left, right,
        col("id"), col("txt"), col("id"), col("txt"),
        col("blk"), col("blk"), minSim = 0.5)
      .select("left_id", "right_id")
      .as[(Long, Long)]
      .collect()
    assert(out.toSeq == Seq((10L, 5L)))
  }
}
