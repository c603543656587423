package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Contracts for the JL Rademacher projection: the sign matrix is a
  * pure function of (salt, i, j); the projection plan is a narrow map
  * stage (zero exchanges); and projected squared distances track
  * original squared distances within a loose JL distortion envelope —
  * the property that makes the 16-dim vectors usable for ANN
  * prefiltering at all.
  */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val K = 16

  test("sign matrix is deterministic, ±1, and salt-sensitive") {
    val a = VectorFunctions.rademacherSigns(Dim, K, "jl")
    val b = VectorFunctions.rademacherSigns(Dim, K, "jl")
    val c = VectorFunctions.rademacherSigns(Dim, K, "jl2")
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v == 1.0 || v == -1.0))
    // roughly balanced signs (md5 parity is uniform)
    val plus = a.flatten.count(_ == 1.0)
    assert(plus > Dim * K / 3 && plus < Dim * K * 2 / 3, s"$plus of ${Dim * K} positive")
  }

  test("projection is a narrow map stage: zero exchanges in the plan") {
    val df = (1L to 10L).map(i => (i, Array.fill(Dim)((i % 7).toDouble))).toDF("id", "v")
    val plan = VectorFunctions
      .withRandomProjection(df, "v", "p", Dim, K, "jl")
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Exchange"), s"projection plan shuffles:\n$plan")
  }

  test("projected distances respect a loose JL distortion envelope") {
    val r = new java.util.Random(7)
    val rows = (1L to 80L).map(i => (i, Array.fill(Dim)(r.nextGaussian())))
    val proj = VectorFunctions
      .withRandomProjection(rows.toDF("id", "v"), "v", "p", Dim, K, "jl")
      .select(col("id"), col("p"))
      .as[(Long, Seq[Double])]
      .collect()
      .toMap
    val orig = rows.toMap
    def d2(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // E[||P(x-y)||^2] = dim_out * ||x-y||^2 for ±1 rows; per-pair noise
    // is wide at k=16, so assert the MEDIAN ratio lands near k with a
    // generous band rather than per-pair bounds
    val ratios = for {
      i <- 1L to 40L
      j = i + 40L
    } yield d2(proj(i), proj(j)) / d2(orig(i).toSeq, orig(j).toSeq)
    val median = ratios.sorted.apply(ratios.size / 2)
    assert(
      median > K * 0.6 && median < K * 1.6,
      s"median distortion ratio $median far from k=$K"
    )
  }
}
