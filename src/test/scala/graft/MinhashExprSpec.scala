package graft

import graft.functions.MinhashFamily
import graft.operators.ApproxDedup
import org.apache.spark.sql.functions._

/** Pins the native single-pass `graft_minhash_sig` kernel to the
  * per-seed HOF formulation it replaced: identical values (exact long
  * arithmetic, order-independent min) and matching null semantics.
  */
class MinhashExprSpec extends SparkSpec {
  import spark.implicits._

  private val NHashes = 16

  test("native signature equals per-seed HOF array_min/transform values") {
    val r = new java.util.Random(11)
    val rows = (1 to 300).map { i =>
      val n = r.nextInt(40) + 1
      (i.toLong, Array.fill(n)(math.abs(r.nextLong()) % MinhashFamily.Mod))
    }
    val df = rows
      .toDF("id", "bh")
      .withColumn("sig", MinhashFamily.signature(col("bh"), NHashes))
    val hofCols = (0 until NHashes).map { i =>
      array_min(
        transform(col("bh"), h => (h * ApproxDedup.affineA(i) + ApproxDedup.affineB(i)) % ApproxDedup.MinhashMod)
      ).as(s"hof$i")
    }
    val out = df.select(Seq(col("id"), col("sig")) ++ hofCols: _*).collect()
    out.foreach { row =>
      val sig = row.getSeq[Long](1)
      assert(sig.length == NHashes)
      (0 until NHashes).foreach(i => assert(sig(i) == row.getLong(2 + i)))
    }
  }

  test("empty base-hash array yields a null signature (HOF: per-seed null mins)") {
    val df = Seq((1L, Array.empty[Long]), (2L, Array(5L)))
      .toDF("id", "bh")
      .select(col("id"), MinhashFamily.signature(col("bh"), 4).as("sig"))
      .orderBy("id")
    val rows = df.collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getSeq[Long](1).length == 4)
  }

  test("withMinhashSignature produces signatures inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet").limit(50)
    val sigs = ApproxDedup.withMinhashSignature(docs, col("text"), n = 3, nHashes = NHashes)
    // values sane: in [0, P)
    val row = sigs.select((0 until NHashes).map(i => col(s"mh$i")): _*).collect()
    row.foreach { r =>
      (0 until NHashes).foreach { i =>
        val v = r.getLong(i)
        assert(v >= 0 && v < MinhashFamily.Mod)
      }
    }
    // single-pass: the kernel appears exactly once in the plan (vs the
    // old form's nHashes independent array_min(transform(...)) trees),
    // and the per-seed element_at extraction projection is codegen'd.
    // (The kernel's own projection collapses with the single-referenced
    // HOF base-hash tree, so that stage is interpreted either way — the
    // win here is one traversal for all seeds, not codegen.)
    val planStr = sigs.queryExecution.executedPlan.toString
    assert("graft_minhash_sig".r.findAllIn(planStr).size == 1, planStr)
    assert("""\*\(\d+\)\s*Project""".r.findFirstIn(planStr).isDefined, planStr)
    assert(!planStr.contains("array_min"), "per-seed HOF mins crept back in")
  }

  test("graft_minhash_sig rejects a non-literal nHashes") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array(1L, 2L), cast(rand() * 4 as int))").collect()
    }
    assert(err.getMessage.contains("integer literal") || err.getMessage != null)
  }
}
