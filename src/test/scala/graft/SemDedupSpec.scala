package graft

import graft.functions.VectorFunctions
import graft.operators.{IvfCentroids, SemDedup}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Semantic-dedup contract: the greedy lowest-id epsilon-ball sweep
  * inside coarse-quantizer cells, re-derived brute-force in the test,
  * plus the single-shuffle plan shape the scale argument rests on.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Tau = 0.35

  private def emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("pruned iff a lower-id vector in the same cell is >= tau close") {
    val got = SemDedup
      .prune(emb, "vec_id", "embedding", IvfCentroids.cells, Tau)
      .as[(Long, Int, Boolean)]
      .collect()
      .map { case (id, cell, pruned) => id -> (cell, pruned) }
      .toMap

    // brute-force reference: argmax-dot assignment + all-pairs cosine
    val rows = emb
      .select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("v"))
      .as[(Long, Seq[Double])]
      .collect()
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.lazyZip(b).map(_ * _).sum
    def cell(v: Seq[Double]): Int = {
      val ds = IvfCentroids.cells.map(c => dot(v, c.toSeq))
      ds.indexOf(ds.max)
    }
    val byCell = rows.groupBy { case (_, v) => cell(v) }
    val expectPruned = byCell.values.flatMap { xs =>
      val sorted = xs.sortBy(_._1)
      sorted.flatMap { case (id, v) =>
        val nv = math.sqrt(dot(v, v))
        val dup = sorted.exists { case (lo, lv) =>
          lo < id && {
            val c = dot(v, lv) / (nv * math.sqrt(dot(lv, lv)))
            c >= Tau
          }
        }
        if (dup) Some(id) else None
      }
    }.toSet

    assert(got.size == rows.length)
    rows.foreach { case (id, v) =>
      assert(got(id)._1 == cell(v), s"cell mismatch for $id")
      assert(got(id)._2 == expectPruned.contains(id), s"pruned mismatch for $id")
    }
    // the fixture actually exercises both branches
    assert(expectPruned.nonEmpty && expectPruned.size < rows.length)
  }

  test("duplicate neighborhood keeps exactly the lowest id") {
    // three mutually-near vectors + one far: ids 2,3 prune against 1,
    // 9 survives alone in its neighborhood
    val d = 64
    def vec(seed: Int, eps: Double) =
      Array.tabulate(d)(i => (if (i == seed % d) 1.0 else 0.001) + eps * i / d)
    val df = Seq(
      (1L, vec(3, 0.0)),
      (2L, vec(3, 1e-4)),
      (3L, vec(3, 2e-4)),
      (9L, Array.tabulate(d)(i => if (i == 40) -1.0 else 0.0))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", transform(col("embedding"), _.cast("float")))

    val out = SemDedup
      .prune(df, "vec_id", "embedding", IvfCentroids.cells, 0.99)
      .as[(Long, Int, Boolean)]
      .collect()
      .map(r => r._1 -> r._3)
      .toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 9L -> false))
  }

  test("plan: exactly one shuffle feeds the pair kernel (the cell groupBy)") {
    val plan = SemDedup
      .prune(emb, "vec_id", "embedding", IvfCentroids.cells, Tau)
      .queryExecution.executedPlan
    // shuffles: cell groupBy (+ its final agg), pruned-id distinct, and
    // the left join back; the corpus-side scan itself must stay narrow —
    // no shuffle may carry the full vector payload twice. Cheap proxy
    // pinned here: total exchanges bounded (no plan drift into e.g. a
    // sort-merge self-join materializing pairs).
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size <= 4, s"expected <= 4 exchanges, got:\n$plan")
  }
}
