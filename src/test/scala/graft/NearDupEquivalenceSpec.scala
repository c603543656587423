package graft

import graft.operators.ApproxDedup
import org.apache.spark.sql.functions._

/** Randomized equivalence proofs for the bucketed near-dup operators:
  * on random corpora (seeded, reproducible) the optimized pipelines must
  * emit EXACTLY the pairs a brute-force all-pairs reference emits —
  * the prefix filter (recall proof for a fixed threshold) and the
  * banded-SimHash pigeonhole (maxHamming < nBands) are exact, not
  * approximate, so any divergence is a bug, not noise.
  */
class NearDupEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  /** Random docs over a tiny vocabulary so shingle overlap is common. */
  private def randomCorpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    (1L to nDocs).map { id =>
      val len = 3 + rnd.nextInt(8)
      id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
  }

  test("ngramJaccardPairs equals brute-force all-pairs Jaccard on random corpora") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val docs = randomCorpus(seed, 40).toDF("id", "text")
      val fast = ApproxDedup
        .ngramJaccardPairs(docs, "id", col("text"), n = 3, threshold = 0.3)
        .as[(Long, Long, Double)]
        .collect()
        .toSet

      // brute force: hashed shingle sets (same kernel), full cross join
      val sets = docs
        .withColumn("__toks", split(col("text"), " "))
        .where(size(col("__toks")) >= 3)
        .select(
          col("id"),
          array_sort(array_distinct(call_function("graft_ngram_hashes", col("__toks"), lit(3))))
            .as("sh")
        )
      val brute = sets
        .as("a")
        .crossJoin(sets.select(col("id").as("id_b"), col("sh").as("sh_b")))
        .where(col("id") < col("id_b"))
        .select(
          col("id"),
          col("id_b"),
          (size(array_intersect(col("sh"), col("sh_b"))).cast("double") /
            size(array_union(col("sh"), col("sh_b"))).cast("double")).as("j")
        )
        .where(col("j") >= 0.3)
        .as[(Long, Long, Double)]
        .collect()
        .toSet

      assert(fast == brute, s"seed $seed: prefix filter lost or invented pairs")
    }
  }

  test("simhashNearDupPairs equals brute-force Hamming on random corpora") {
    for (seed <- Seq(7L, 8L)) {
      val docs = randomCorpus(seed, 40).toDF("id", "text")
      val fast = ApproxDedup
        .simhashNearDupPairs(docs, "id", col("text"), nBits = 16, nBands = 4, maxHamming = 3)
        .as[(Long, Long, Int)]
        .collect()
        .toSet

      val sigs = ApproxDedup.withSimhash(docs, col("text"), 16, "sh")
      val brute = sigs
        .select(col("id"), col("sh"))
        .as("a")
        .crossJoin(sigs.select(col("id").as("id_b"), col("sh").as("sh_b")))
        .where(col("id") < col("id_b"))
        .withColumn("h", ApproxDedup.hammingDistance(col("sh"), col("sh_b"), 16))
        .where(col("h") <= 3)
        .select(col("id"), col("id_b"), col("h"))
        .as[(Long, Long, Int)]
        .collect()
        .toSet

      assert(fast == brute, s"seed $seed: banding lost or invented pairs")
    }
  }
}
