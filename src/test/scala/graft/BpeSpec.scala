package graft

import graft.operators.{Bpe, BpeMerges}
import org.apache.spark.sql.functions._

/** BPE trainer + apply kernel: deterministic learning, the
  * one-pass-per-rule application contract, and shipped-artifact parity.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge is one left-to-right non-overlapping pass") {
    def ap(s: Seq[String], m: (String, String)) = Bpe.applyMerge(s.toArray, m).toSeq
    assert(ap(Seq("a", "a", "a"), ("a", "a")) == Seq("aa", "a"))
    assert(ap(Seq("a", "a", "a", "a"), ("a", "a")) == Seq("aa", "aa"))
    assert(ap(Seq("a", "b", "a", "b", "b"), ("a", "b")) == Seq("ab", "ab", "b"))
    assert(ap(Seq("x", "x", "y", "y"), ("x", "y")) == Seq("x", "xy", "y"))
    assert(ap(Seq("q"), ("a", "b")) == Seq("q"))
  }

  test("weighted trainer learns the frequency-ordered merges on a hand vocab") {
    // "aab"x3 + "ab"x2: pairs (a,a)=3, (a,b)=5 -> first merge (a,b);
    // then (a,ab)=3 is the only remaining pair
    val merges = Bpe.trainFromVocab(Seq("aab" -> 3L, "ab" -> 2L), nMerges = 2)
    assert(merges == Seq(("a", "b"), ("a", "ab")))
    assert(Bpe.tokenize("aab", merges) == Seq("aab"))
    assert(Bpe.tokenize("ab", merges) == Seq("ab"))
    // count ties break lexicographically: (a,b)=1 vs (b,a)=1 -> (a,b)
    assert(Bpe.trainFromVocab(Seq("ab" -> 1L, "ba" -> 1L), 1) == Seq(("a", "b")))
  }

  test("trainer stops early when no pairs remain") {
    assert(Bpe.trainFromVocab(Seq("ab" -> 1L), nMerges = 10) == Seq(("a", "b")))
  }

  test("LIVE retrain on the sf0.01 corpus equals the shipped BpeMerges artifact") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val live = Bpe.train(docs, col("text"), BpeMerges.NMerges)
    assert(live == BpeMerges.merges,
      s"trainer drifted from the shipped artifact:\n$live\nvs\n${BpeMerges.merges}")
  }

  test("native kernel agrees with the reference tokenizer on every corpus word") {
    val mergesLit = BpeMerges.merges.map { case (x, y) => s"$x\t$y" }.mkString("\n")
    val words = Tables
      .documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct()
      .as[String]
      .collect()
      .filter(_.nonEmpty)
    // ONE job for all words: per-word kernel rows vs the driver reference
    val got = words.toSeq
      .toDF("w")
      .select(col("w"),
        call_function("graft_bpe_counts", array(col("w")), lit(mergesLit)).as("c"))
      .as[(String, Seq[Int])]
      .collect()
      .toMap
    words.foreach { w =>
      val toks = Bpe.tokenize(w, BpeMerges.merges)
      val exp  = Seq(toks.size, toks.count(_.length > 1), toks.map(_.length).max)
      assert(got(w) == exp, s"kernel diverged on '$w': ${got(w)} vs $exp (pieces $toks)")
    }
  }
}
