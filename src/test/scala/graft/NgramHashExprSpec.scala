package graft

import graft.operators.ApproxDedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Pins the native `graft_ngram_hashes` kernel to the string-shingle
  * pipeline it replaces inside the Jaccard operator: same set SIZES and
  * same pairwise INTERSECTION counts (what Jaccard is computed from) on
  * corpus documents — collision-free hashing preserves both — plus the
  * short-doc/empty/null edge semantics.
  */
class NgramHashExprSpec extends SparkSpec {
  import spark.implicits._

  private val N = 3

  test("per-doc distinct shingle-hash count equals distinct string-shingle count") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet").limit(200)
    val both = docs
      .withColumn("__toks", TextFunctions.tokens(col("text")))
      .where(size(col("__toks")) >= N)
      .select(
        col("doc_id"),
        size(array_distinct(call_function("graft_ngram_hashes", col("__toks"), lit(N))))
          .as("hashed"),
        size(array_distinct(ApproxDedup.shinglesOfTokens(col("__toks"), N))).as("strings")
      )
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getInt(1) == r.getInt(2), s"doc ${r.get(0)}"))
  }

  test("pairwise intersection counts match the string pipeline (jaccard inputs)") {
    // construct overlapping docs with known shared windows
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d x y z"),
      (3L, "q w e r t a b"),
      (4L, "a b c d e f g") // exact dup of 1
    ).toDF("id", "text")
    def setsOf(c: org.apache.spark.sql.Column) =
      docs
        .withColumn("__toks", TextFunctions.tokens(col("text")))
        .select(col("id"), array_sort(array_distinct(c)).as("sh"))
    val h = setsOf(call_function("graft_ngram_hashes", col("__toks"), lit(N)))
    val s = setsOf(ApproxDedup.shinglesOfTokens(col("__toks"), N))
    def inter(df: org.apache.spark.sql.DataFrame) =
      df.as("a")
        .crossJoin(df.select(col("id").as("id_b"), col("sh").as("sh_b")))
        .where(col("id") < col("id_b"))
        .select(
          col("id"),
          col("id_b"),
          size(array_intersect(col("sh"), col("sh_b"))).as("i")
        )
        .orderBy("id", "id_b")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq
    assert(inter(h) == inter(s))
  }

  test("short docs yield empty; null array yields null; n=1 hashes every token") {
    val df = Seq(
      (1L, Seq("a", "b")), // 2 tokens < n=3
      (2L, Seq("a", "b", "c", "d"))
    ).toDF("id", "toks")
      .select(col("id"), call_function("graft_ngram_hashes", col("toks"), lit(3)).as("h"))
      .orderBy("id")
      .collect()
    assert(df(0).getSeq[Long](1).isEmpty)
    assert(df(1).getSeq[Long](1).length == 2)

    val nul = Seq(Tuple1(null.asInstanceOf[Seq[String]]))
      .toDF("toks")
      .select(call_function("graft_ngram_hashes", col("toks"), lit(3)).as("h"))
      .collect()
    assert(nul(0).isNullAt(0))

    val uni = Seq(Tuple1(Seq("a", "b", "a")))
      .toDF("toks")
      .select(call_function("graft_ngram_hashes", col("toks"), lit(1)).as("h"))
      .collect()
    val hs = uni(0).getSeq[Long](0)
    assert(hs.length == 3 && hs(0) == hs(2) && hs(0) != hs(1))
  }
}
