package graft

import org.apache.spark.sql.functions._

/** Unit semantics of the native WordPiece kernel `graft_subword_counts`:
  * greedy LONGEST match, start-vs-continuation vocab split, char-level
  * UNK, degenerate inputs. Output is [n_pieces, n_unk, max_pieces_per_word].
  */
class SubwordExprSpec extends SparkSpec {
  import spark.implicits._

  private val Start = "scan tab val wind the a s t u e r y"
  private val Cont  = "le ue ow er an ry a s t u e r y n l"

  private def counts(words: Seq[String]): (Int, Int, Int) = {
    val r = Seq(Tuple1(words))
      .toDF("w")
      .select(call_function("graft_subword_counts", col("w"), lit(Start), lit(Cont)).as("c"))
      .collect()
      .head
      .getSeq[Int](0)
    (r(0), r(1), r(2))
  }

  test("greedy longest match picks the longest piece, not the first") {
    // "table" must be tab+##le (2), never t+a+b+l+e (5)
    assert(counts(Seq("table")) == ((2, 0, 2)))
    // "scan" is one start piece even though s/c/a/n singles exist
    assert(counts(Seq("scan")) == ((1, 0, 1)))
    // "window": wind + ##ow
    assert(counts(Seq("window")) == ((2, 0, 2)))
  }

  test("continuation pieces only match beyond word start") {
    // "ue" is continuation-only: as a whole word it must tokenize u + ##e
    assert(counts(Seq("ue")) == ((2, 0, 2)))
  }

  test("unmatched characters emit char-level UNK and keep metering") {
    // "query": q has no start piece -> UNK(q), then ##ue + ##ry
    assert(counts(Seq("query")) == ((3, 1, 3)))
    // fully unknown word: every char UNK ('z' absent from both vocabs)
    assert(counts(Seq("zz")) == ((2, 2, 2)))
  }

  test("empty and null words contribute nothing; counts sum across words") {
    assert(counts(Seq("")) == ((0, 0, 0)))
    assert(counts(Seq("table", "", "query")) == ((5, 1, 3)))
    val r = Seq(Tuple1(Seq[String](null, "scan")))
      .toDF("w")
      .select(call_function("graft_subword_counts", col("w"), lit(Start), lit(Cont)).as("c"))
      .collect()
      .head
      .getSeq[Int](0)
    assert(r == Seq(1, 0, 1))
  }

  test("null token array yields null") {
    val r = Seq(Tuple1(Option.empty[Seq[String]]))
      .toDF("w")
      .select(call_function("graft_subword_counts", col("w"), lit(Start), lit(Cont)).as("c"))
      .collect()
      .head
    assert(r.isNullAt(0))
  }

  test("kernel agrees with a reference implementation on corpus words") {
    val start = Start.split(" ").toSeq
    val cont  = Cont.split(" ").toSeq
    def ref(w: String): (Int, Int) = {
      var pos = 0; var np = 0; var nu = 0
      while (pos < w.length) {
        val table = (if (pos == 0) start else cont).filter(p => w.startsWith(p, pos))
        if (table.nonEmpty) pos += table.maxBy(_.length).length
        else { nu += 1; pos += 1 }
        np += 1
      }
      (np, nu)
    }
    val words = Tables
      .documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct()
      .as[String]
      .collect()
    words.foreach { w =>
      val (np, nu) = ref(w)
      assert(counts(Seq(w)) == ((np, nu, np)), s"kernel diverged on '$w'")
    }
  }
}
