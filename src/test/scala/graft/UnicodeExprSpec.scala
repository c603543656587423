package graft

import org.apache.spark.sql.functions._

class UnicodeExprSpec extends SparkSpec {
  import spark.implicits._

  private def uni(c: org.apache.spark.sql.Column, mode: String) =
    call_function("graft_unicode", c, lit(mode))

  test("nfc composes combining marks; nfkc additionally folds compat chars") {
    val df = Seq(
      "café",          // NFD -> café (4 chars)
      "café",           // already NFC
      "ａｂｃ",  // full-width abc
      "ﬁne"             // ﬁ ligature + "ne"
    ).toDF("s")
    val got = df
      .select(
        uni($"s", "nfc").as("nfc"),
        uni($"s", "nfkc").as("nfkc"),
        length(uni($"s", "nfc")).as("n_nfc")
      )
      .as[(String, String, Int)]
      .collect()
    assert(got(0) == (("café", "café", 4)))
    assert(got(1) == (("café", "café", 4)))
    // NFC keeps compatibility chars; NFKC folds them to ASCII
    assert(got(2)._1 == "ａｂｃ" && got(2)._2 == "abc")
    assert(got(3)._1 == "ﬁne" && got(3)._2 == "fine")
  }

  test("strip_accents folds accents from both composed and decomposed input") {
    val got = Seq("café", "café", "Zürich São ñino", "plain")
      .toDF("s")
      .select(uni($"s", "strip_accents"))
      .as[String]
      .collect()
    assert(got.toSeq == Seq("cafe", "cafe", "Zurich Sao nino", "plain"))
  }

  test("null in, null out; invalid mode rejected at resolution") {
    val got = Seq(Option.empty[String], Some("x"))
      .toDF("s")
      .select(uni($"s", "nfc"))
      .as[Option[String]]
      .collect()
    assert(got.toSeq == Seq(None, Some("x")))
    intercept[Exception] {
      Seq("x").toDF("s").select(uni($"s", "bogus")).collect()
    }
  }

  test("kernel stays inside whole-stage codegen") {
    // a local relation would be constant-folded away; range keeps a real
    // codegen stage whose generated code must host the kernel call
    val df = spark.range(3).select(uni(concat(lit("café"), $"id".cast("string")), "nfc").as("n"))
    // the `*(n)` prefix marks a WholeStageCodegen stage; the kernel's
    // Project must carry it (a CodegenFallback expression would break
    // the stage and render un-starred)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_unicode")), plan)
    assert(df.as[String].collect().toSeq == Seq("café0", "café1", "café2"))
  }
}
