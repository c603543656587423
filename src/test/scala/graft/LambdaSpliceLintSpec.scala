package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source lint: no expensive expression spliced into a higher-order
  * function lambda in src/main.
  *
  * A Spark HOF lambda (`transform`/`aggregate`/`filter`/`exists`/
  * `zip_with`) re-evaluates any expression subtree referenced in its
  * BODY once per element. Splicing `split(text)` / `tokens(text)` /
  * `md5(...)` into the body therefore re-runs it for every element —
  * O(n²) per document for shingling/n-gram shapes. This bit the repo
  * three times: round 2 (jaccard/minhash, ~100×, fixed by
  * `ApproxDedup.shinglesOfTokens`), and twice in round 11 when
  * rounds-9/10 operators skipped the discipline
  * (`Curation.importanceContrast` 46.8→8.3 s solo sf1,
  * `text_novelty_score` 39.9→6.15 s — tools/bench_ic_tokens_r11.json,
  * bench_novelty_r11.json). The rule: stage the array in its own
  * projected column and lambda over the ATTRIBUTE.
  *
  * Mechanics: scan every src/main .scala file for a HOF call whose
  * following 450 chars contain a lambda arrow and then one of the
  * expensive calls. Each hit must match a known-benign allowlisted
  * shape (whitespace-normalized prefix): hashing a LAMBDA-DERIVED
  * value is fine (the per-element work is intended), as is an
  * expensive expression in the HOF's ARRAY argument (evaluated once
  * per row, before the arrow). New hits fail with a pointer to the
  * staging discipline.
  */
class LambdaSpliceLintSpec extends AnyFunSuite {

  private val HofStart  = raw"(transform|aggregate|zip_with|exists)\(".r
  private val Expensive =
    raw"(?s)=>.{0,350}?(split\(|TextFunctions\.tokens\(|md5\(|seededLongHash\()".r

  /** Benign shapes, whitespace-normalized. Each entry documents WHY. */
  private val Allowed: Seq[(String, String)] = Seq(
    // Curation.importanceContrast: seededLongHash of the bigram built
    // from the LAMBDA-BOUND token attribute — one hash per bigram is
    // the operator's intended work; the token array itself is staged.
    "transform( sequence(lit(0), size(tk) - 2), i => (graft.functions.Fingerprint.seededLongHash(" ->
      "hash of lambda-derived bigram over a staged token attribute",
    // ApproxDedup.simhash: tokens(text) is the HOF's ARRAY argument
    // (evaluated once per row, before the arrow); the lambda hashes
    // the element variable.
    "transform(TextFunctions.tokens(text), t => Fingerprint.seededLongHash(t, 0))" ->
      "array argument evaluated once per row; lambda hashes the element",
    // TextFunctions.withRollingFingerprint: scaladoc COMMENT citing the
    // equivalent Column form the native kernel replaces.
    "transform(tokens, t => hexToLong(md5(t)) % RollMod) (Md5LongsSpec)" ->
      "scaladoc comment, not code"
  )

  private def norm(s: String): String = s.replaceAll("\\s+", " ")

  test("src/main has no new expensive-expression splice inside a HOF lambda") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val files = {
      val stream = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.filter(_.toString.endsWith(".scala")).toList
      } finally stream.close()
    }
    assert(files.nonEmpty, s"no sources found under $root — lint is scanning the wrong place")

    val offenders = files.flatMap { p =>
      val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      HofStart.findAllMatchIn(src).flatMap { m =>
        val seg = src.substring(m.start, math.min(src.length, m.start + 450))
        if (Expensive.findFirstIn(seg).isEmpty) None
        else {
          val n = norm(seg)
          if (Allowed.exists { case (prefix, _) => n.startsWith(norm(prefix)) }) None
          else {
            val line = src.substring(0, m.start).count(_ == '\n') + 1
            Some(s"$p:$line  ${n.take(120)}")
          }
        }
      }
    }
    assert(
      offenders.isEmpty,
      "expensive expression spliced into a HOF lambda (re-evaluated PER ELEMENT " +
        "— O(n²) per row; stage the array in its own projected column and " +
        "lambda over the attribute, see ApproxDedup.shinglesOfTokens / " +
        "PLANS.md round-11 DSIR section):\n" + offenders.mkString("\n")
    )
  }

  /** The textual scan above cannot see a splice hidden behind a helper
    * parameter — `ApproxDedup.shingles(text, n)` forwards
    * `tokens(text)` into shinglesOfTokens' transform, which is exactly
    * how text_novelty_score regressed (its call site contained no
    * `transform(` at all). So the convenience form itself is banned
    * from src/main outside its own definition; production callers must
    * stage the token array and use shinglesOfTokens. Tests may use the
    * convenience form on tiny fixtures (its documented purpose).
    */
  test("src/main never calls the convenience shingles(text, n) form") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val files = {
      val stream = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.filter(_.toString.endsWith(".scala")).toList
      } finally stream.close()
    }
    val offenders = files
      .filterNot(_.toString.endsWith("operators/ApproxDedup.scala"))
      .flatMap { p =>
        val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        raw"ApproxDedup\.shingles\(".r.findAllMatchIn(src).map { m =>
          s"$p:${src.substring(0, m.start).count(_ == '\n') + 1}"
        }
      }
    assert(
      offenders.isEmpty,
      "ApproxDedup.shingles(text, n) re-splits the document per shingle — " +
        "stage the token array and call shinglesOfTokens instead:\n" +
        offenders.mkString("\n")
    )
  }
}
