package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source lint: no expensive expression spliced into a higher-order
  * function lambda in src/main.
  *
  * A Spark HOF lambda (`transform`/`aggregate`/`filter`/`exists`/
  * `forall`/`zip_with`/`map_filter`/`transform_keys`/
  * `transform_values`/`map_zip_with`) re-evaluates any expression
  * subtree referenced in its BODY once per element. Splicing
  * `split(text)` / `tokens(text)` / `md5(...)` into the body therefore
  * re-runs it for every element — O(n²) per document for
  * shingling/n-gram shapes. This bit the repo three times: round 2
  * (jaccard/minhash, ~100×, fixed by `ApproxDedup.shinglesOfTokens`),
  * and twice in round 11 when rounds-9/10 operators skipped the
  * discipline (`Curation.importanceContrast` 46.8→8.3 s solo sf1,
  * `text_novelty_score` 39.9→6.15 s — tools/bench_ic_tokens_r11.json,
  * bench_novelty_r11.json). The rule: stage the array in its own
  * projected column and lambda over the ATTRIBUTE.
  *
  * Mechanics: scan every src/main .scala file for a HOF call whose
  * following 450 chars contain a qualifying lambda arrow and then one
  * of the expensive calls. `filter`/`forall`/`exists` collide with
  * Scala collection / Dataset methods, so for those the arrow must be
  * preceded by a top-level comma inside the call (the Spark HOF is the
  * two-argument `filter(arr, x => …)` form; the one-argument
  * `xs.filter(x => …)` closure runs per ROW, not per element, and is
  * out of scope). Every expensive call after the arrow is checked
  * INDIVIDUALLY: an allowlisted shape excuses only the expensive calls
  * inside its own matched span, so a new splice appended after a benign
  * one in the same window still fails (round-11 advice: startsWith on
  * the whole segment silently masked the remainder). New hits fail
  * with a pointer to the staging discipline.
  */
class LambdaSpliceLintSpec extends AnyFunSuite {

  /** HOFs whose name is unambiguous — any following lambda arrow is a
    * Spark HOF lambda. The `(?<!\w)` guard pins the STANDALONE call
    * name: without it an identifier merely containing a HOF name
    * (`applyTransform(`) enters the scan as a false-positive candidate.
    * Dotted calls (`functions.transform(`) stay in scope — they are the
    * same Spark HOF, just qualified. */
  private val HofUnambiguous =
    raw"(?<!\w)(transform|aggregate|zip_with|map_filter|transform_keys|transform_values|map_zip_with|array_sort)\(".r

  /** HOFs sharing a name with Scala collection / Dataset methods — only
    * the two-argument form (top-level comma before the arrow) is the
    * Spark HOF. `reduce` is SQL's alias of aggregate; Scala's
    * one-argument `xs.reduce((a, b) => …)` keeps its parameter-list
    * comma at paren depth 1, so the top-level-comma test excludes it.
    * The `(?<!\w)` guard also stops `map_filter(` matching BOTH regexes
    * (underscore is \w) — each call is scanned exactly once. */
  private val HofAmbiguous = raw"(?<!\w)(filter|forall|exists|reduce)\(".r

  private val ExpensiveCall =
    raw"(split\(|TextFunctions\.tokens\(|md5\(|seededLongHash\()".r

  /** Benign shapes, whitespace-normalized. Each entry documents WHY.
    * A shape excuses ONLY the expensive calls inside its matched span,
    * anchored at the HOF start — anything after the span is judged on
    * its own. */
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
      "scaladoc comment, not code",
    // Md5LongsExpr: scaladoc COMMENT citing the Column form the native
    // kernel replaces (and the md5 hashes the lambda element anyway).
    "transform(arr, s -> conv(substring(md5(concat(prefix, s)),1,15),16,10) % mod)" ->
      "scaladoc comment citing the replaced form; hash of the element",
    // DuckDB oracle SQL (text_fingerprint family): md5 of the lambda
    // ELEMENT over a staged toks column — per-element work is the
    // operator's intent, mirrored on the Spark side by the native
    // graft_md5_longs kernel.
    "transform(toks, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)" ->
      "oracle SQL hashes the lambda element over a staged column"
  )

  private def norm(s: String): String = s.replaceAll("\\s+", " ")

  /** Regex matching an allowlisted shape with flexible whitespace. */
  private def shapeRegex(prefix: String): scala.util.matching.Regex =
    norm(prefix).split(' ').map(java.util.regex.Pattern.quote).mkString("\\s*").r

  /** Index of the first lambda arrow in `seg` — Scala's `=>` or SQL's
    * `->` (HOFs inside expr("…") strings use the SQL form and are just
    * as spliceable); -1 if none. */
  private def firstArrow(seg: String): Int = {
    val scala_ = seg.indexOf("=>")
    val sql    = seg.indexOf("->")
    if (scala_ < 0) sql
    else if (sql < 0) scala_
    else math.min(scala_, sql)
  }

  /** True iff the call starting at `open` (index of '(') has a
    * top-level comma before the first lambda arrow — the Spark
    * two-argument HOF form, as opposed to a one-argument Scala
    * closure (whose parameter-list comma sits at paren depth 1). */
  private def topLevelCommaBeforeArrow(seg: String, open: Int): Boolean = {
    var i     = open + 1
    var depth = 0
    var comma = false
    while (i < seg.length - 1) {
      seg.charAt(i) match {
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' =>
          if (depth == 0) return false // call closed before any arrow
          depth -= 1
        case ',' if depth == 0 => comma = true
        case '=' if seg.charAt(i + 1) == '>' => return comma
        case '-' if seg.charAt(i + 1) == '>' => return comma
        case _ => ()
      }
      i += 1
    }
    false
  }

  /** Index just past the ')' that closes the call whose '(' is at
    * `open`, or `seg.length` if the call does not close inside the
    * window — expensive calls AFTER the close belong to the enclosing
    * expression, not the lambda body, and must not be flagged. */
  private def callCloseIdx(seg: String, open: Int): Int = {
    var i     = open + 1
    var depth = 0
    while (i < seg.length) {
      seg.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          if (depth == 0) return i + 1
          depth -= 1
        case _ => ()
      }
      i += 1
    }
    seg.length
  }

  private def mainSources: List[java.nio.file.Path] = {
    val root   = java.nio.file.Paths.get("src/main/scala/graft")
    val stream = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.filter(_.toString.endsWith(".scala")).toList
    } finally stream.close()
  }

  /** All splice offences in one source string, as `line: context`. */
  private def scanSource(src: String): List[String] = {
    val hofStarts =
      HofUnambiguous.findAllMatchIn(src).map(m => (m.start, m.end - 1, false)) ++
        HofAmbiguous.findAllMatchIn(src).map(m => (m.start, m.end - 1, true))
    hofStarts.flatMap { case (start, open, ambiguous) =>
      val seg = src.substring(start, math.min(src.length, start + 450))
      val arrowIdx = firstArrow(seg)
      val qualifies =
        arrowIdx >= 0 && (!ambiguous || topLevelCommaBeforeArrow(seg, open - start))
      if (!qualifies) Nil
      else {
        // Span excused by an allowlisted shape anchored at the HOF start.
        val excusedEnd = Allowed.iterator
          .flatMap { case (prefix, _) =>
            shapeRegex(prefix).findPrefixMatchOf(seg).map(_.end)
          }
          .foldLeft(0)(math.max)
        val closeIdx = callCloseIdx(seg, open - start)
        ExpensiveCall
          .findAllMatchIn(seg)
          .filter(em => em.start > arrowIdx && em.start < closeIdx && em.start >= excusedEnd)
          .map { em =>
            val line = src.substring(0, start).count(_ == '\n') + 1
            s"$line  …${norm(seg.substring(math.max(0, em.start - 60), math.min(seg.length, em.end + 40)))}…"
          }
          .toList
      }
    }.toList.distinct
  }

  test("src/main has no new expensive-expression splice inside a HOF lambda") {
    val files = mainSources
    assert(files.nonEmpty, "no sources found under src/main/scala/graft — lint is scanning the wrong place")

    val offenders = files.flatMap { p =>
      val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      scanSource(src).map(o => s"$p:$o")
    }
    assert(
      offenders.isEmpty,
      "expensive expression spliced into a HOF lambda (re-evaluated PER ELEMENT " +
        "— O(n²) per row; stage the array in its own projected column and " +
        "lambda over the attribute, see ApproxDedup.shinglesOfTokens / " +
        "PLANS.md round-11 DSIR section):\n" + offenders.mkString("\n")
    )
  }

  /** Self-test: the scanner must catch the historical offender shapes
    * and each widening target — a vacuously-green lint is worse than
    * none (a rewrite bug here would silently disarm the whole check). */
  test("scanner detects synthetic offenders and passes synthetic benign shapes") {
    // The round-11 regression shape: split() spliced into a transform body.
    assert(
      scanSource("""transform(sequence(lit(0), size(split(col("t"), " ")) - 2), i => element_at(split(col("t"), " "), i))""").nonEmpty,
      "transform-body splice not caught"
    )
    // Widening targets: two-argument Spark filter / forall / map HOFs.
    assert(scanSource("""filter(col("arr"), x => md5(concat(col("t"), x)) === lit("a"))""").nonEmpty, "filter HOF splice not caught")
    assert(scanSource("""forall(col("arr"), x => x === element_at(TextFunctions.tokens(col("t")), 1))""").nonEmpty, "forall HOF splice not caught")
    assert(scanSource("""map_filter(col("m"), (k, v) => v === md5(col("t")))""").nonEmpty, "map_filter splice not caught")
    // Round-13 guard: map_filter must be scanned ONCE (the unguarded
    // ambiguous regex used to also match its trailing `filter(`,
    // yielding a near-duplicate offender at a shifted offset).
    assert(
      scanSource("""map_filter(col("m"), (k, v) => v === md5(col("t")))""").size == 1,
      "map_filter scanned by both regexes — word-boundary guard regressed"
    )
    // Round-13 guard: identifiers merely containing a HOF name stay out.
    assert(
      scanSource("""applyTransform(col("a"), x => md5(col("t")))""").isEmpty,
      "identifier containing a HOF name false positive"
    )
    // Qualified Spark HOF calls stay IN scope (the guard excludes only
    // word characters, not the qualifying dot).
    assert(
      scanSource("""functions.transform(col("a"), x => md5(col("t")) === x)""").nonEmpty,
      "qualified functions.transform splice not caught"
    )
    assert(scanSource("""transform_values(col("m"), (k, v) => seededLongHash(col("t"), 7))""").nonEmpty, "transform_values splice not caught")
    assert(scanSource("""map_zip_with(a, b, (k, v1, v2) => v1 + hexToLong(md5(col("t"))))""").nonEmpty, "map_zip_with splice not caught")
    // The round-11 advice masking bug: a NEW splice added inside the
    // same call right after an allowlisted body must still fail (the
    // old startsWith-on-segment check silently excused the whole
    // window).
    assert(
      scanSource(
        """transform(TextFunctions.tokens(text), t => Fingerprint.seededLongHash(t, 0) + hexToLong(md5(col("t"))))"""
      ).nonEmpty,
      "splice after an allowlisted shape was masked"
    )
    // Round-12 additions: SQL reduce (aggregate alias) and array_sort
    // comparator lambdas.
    assert(scanSource("""expr("reduce(arr, 0L, (acc, x) -> acc + length(split(t, ' ')))")""").nonEmpty, "reduce splice not caught")
    assert(scanSource("""array_sort(col("arr"), (a, b) => when(md5(col("t")) === a, lit(-1)).otherwise(lit(1)))""").nonEmpty, "array_sort comparator splice not caught")
    // Benign: one-argument Scala closure forms are per-ROW, out of scope.
    assert(scanSource("""xs.reduce((a, b) => a.split(",").length - b.split(",").length)""").isEmpty, "one-arg Scala reduce false positive")
    assert(scanSource("""ds.filter(r => r.getString(0).split(",").length > 2)""").isEmpty, "one-arg Scala filter false positive")
    assert(scanSource("""xs.forall(s => s.split(" ").nonEmpty)""").isEmpty, "one-arg Scala forall false positive")
    assert(scanSource("""opt.exists(v => v.split("/").length > 1)""").isEmpty, "one-arg Option.exists false positive")
    // Benign: expensive call AFTER the HOF call closed — it belongs to
    // the enclosing expression, evaluated once per row.
    assert(scanSource("""transform(col("a"), x => x + 1)).withColumn("h", md5(col("t")))""").isEmpty, "post-close expensive call false positive")
    assert(scanSource("""filter(string_split(text, ' '), x -> cond)) / len(string_split(text, ' '))""").isEmpty, "SQL post-close false positive")
    // Benign: expensive call in the ARRAY argument (before the arrow).
    assert(scanSource("""transform(TextFunctions.tokens(text), t => Fingerprint.seededLongHash(t, 0))""").isEmpty, "allowlisted array-arg shape flagged")
    // Benign: no expensive call at all.
    assert(scanSource("""transform(col("arr"), x => x + lit(1))""").isEmpty, "clean transform flagged")
  }

  /** Ratchet (round-12 verdict item 8): the allowlist may shrink but
    * never silently grow — every new benign-shape entry must consciously
    * raise this bound in the same change that adds it, with the WHY
    * documented next to the shape. 5 is the round-12 size. */
  test("allowlist does not silently grow") {
    assert(
      Allowed.size <= 5,
      s"allowlist grew to ${Allowed.size} entries — a new benign shape must raise this " +
        "bound deliberately (and document WHY next to the entry), not slip past the lint"
    )
  }

  test("allowlisted shapes still exist in src/main (no stale entries)") {
    val srcs = mainSources.map(p => norm(new String(java.nio.file.Files.readAllBytes(p), "UTF-8")))
    val stale = Allowed.collect {
      case (prefix, why) if !srcs.exists(s => shapeRegex(prefix).findFirstIn(s).isDefined) =>
        s"$why: ${norm(prefix).take(80)}"
    }
    assert(stale.isEmpty, "allowlist entries no longer matching any source (remove them):\n" + stale.mkString("\n"))
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
    val offenders = mainSources
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
