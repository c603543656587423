package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, language-ID heuristic, quality scoring, fingerprinting.
  * All pure Column compositions (codegen'd, executor-side, no shuffle) so
  * they stream over a 100 TB documents table as a narrow map stage.
  */
object TextFunctions {
  /** Whitespace tokenization (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword unit count: alphabetic runs + digit runs + any other
    * non-space symbol each count as one unit.
    */
  def wordUnitCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Tiny per-language marker vocabularies for the n-gram/stopword
    * language-ID heuristic. Deliberately small and deterministic.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo")
  )

  /** Count of tokens that appear in the marker set. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => markers.map(m => t === m).reduce(_ || _)))

  /** Argmax language by marker hits; zero-hit rows -> "und"
    * (undetermined). Ties resolve by declared order (first match wins) —
    * a plain CASE chain, so the exact same logic is expressible as the
    * SQL oracle.
    */
  def langId(text: Column): Column = {
    val hits = LangMarkers.map { case (lang, ms) => lang -> markerHits(text, ms) }
    val best = greatest(hits.map(_._2): _*)
    hits
      .foldLeft(when(best === 0, "und")) { case (acc, (lang, h)) =>
        acc.when(h === best, lang)
      }
      .otherwise("und")
  }

  /** Quality score in [0, 100]: rewards mid-length docs, lexical
    * diversity, and low symbol noise. Integer output (engine-portable —
    * positive round only, see oracle parity notes).
    *   score = round( 40 * min(1, n_tokens/100)
    *                + 40 * distinct_tokens/n_tokens
    *                + 20 * alpha_chars/n_chars )
    */
  def qualityScore(text: Column): Column = {
    val nTok   = tokenCount(text).cast("double")
    val lenTerm = lit(40.0) * least(lit(1.0), nTok / 100.0)
    val divTerm = lit(40.0) * distinctTokenCount(text).cast("double") / nTok
    val alpha   = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    val noiseTerm = lit(20.0) * alpha / length(text).cast("double")
    // empty docs pin to 0: division by length(text)=0 is IEEE NaN in
    // Spark but +inf in DuckDB — an explicit guard keeps both engines
    // (and downstream filters) on a defined value. (nTok is never 0:
    // split() yields [""] for empty strings.)
    when(length(text) === 0, lit(0))
      .otherwise(round(lenTerm + divTerm + noiseTerm))
      .cast(IntegerType)
  }

  /** Content fingerprint: md5 of whitespace-normalized, lowercased text.
    * Robust to case/spacing-only edits; the near-dup operators in
    * graft.operators.ApproxDedup handle real edits.
    */
  def docFingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Stopword ratio ×1000 as integer (portable): round(1000*hits/tokens). */
  def stopwordRatioMil(text: Column, stopwords: Seq[String]): Column =
    round(lit(1000.0) * markerHits(text, stopwords).cast("double") /
      tokenCount(text).cast("double")).cast(IntegerType)

  /** Rolling-hash (Rabin-Karp) document fingerprint, winnowing-style:
    * per-token base hashes h_t (md5-derived, mod P), then for every
    * window of `w` consecutive tokens the polynomial hash
    * sum(h_{i+j} * B^(w-1-j)) mod P, and finally the MINIMUM window hash
    * as the document fingerprint — stable under edits far from the
    * minimizing window (the robustness rolling/winnowing schemes buy
    * over a whole-document hash). Everything is array expressions over
    * one staged token-hash array: a narrow, shuffle-free map stage, and
    * the same arithmetic is expressible in ANSI SQL for the oracle.
    * Docs shorter than `w` tokens yield NULL.
    */
  val RollBase = 31L
  val RollMod  = 2147483647L // 2^31-1; B*P + P < 2^63, overflow-free

  /** Window hashes over an ALREADY-MATERIALIZED token-hash array column.
    * Callers must stage that array in its own projection (see
    * `withRollingFingerprint`): referencing a raw hash expression here
    * would duplicate the whole md5 transform into every element_at,
    * turning O(n) hashing per doc into O(n*w).
    */
  private def rollingMinOver(tokHashes: Column, w: Int): Column = {
    val n   = size(tokHashes)
    val idx = sequence(lit(0), n - w)
    // each term is reduced mod P before summing: a raw product is < 2^62
    // but a sum of w raw products would overflow Long
    val windowHashes = transform(
      idx,
      i =>
        (0 until w)
          .map(j => (element_at(tokHashes, i + j + 1) * lit(pow(RollBase, w - 1 - j))) % RollMod)
          .reduce(_ + _) % RollMod
    )
    when(n >= w, array_min(windowHashes)).otherwise(lit(null).cast("long"))
  }

  /** Adds `outCol` = rolling-hash fingerprint of `text` to `df`, staging
    * the per-token hash array (one md5 per token total) first.
    */
  def withRollingFingerprint(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      w: Int,
      outCol: String
  ): org.apache.spark.sql.DataFrame = {
    // native graft_md5_longs loop — bit-identical to
    // transform(tokens, t => hexToLong(md5(t)) % RollMod) (Md5LongsSpec)
    val staged = df.withColumn(
      "__rollTokHashes",
      call_function("graft_md5_longs", tokens(text), lit(""), lit(RollMod))
    )
    staged.select(
      df.columns.map(col) :+ rollingMinOver(col("__rollTokHashes"), w).as(outCol): _*
    )
  }

  /** B^e mod P as a plain Long constant (e small; folded at plan time). */
  private def pow(b: Long, e: Int): Long =
    (0 until e).foldLeft(1L)((acc, _) => (acc * b) % RollMod)

  /** Deterministic split bucket in [0, nBuckets) from a salted md5 of the
    * id — the standard train/val/test assignment of a training-data
    * pipeline. Pure map stage (no shuffle, no RNG): the same id always
    * lands in the same bucket on any engine, rerun, or cluster size, and
    * changing `salt` yields an independent re-split. Engine-portable via
    * the 60-bit md5-prefix construction ([[Fingerprint.hexToLong]]).
    */
  def splitBucket(id: Column, nBuckets: Int, salt: String): Column =
    pmod(splitHash(id, salt), lit(nBuckets.toLong))

  /** The raw 60-bit salted id hash behind [[splitBucket]] — exposed for
    * callers that need the full hash (e.g. shuffle-order ranks), not
    * just a bucket.
    */
  def splitHash(id: Column, salt: String): Column =
    Fingerprint.hexToLong(md5(concat(lit(s"$salt:"), id.cast("string"))))
}
