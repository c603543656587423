package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared Unicode canonicalization kernels — one static call per row,
  * usable from both the interpreted and generated paths.
  *
  * Corpus text arrives in mixed normalization forms (NFC from most web
  * pages, NFD from macOS filenames/OCR, full-width + ligature compat
  * chars from CJK sources). Downstream exact/near-dup hashing and
  * tokenization treat `e + COMBINING ACUTE` and `é` as different
  * documents unless the corpus is canonicalized first, so normalization
  * is the FIRST stage of the prep chain, before any fingerprint.
  *
  *   - `nfc` / `nfkc`: java.text.Normalizer canonical / compatibility
  *     composition (NFKC additionally folds full-width forms, ligatures,
  *     circled digits — lossy, use for matching keys, not display text).
  *   - `stripAccents`: NFD-decompose then drop combining marks (general
  *     category Mn), the standard search-key accent fold (café -> cafe,
  *     ñ -> n). Matches DuckDB's utf8proc `strip_accents` on Latin text,
  *     which the oracle exercises.
  */
object GraftUnicode {
  import java.text.Normalizer

  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  def nfkc(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFKC))

  def stripAccents(s: UTF8String): UTF8String = {
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def apply(mode: String, s: UTF8String): UTF8String = mode match {
    case "nfc"           => nfc(s)
    case "nfkc"          => nfkc(s)
    case "strip_accents" => stripAccents(s)
  }
}

/** `graft_unicode(text, mode)` — string -> string Unicode canonicalizer.
  * `mode` is a literal: 'nfc', 'nfkc', or 'strip_accents'. Codegen'd:
  * one static kernel call per row, stays inside whole-stage codegen
  * (vs a Scala UDF's serialization + Row boxing per value).
  */
case class UnicodeNorm(child: Expression, mode: String) extends UnaryExpression {

  require(
    Seq("nfc", "nfkc", "strip_accents").contains(mode),
    s"graft_unicode mode must be nfc | nfkc | strip_accents, got '$mode'"
  )

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_unicode expects string, got ${other.simpleString(10)}"
        )
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_unicode"

  override def nullSafeEval(input: Any): Any =
    GraftUnicode(mode, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = classOf[GraftUnicode.type].getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"""$kernel.apply("$mode", $s)""")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}
