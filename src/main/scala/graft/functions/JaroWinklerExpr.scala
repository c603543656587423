package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Textbook Jaro-Winkler similarity kernel (Winkler 1990, the record-
  * linkage string comparator): Jaro similarity
  * `(m/|a| + m/|b| + (m-t)/m) / 3` over half-max-length match windows,
  * plus the common-prefix boost `l * 0.1 * (1 - jaro)` applied only when
  * jaro > 0.7, prefix capped at 4 — the exact parameterization DuckDB's
  * `jaro_winkler_similarity` ships (probed bit-identical across match /
  * transposition / boost / empty / degenerate cases), so the oracle twin
  * is the builtin, not a hand-rolled CTE.
  *
  * Spark has `levenshtein` but no Jaro-Winkler; JW is the standard
  * comparator for short identity strings (names, addresses, product
  * labels) where edit distance over-penalizes transpositions.
  *
  * Comparison is over UTF-16 code units (Java chars). ASCII inputs agree
  * with DuckDB exactly; outside ASCII the engines may window differently
  * (DuckDB walks its own unit type), so oracle-checked queries keep to
  * ASCII domains.
  *
  * Static methods so generated code calls straight into the kernel —
  * the expression stays inside whole-stage codegen (one static call,
  * no virtual dispatch), unlike a Scala UDF's serialized closure.
  */
object JaroWinklerKernel {
  private final val PrefixWeight = 0.1
  private final val BoostThreshold = 0.7
  private final val MaxPrefix = 4

  /** Jaro similarity of two UTF-16 char sequences; 0.0 when EITHER side
    * is empty (including both-empty — the DuckDB builtin's convention,
    * probed, not the 1.0 some references use), 1.0 for equal non-empty.
    */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, lb)
      var j = lo
      var found = false
      while (!found && j < hi) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true
          mb(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (matches.toDouble / la + matches.toDouble / lb +
      (matches - t).toDouble / matches) / 3.0
  }

  /** Jaro-Winkler: jaro plus the capped-common-prefix boost above the
    * 0.7 threshold. Operation order mirrors the DuckDB builtin so the
    * IEEE doubles agree bitwise on ASCII inputs.
    */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val sa = a.toString
    val sb = b.toString
    val j = jaro(sa, sb)
    if (j > BoostThreshold) {
      var l = 0
      val max = math.min(MaxPrefix, math.min(sa.length, sb.length))
      while (l < max && sa.charAt(l) == sb.charAt(l)) l += 1
      j + l * PrefixWeight * (1.0 - j)
    } else j
  }
}

/** `graft_jaro_winkler(string, string) -> double` — null-propagating
  * binary expression over [[JaroWinklerKernel]]; codegen is a single
  * static call, so blocked-pair scoring stages stay whole-stage
  * compiled. Registered via [[GraftExtensions]].
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_jaro_winkler expects (string, string), got (${l.simpleString(10)}, ${r.simpleString(10)})"
        )
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (a, b) => s"graft.functions.JaroWinklerKernel.similarity($a, $b)"
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): JaroWinkler = copy(left = newLeft, right = newRight)
}
