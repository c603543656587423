package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5-hash helper used by both the interpreted and generated
  * paths of [[Md5Longs]]. One thread-local MessageDigest per executor
  * thread — no per-row allocation.
  */
object GraftHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5 prefix of (prefix bytes ++ UTF-8 bytes of s) — the exact
    * value of `conv(substring(md5(concat(prefix, s)), 1, 15), 16, 10)`:
    * the first 15 hex chars are bytes 0..6 plus the HIGH nibble of byte
    * 7, i.e. the big-endian 64-bit value of bytes 0..7 shifted right 4.
    */
  def md5Long60(prefix: Array[Byte], s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    if (prefix.length > 0) d.update(prefix)
    d.update(s.getBytes)
    val h = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Native elementwise seeded-md5 hash array: `array<string>` ->
  * `array<long>` where each element is the engine's canonical 60-bit
  * md5-prefix hash ([[Fingerprint.hexToLong]] of md5(prefix || s)),
  * optionally reduced `% mod`.
  *
  * Replaces the Column-level form
  * `transform(arr, s -> conv(substring(md5(concat(prefix, s)),1,15),16,10) % mod)`
  * used for per-token hashes (simhash, rolling fingerprint) and
  * per-shingle base hashes (minhash): `transform` is a CodegenFallback
  * higher-order function, so every element walks an interpreted
  * md5+conv+substring expression tree through lambda variables; this
  * expression is one generated loop per row calling a thread-local
  * MessageDigest ([[GraftHash]]).
  *
  * Values are BIT-IDENTICAL to the Column form (Md5LongsSpec pins this,
  * including multi-byte UTF-8), so the DuckDB oracles — which mirror the
  * same substr(md5(..)) construction — are unchanged. Null semantics
  * match `transform`: null array -> null, null element -> null element.
  */
case class Md5Longs(child: Expression, prefix: String, mod: Long) extends UnaryExpression {

  require(mod >= 0, s"mod must be >= 0 (0 = no reduction), got $mod")

  @transient private lazy val prefixBytes: Array[Byte] =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_md5_longs expects array<string>, got ${other.simpleString(10)}"
        )
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_md5_longs"

  private def reduceMod(v: Long): Long = if (mod > 0) v % mod else v

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(i) = java.lang.Long.valueOf(reduceMod(GraftHash.md5Long60(prefixBytes, arr.getUTF8String(i))))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("prefixBytes", prefixBytes, "byte[]")
    val hash = classOf[GraftHash.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(
      ctx,
      ev,
      arr => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        val v = ctx.freshName("v")
        val modExpr = if (mod > 0) s" % ${mod}L" else ""
        s"""
           |final int $n = $arr.numElements();
           |final Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$arr.isNullAt($i)) {
           |    final long $v = $hash.md5Long60($pRef, $arr.getUTF8String($i))$modExpr;
           |    $out[$i] = Long.valueOf($v);
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Longs =
    copy(child = newChild)
}
