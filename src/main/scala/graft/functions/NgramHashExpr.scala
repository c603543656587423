package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram (shingle) HASH kernel: one `array<string>` of tokens ->
  * `array<long>` of 64-bit hashes, one per sliding window of `n`
  * consecutive tokens, in ONE traversal.
  *
  * Replaces the Column-level shingle pipeline
  * (`transform(sequence(...), i -> concat_ws(" ", element_at...*n))`
  * in [[graft.operators.ApproxDedup.shinglesOfTokens]]) wherever the
  * shingle STRING itself is never output — the n-gram Jaccard operator
  * only needs set sizes and intersections, which any injective-enough
  * hash preserves. Wins at scale:
  *   - no shingle strings are ever materialized (the HOF form allocates
  *     |tokens| concat'd strings per doc through interpreted lambdas);
  *   - everything downstream (document-frequency shuffle, prefix
  *     ranking, candidate buckets, array_intersect verify) moves 8-byte
  *     longs instead of ~20-40-byte strings — ~4x less shuffle volume;
  *   - the kernel is codegen'd (`doGenCode`), so the map stage stays
  *     inside whole-stage codegen instead of CodegenFallback.
  *
  * Hashing: each token is XXH64 over its UTF-8 bytes (seed 42, same
  * primitive as Spark's `xxhash64`); a window hash chains the token
  * hashes left-to-right with `XXH64.hashLong(tokHash, acc)`. 64-bit
  * collisions would need both colliding shingles in the SAME candidate
  * pair to alter a Jaccard count — vanishingly unlikely even at 100 TB
  * (the exact-verify join caps exposure to per-pair set sizes).
  *
  * Semantics: null array -> null; fewer than `n` tokens -> empty array
  * (mirrors the HOF form's `when(size >= n, ...).otherwise(empty)`);
  * a null TOKEN contributes the bare seed (42L) as its hash — NOT
  * XXH64("", 42) — in both eval and codegen paths (split() never
  * produces null tokens on engine data — documented fallback, not a
  * reachable path).
  *
  * The DuckDB oracle is unchanged: it computes the same final
  * (id_a, id_b, jaccard) rows from string shingles, which equal the
  * hashed-set counts absent 64-bit collisions (NgramHashExprSpec pins
  * count-equivalence on the corpus).
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  private val Seed = 42L

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_ngram_hashes expects array<string>, got ${other.simpleString(10)}"
        )
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_ngram_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val t = arr.numElements()
    if (t < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val th = new Array[Long](t)
    var i = 0
    while (i < t) {
      th(i) =
        if (arr.isNullAt(i)) Seed
        else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      i += 1
    }
    val out = new Array[Long](t - n + 1)
    i = 0
    while (i <= t - n) {
      var acc = Seed
      var j = 0
      while (j < n) {
        acc = XXH64.hashLong(th(i + j), acc)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      arr => {
        val xxh = classOf[XXH64].getName
        val t = ctx.freshName("t")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val th = ctx.freshName("th")
        val out = ctx.freshName("out")
        val acc = ctx.freshName("acc")
        s"""
           |final int $t = $arr.numElements();
           |if ($t < $n) {
           |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(new long[0]);
           |} else {
           |  final long[] $th = new long[$t];
           |  for (int $i = 0; $i < $t; $i++) {
           |    $th[$i] = $arr.isNullAt($i)
           |      ? ${Seed}L
           |      : $xxh.hashUTF8String($arr.getUTF8String($i), ${Seed}L);
           |  }
           |  final long[] $out = new long[$t - $n + 1];
           |  for (int $i = 0; $i <= $t - $n; $i++) {
           |    long $acc = ${Seed}L;
           |    for (int $j = 0; $j < $n; $j++) {
           |      $acc = $xxh.hashLong($th[$i + $j], $acc);
           |    }
           |    $out[$i] = $acc;
           |  }
           |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
           |}
           |""".stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}
