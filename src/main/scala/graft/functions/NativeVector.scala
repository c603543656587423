package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense dot product — the innermost
  * loop of every ANN / cosine-dedup operator in the engine.
  *
  * The `Column`-level formulation (`aggregate(zip_with(a, b, _ * _), 0.0,
  * _ + _)` in [[VectorFunctions]]) is correct but built from higher-order
  * functions, which are `CodegenFallback` in Spark: every evaluation
  * allocates lambda variables and walks an interpreted expression tree,
  * and it breaks the surrounding WholeStageCodegen span. This expression
  * generates a tight Java loop instead (`doGenCode`), so a brute-force
  * scoring stage of |corpus| x |queries| pairs stays entirely inside
  * whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the HOF form (verified by
  * NativeVectorSpec): accumulate in double, left-to-right in index order;
  * null input, length mismatch, or a null element yields null — exactly
  * what `zip_with` (null-padding) + `x * y` + `acc + x` null propagation
  * produce. The DuckDB oracle twin (`list_dot_product`) is unchanged.
  *
  * Registered as SQL function `graft_dot` via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`), so plain-SQL users get
  * the same codegen'd kernel: `SELECT graft_dot(a.vec, b.vec) ...`.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  // Spark 4 hides AbstractDataType (so no ExpectsInputTypes here); the
  // GraftExtensions builder wraps both children in Cast to array<double>
  // — a no-op for double inputs (SimplifyCasts removes it), elementwise
  // widening for float — and this check guards direct construction.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot expects (array<double>, array<double>), got (${l.simpleString(10)}, ${r.simpleString(10)})"
        )
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |final int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $acc; }
           |}
           |""".stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): DotProduct = copy(left = newLeft, right = newRight)
}

/** Session extension wiring for graft's native expressions.
  *
  * Activate with `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (or `withExtensions(new GraftExtensions)`): injects `graft_dot` into the
  * session's FunctionRegistry so both the Column API (`call_function`) and
  * raw SQL resolve to the codegen'd kernel.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-operator tier: BETWEEN-join -> bucketed range equi-join
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_dot expects 2 arguments, got ${children.size}")
        DotProduct(
          Cast(children.head, ArrayType(DoubleType)),
          Cast(children(1), ArrayType(DoubleType))
        )
      }
    ),
    (
      FunctionIdentifier("graft_pq_scores"),
      new ExpressionInfo(classOf[PqScores].getName, "graft_pq_scores"),
      (children: Seq[Expression]) => {
        require(
          children.size == 8,
          s"graft_pq_scores expects (vn, cell, book, ccd, half, offset, sub, ksub), got ${children.size}"
        )
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.catalyst.util.ArrayData
        def dblArr(e: Expression, what: String): Seq[Double] = e match {
          case Literal(ad: ArrayData, ArrayType(DoubleType, _)) =>
            ad.toDoubleArray().toSeq
          case other =>
            throw new IllegalArgumentException(
              s"graft_pq_scores $what must be an array<double> literal, got $other"
            )
        }
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, _) => v
          case other =>
            throw new IllegalArgumentException(
              s"graft_pq_scores $what must be an integer literal, got $other"
            )
        }
        PqScores(
          Cast(children.head, ArrayType(DoubleType)),
          Cast(children(1), org.apache.spark.sql.types.IntegerType),
          dblArr(children(2), "book"),
          dblArr(children(3), "ccd"),
          dblArr(children(4), "half"),
          intLit(children(5), "offset"),
          intLit(children(6), "sub"),
          intLit(children(7), "ksub")
        )
      }
    ),
    (
      FunctionIdentifier("graft_cell_dots"),
      new ExpressionInfo(classOf[CellDots].getName, "graft_cell_dots"),
      (children: Seq[Expression]) => {
        require(
          children.size == 4,
          s"graft_cell_dots expects (vec, cents, c, dim), got ${children.size}"
        )
        import org.apache.spark.sql.catalyst.expressions.Literal
        val cents = children(1) match {
          case Literal(ad: ArrayData, ArrayType(DoubleType, _)) => ad.toDoubleArray().toSeq
          case other =>
            throw new IllegalArgumentException(
              s"graft_cell_dots cents must be an array<double> literal, got $other"
            )
        }
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, _) => v
          case other =>
            throw new IllegalArgumentException(
              s"graft_cell_dots $what must be an integer literal, got $other"
            )
        }
        CellDots(
          Cast(children.head, ArrayType(DoubleType)),
          cents,
          intLit(children(2), "c"),
          intLit(children(3), "dim")
        )
      }
    ),
    (
      FunctionIdentifier("graft_unit"),
      new ExpressionInfo(classOf[UnitNormalize].getName, "graft_unit"),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"graft_unit expects 1 argument, got ${children.size}")
        UnitNormalize(Cast(children.head, ArrayType(DoubleType)))
      }
    ),
    (
      FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (children: Seq[Expression]) => {
        require(
          children.size == 5,
          s"graft_lsh_buckets expects (vec, nTables, nPlanes, dim, seed), got ${children.size}"
        )
        import org.apache.spark.sql.catalyst.expressions.Literal
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, _) => v
          case other =>
            throw new IllegalArgumentException(
              s"graft_lsh_buckets $what must be an integer literal, got $other"
            )
        }
        val seed = children(4) match {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _)  => v.toLong
          case other =>
            throw new IllegalArgumentException(
              s"graft_lsh_buckets seed must be an integer literal, got $other"
            )
        }
        LshBuckets(
          Cast(children.head, ArrayType(DoubleType)),
          intLit(children(1), "nTables"),
          intLit(children(2), "nPlanes"),
          intLit(children(3), "dim"),
          seed
        )
      }
    ),
    (
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_jaro_winkler expects 2 arguments, got ${children.size}")
        JaroWinkler(children.head, children(1))
      }
    ),
    (
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_minhash_sig expects (baseHashes, nHashes), got ${children.size}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) if v > 0 => v
          case other =>
            throw new IllegalArgumentException(
              s"graft_minhash_sig nHashes must be a positive integer literal, got $other"
            )
        }
        MinhashSignature(
          Cast(children.head, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
          (0 until n).map(MinhashFamily.a),
          (0 until n).map(MinhashFamily.b),
          MinhashFamily.Mod
        )
      }
    ),
    (
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashBits].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_simhash expects (tokenHashes, nBits), got ${children.size}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) if v > 0 && v <= 63 => v
          case other =>
            throw new IllegalArgumentException(
              s"graft_simhash nBits must be an integer literal in [1, 63], got $other"
            )
        }
        SimhashBits(
          Cast(children.head, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
          n
        )
      }
    ),
    (
      FunctionIdentifier("graft_ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "graft_ngram_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_ngram_hashes expects (tokens, n), got ${children.size}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) if v >= 1 => v
          case other =>
            throw new IllegalArgumentException(
              s"graft_ngram_hashes n must be a positive integer literal, got $other"
            )
        }
        NgramHashes(children.head, n)
      }
    ),
    (
      FunctionIdentifier("graft_md5_longs"),
      new ExpressionInfo(classOf[Md5Longs].getName, "graft_md5_longs"),
      (children: Seq[Expression]) => {
        require(children.size == 3, s"graft_md5_longs expects (arr, prefix, mod), got ${children.size}")
        import org.apache.spark.sql.catalyst.expressions.Literal
        val prefix = children(1) match {
          case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
          case other =>
            throw new IllegalArgumentException(
              s"graft_md5_longs prefix must be a string literal, got $other"
            )
        }
        val mod = children(2) match {
          case Literal(v: Long, _) if v >= 0 => v
          case Literal(v: Int, _) if v >= 0  => v.toLong
          case other =>
            throw new IllegalArgumentException(
              s"graft_md5_longs mod must be a non-negative integer literal, got $other"
            )
        }
        Md5Longs(children.head, prefix, mod)
      }
    ),
    (
      FunctionIdentifier("graft_hamming_pairs"),
      new ExpressionInfo(classOf[HammingPairs].getName, "graft_hamming_pairs"),
      (children: Seq[Expression]) => {
        require(
          children.size == 4,
          s"graft_hamming_pairs expects (xs, nBits, maxHamming, maxBucket), got ${children.size}"
        )
        import org.apache.spark.sql.catalyst.expressions.Literal
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, _) => v
          case other =>
            throw new IllegalArgumentException(
              s"graft_hamming_pairs $what must be an integer literal, got $other"
            )
        }
        HammingPairs(
          children.head,
          intLit(children(1), "nBits"),
          intLit(children(2), "maxHamming"),
          intLit(children(3), "maxBucket")
        )
      }
    ),
    (
      FunctionIdentifier("graft_id_pairs"),
      new ExpressionInfo(classOf[IdPairs].getName, "graft_id_pairs"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_id_pairs expects (ids, maxBucket), got ${children.size}")
        val mb = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)
              if v > 1 && v <= IdPairs.MaxBucketLimit =>
            v
          case other =>
            throw new IllegalArgumentException(
              s"graft_id_pairs maxBucket must be an integer literal in (1, ${IdPairs.MaxBucketLimit}], got $other"
            )
        }
        // id column may arrive as int/string: cast to the kernel's
        // array<bigint> contract (same pattern as graft_simhash)
        IdPairs(Cast(children.head, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)), mb)
      }
    ),
    (
      FunctionIdentifier("graft_unicode"),
      new ExpressionInfo(classOf[UnicodeNorm].getName, "graft_unicode"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_unicode expects (text, mode), got ${children.size}")
        val mode = children(1) match {
          case org.apache.spark.sql.catalyst.expressions
                .Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
            v.toString
          case other =>
            throw new IllegalArgumentException(
              s"graft_unicode mode must be a string literal, got $other"
            )
        }
        UnicodeNorm(children.head, mode)
      }
    ),
    (
      FunctionIdentifier("graft_cosine_pairs"),
      new ExpressionInfo(classOf[CosinePairs].getName, "graft_cosine_pairs"),
      (children: Seq[Expression]) => {
        require(
          children.size == 3,
          s"graft_cosine_pairs expects (xs, threshold, maxBucket), got ${children.size}"
        )
        import org.apache.spark.sql.catalyst.expressions.Literal
        val thr = children(1) match {
          case Literal(v: Double, _) => v
          case other =>
            throw new IllegalArgumentException(
              s"graft_cosine_pairs threshold must be a double literal, got $other"
            )
        }
        val mb = children(2) match {
          case Literal(v: Int, _) if v > 1 => v
          case other =>
            throw new IllegalArgumentException(
              s"graft_cosine_pairs maxBucket must be an integer literal > 1, got $other"
            )
        }
        CosinePairs(children.head, thr, mb)
      }
    ),
    (
      FunctionIdentifier("graft_sig_agree_pairs"),
      new ExpressionInfo(classOf[SigAgreePairs].getName, "graft_sig_agree_pairs"),
      (children: Seq[Expression]) => {
        require(
          children.size == 2,
          s"graft_sig_agree_pairs expects (xs, maxBucket), got ${children.size}"
        )
        val mb = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)
              if v > 1 && v <= IdPairs.MaxBucketLimit =>
            v
          case other =>
            throw new IllegalArgumentException(
              s"graft_sig_agree_pairs maxBucket must be an integer literal in (1, ${IdPairs.MaxBucketLimit}], got $other"
            )
        }
        SigAgreePairs(children.head, mb)
      }
    ),
    (
      FunctionIdentifier("graft_subword_counts"),
      new ExpressionInfo(classOf[SubwordCounts].getName, "graft_subword_counts"),
      (children: Seq[Expression]) => {
        require(
          children.size == 3,
          s"graft_subword_counts expects (words, startVocab, contVocab), got ${children.size}"
        )
        import org.apache.spark.sql.catalyst.expressions.Literal
        def vocabLit(e: Expression, what: String): Seq[String] = e match {
          case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
            v.toString.split(" ").filter(_.nonEmpty).toSeq
          case other =>
            throw new IllegalArgumentException(
              s"graft_subword_counts $what must be a space-joined string literal, got $other"
            )
        }
        SubwordCounts(
          children.head,
          vocabLit(children(1), "startVocab"),
          vocabLit(children(2), "contVocab")
        )
      }
    ),
    (
      FunctionIdentifier("graft_bpe_counts"),
      new ExpressionInfo(classOf[BpeCounts].getName, "graft_bpe_counts"),
      (children: Seq[Expression]) => {
        require(
          children.size == 2,
          s"graft_bpe_counts expects (words, merges), got ${children.size}"
        )
        import org.apache.spark.sql.catalyst.expressions.Literal
        // merges ride as one string literal: pairs joined by '\n',
        // the two symbols of a pair by '\t' (whitespace-tokenized
        // corpora can never produce symbols containing either)
        val merges = children(1) match {
          case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
            v.toString.split("\n").filter(_.nonEmpty).toSeq.map { line =>
              val parts = line.split("\t", -1)
              require(parts.length == 2, s"malformed merge rule '$line'")
              (parts(0), parts(1))
            }
          case other =>
            throw new IllegalArgumentException(
              s"graft_bpe_counts merges must be a string literal, got $other"
            )
        }
        BpeCounts(children.head, merges)
      }
    )
  )
}
