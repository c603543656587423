package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * The dot-product kernel is the native codegen'd [[DotProduct]]
  * expression (resolved through the session FunctionRegistry as
  * `graft_dot` — sessions must enable [[GraftExtensions]]); float inputs
  * widen to double via an implicit elementwise Cast, accumulation is
  * double, left-to-right in index order, so results are deterministic and
  * bit-identical to the higher-order-function formulation ([[dotHof]],
  * kept for the NativeVectorSpec equivalence proof) and to the DuckDB
  * oracle's `list_dot_product`.
  */
object VectorFunctions {
  /** Elementwise cast to double (accumulate in double, not float). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Reference HOF formulation of `dot` — interpreted (CodegenFallback),
    * used only to pin the native kernel's semantics in tests.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Dot product over ALREADY-double arrays. With the native kernel this
    * is the same call — ImplicitCastInputTypes inserts no cast for
    * array<double> — but hot paths still pre-cast once per row so the
    * float->double widening isn't re-done per pair/plane.
    */
  def dotD(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine from pre-cast double vectors and precomputed norms. Same
    * operation order as `cosine`, so results are bit-identical — but each
    * side's norm is computed once per ROW instead of once per PAIR.
    */
  def cosinePre(aD: Column, bD: Column, aNorm: Column, bNorm: Column): Column =
    dotD(aD, bD) / (aNorm * bNorm)

  /** Dot product of a vector column with a CONSTANT plane/centroid —
    * the plane ships as an array<double> literal, so the whole product
    * stays one codegen'd loop per row.
    */
  def planeDot(v: Column, plane: Array[Double]): Column =
    call_function("graft_dot", v, lit(plane))

  /** ALL C centroid dots of `v` in one native kernel call
    * ([[CellDots]]) — the IVF cell-assignment primitive. Bit-identical
    * to `array(planeDot(v, c0), ..., planeDot(v, cC-1))` but one
    * compiled loop regardless of C: the Column form's C-wide literal
    * projection blows Janino's method limit once C scales with the
    * corpus (C ~ sqrt(N)) and drops the assignment stage to
    * interpreted evaluation (measured ~15 s/pass at C=80 over 20k
    * rows — the round-10 sqrt-C artifact's ivf_sqrtc outlier).
    */
  def cellDots(v: Column, cents: Seq[Array[Double]]): Column = {
    require(cents.nonEmpty, "cellDots needs at least one centroid")
    call_function(
      "graft_cell_dots", v,
      lit(cents.flatten.toArray), lit(cents.size), lit(cents.head.length))
  }

  /** Sign bit (1/0) of the projection of `v` onto a constant hyperplane.
    * Hyperplanes come from a seeded RNG on the driver — data-independent
    * and reproducible across runs/clusters.
    */
  def hyperplaneSignBit(v: Column, plane: Array[Double]): Column =
    when(planeDot(v, plane) >= 0, 1).otherwise(0)

  /** Rademacher (±1) Johnson-Lindenstrauss sign matrix, k rows of dim
    * entries, derived from md5 so BOTH engines can regenerate it
    * exactly: sign(i, j) = +1 iff the 60-bit prefix of
    * md5("salt:i:j") is even — the same salted-md5-determinism
    * convention as every other curation primitive (no RNG object, no
    * seed-order dependence). Achlioptas 2003 shows ±1 entries satisfy
    * the JL lemma with the same distortion bound as Gaussians; with
    * int8-quantized inputs the projection is a SUM OF SIGNED BYTES —
    * exact in double (|proj| <= 127*dim), so engines agree bit-for-bit
    * with no rounding grid.
    */
  def rademacherSigns(dim: Int, k: Int, salt: String): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k) { j =>
      Array.tabulate(dim) { i =>
        val hex = md
          .digest(s"$salt:$i:$j".getBytes("UTF-8"))
          .map(b => f"$b%02x")
          .mkString
          .substring(0, 15)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** JL random projection to k dimensions: k codegen'd `graft_dot`
    * calls against literal ±1 sign vectors — a NARROW map stage, no
    * shuffle, no per-row allocation beyond the output array. Appends
    * `outCol` = array<double> of length k. Input should be the
    * (exact-in-double) int8-quantized vector for bit-reproducibility;
    * float vectors work but inherit float-sum semantics.
    */
  def withRandomProjection(
      df: org.apache.spark.sql.DataFrame,
      vecCol: String,
      outCol: String,
      dim: Int,
      k: Int,
      salt: String
  ): org.apache.spark.sql.DataFrame = {
    val signs = rademacherSigns(dim, k, salt)
    df.withColumn(outCol, array(signs.map(sv => planeDot(col(vecCol), sv)): _*))
  }

  /** Random-hyperplane LSH bucket id: `nBits` sign bits packed into an int.
    * cos-similar vectors collide with high probability; used by
    * `Similarity.lshCosineTopK` to cut the candidate space from O(n^2) to
    * per-bucket blocks.
    */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, i) => hyperplaneSignBit(v, p) * (1 << i) }
      .reduce(_ + _)

  /** Deterministic hyperplanes: dim values from java.util.Random(seed). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Symmetric per-vector int8 quantization — the storage codec of a
    * large embedding corpus (4x smaller than float32, 8x than double):
    * scale = max|v_i| / 127, q_i = round(v_i / scale) in [-127, 127]
    * (all-zero vectors quantize to all-zero with scale 0).
    *
    * DataFrame-level because the scale must be STAGED in its own
    * projection: referencing it inside the quantizing lambda would
    * re-evaluate the max-abs aggregate per element (O(d^2) — the
    * HOF-staging rule, PLANS.md). Adds `scaleCol` (double) and `qCol`
    * (array<int>) to `df`. Arithmetic is plain IEEE double ops on
    * identical inputs, so DuckDB oracles mirror it bit-exactly.
    */
  def withInt8Quant(
      df: org.apache.spark.sql.DataFrame,
      vecCol: String,
      scaleCol: String,
      qCol: String
  ): org.apache.spark.sql.DataFrame = {
    val staged = df
      .withColumn("__vd", toDouble(col(vecCol)))
      .withColumn(
        scaleCol,
        aggregate(col("__vd"), lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0
      )
    staged
      .withColumn(
        qCol,
        transform(
          col("__vd"),
          x => when(col(scaleCol) === 0.0, 0).otherwise(round(x / col(scaleCol))).cast("int")
        )
      )
      .drop("__vd")
  }
}
