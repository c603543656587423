package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Proves the native codegen'd `graft_dot` kernel (functions.DotProduct)
  * is bit-identical to the higher-order-function formulation it replaced,
  * and that it actually runs inside whole-stage codegen (the reason it
  * exists).
  */
class NativeVectorSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int, dim: Int): Array[Float] = {
    val r = new java.util.Random(seed)
    Array.fill(dim)(r.nextFloat() * 2f - 1f)
  }

  private lazy val pairs =
    (1 to 200)
      .map(i => (i.toLong, vec(i, 64), vec(i + 1000, 64)))
      .toDF("id", "a", "b")

  test("graft_dot is bit-identical to the HOF aggregate/zip_with form") {
    val rows = pairs
      .select(
        VectorFunctions.dot(col("a"), col("b")).as("native"),
        VectorFunctions.dotHof(col("a"), col("b")).as("hof")
      )
      .collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      // bit-level equality, not tolerance: same op order, same widening
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1))
      )
    }
  }

  test("norm2/cosinePre built on the native kernel match the HOF pipeline bit-exactly") {
    val hofNorm = (v: org.apache.spark.sql.Column) =>
      sqrt(VectorFunctions.dotHof(v, v))
    val rows = pairs
      .select(
        (VectorFunctions.dot(col("a"), col("b")) /
          (VectorFunctions.norm2(col("a")) * VectorFunctions.norm2(col("b")))).as("native"),
        (VectorFunctions.dotHof(col("a"), col("b")) /
          (hofNorm(col("a")) * hofNorm(col("b")))).as("hof")
      )
      .collect()
    rows.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1))
      )
    }
  }

  test("planeDot (constant literal side) matches HOF and interpreted eval") {
    val plane = VectorFunctions.randomPlanes(1, 64, seed = 7L).head
    val rows = pairs
      .select(
        VectorFunctions.planeDot(col("a"), plane).as("native"),
        aggregate(
          zip_with(VectorFunctions.toDouble(col("a")), lit(plane), (x, h) => x * h),
          lit(0.0d),
          (acc, x) => acc + x
        ).as("hof")
      )
      .collect()
    rows.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1))
      )
    }
  }

  test("null semantics: null input, length mismatch, null element all yield null") {
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),
      (2L, null.asInstanceOf[Array[Float]], Array(3f, 4f)),
      (3L, Array(1f, 2f, 5f), Array(3f, 4f))
    ).toDF("id", "a", "b")
    val out = df
      .select(col("id"), VectorFunctions.dot(col("a"), col("b")).as("d"))
      .orderBy("id")
      .collect()
    assert(out(0).getDouble(1) == 1f * 3f + 2f * 4f)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))

    val withNullElem = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as double), cast(null as double)), array(1.0d, 2.0d)) AS d"
    )
    assert(withNullElem.collect().head.isNullAt(0))
  }

  test("graft_dot resolves from plain SQL via GraftExtensions") {
    pairs.createOrReplaceTempView("nv_pairs")
    val n = spark
      .sql("SELECT id FROM nv_pairs WHERE graft_dot(a, b) IS NOT NULL")
      .count()
    assert(n == 200)
  }

  test("graft_lsh_buckets matches the per-plane Column formulation, table by table") {
    val (nTables, nPlanes, dim, seed) = (12, 14, 64, 42L)
    val vecs = (1 to 200).map(i => (i.toLong, vec(i, dim))).toDF("id", "v")
    val kernel = vecs
      .select(
        col("id"),
        call_function(
          "graft_lsh_buckets", col("v"), lit(nTables), lit(nPlanes), lit(dim), lit(seed)
        ).as("b"))
      .as[(Long, Seq[Int])]
      .collect()
      .toMap
    // the old formulation: one lshBucket (nPlanes sign-bit dots) per table
    val columnForm = vecs
      .select(
        col("id"),
        array((0 until nTables).map { t =>
          VectorFunctions.lshBucket(
            col("v"), VectorFunctions.randomPlanes(nPlanes, dim, seed + t))
        }: _*).as("b"))
      .as[(Long, Seq[Int])]
      .collect()
      .toMap
    assert(kernel.size == 200 && kernel == columnForm)

    // degenerate inputs keep the old semantics: wrong length / null
    // element -> null plane dots -> sign bit 0 -> every table buckets to 0
    val weird = Seq(
      (1L, Array(1.0f, 2.0f)),                       // wrong dim
      (2L, null.asInstanceOf[Array[Float]])          // null vector
    ).toDF("id", "v")
    val rows = weird
      .select(
        col("id"),
        call_function(
          "graft_lsh_buckets", col("v"), lit(nTables), lit(nPlanes), lit(dim), lit(seed)
        ).as("b"))
      .collect()
    val shortVec = rows.find(_.getLong(0) == 1L).get
    assert(shortVec.getSeq[Int](1) == Seq.fill(nTables)(0))
    val nullVec = rows.find(_.getLong(0) == 2L).get
    assert(nullVec.isNullAt(1), "null input array yields null (nullSafe kernel)")
  }

  test("graft_unit matches the staged HOF normalization bit-exactly, degenerate inputs included") {
    val vecs = (1 to 200).map(i => (i.toLong, vec(i, 64))).toDF("id", "v")
    def hofNorm(vc: org.apache.spark.sql.Column) = {
      val vd = VectorFunctions.toDouble(vc)
      // evaluated inline (the shape withNormalized used to stage)
      transform(vd, x =>
        when(sqrt(VectorFunctions.dotHof(vc, vc)) === 0.0, 0.0)
          .otherwise(x / sqrt(VectorFunctions.dotHof(vc, vc))))
    }
    val rows = vecs
      .select(
        call_function("graft_unit", col("v")).as("k"),
        hofNorm(col("v")).as("h"))
      .as[(Seq[Double], Seq[Double])]
      .collect()
    assert(rows.length == 200)
    rows.foreach { case (k, h) =>
      assert(k.length == h.length)
      k.zip(h).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b))
      }
    }
    // zero vector -> zero vector (not NaN); null vector -> null
    val degen = Seq(
      (1L, Array(0f, 0f, 0f)),
      (2L, null.asInstanceOf[Array[Float]])
    ).toDF("id", "v")
    val d = degen.select(col("id"), call_function("graft_unit", col("v")).as("u")).collect()
    assert(d.find(_.getLong(0) == 1L).get.getSeq[Double](1) == Seq(0.0, 0.0, 0.0))
    assert(d.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  test("the scoring projection stays inside WholeStageCodegen (HOF form does not)") {
    // parquet-backed frame: a local Seq would be folded away by
    // ConvertToLocalRelation before any codegen decision is made
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    def codegenOf(c: org.apache.spark.sql.Column): String =
      emb
        .select(c.as("d"))
        .queryExecution
        .executedPlan
        .toString

    // codegen'd operators render as "*(n) Project"; a bare "Project" is a
    // fallback stage (note: a plain "*" also appears as multiplication
    // inside lambda bodies, so match the star-with-stage-id form)
    val starredProject = """\*\(\d+\)\s*Project""".r

    val native = codegenOf(VectorFunctions.dot(col("embedding"), col("embedding")))
    assert(starredProject.findFirstIn(native).isDefined, s"native not codegen'd:\n$native")

    val hof = codegenOf(VectorFunctions.dotHof(col("embedding"), col("embedding")))
    assert(
      starredProject.findFirstIn(hof).isEmpty,
      "HOF projection unexpectedly codegen'd — native kernel may be unnecessary"
    )
  }

  test("graft_cell_dots matches the per-centroid planeDot array bit-exactly, nulls included") {
    import spark.implicits._
    val cents = graft.operators.IvfCentroids.cells
    val emb = Tables.embeddings(spark, Sf).select(col("vec_id"), col("embedding"))
    val kernel = emb
      .select(col("vec_id"), VectorFunctions.cellDots(col("embedding"), cents).as("cd"))
    val column = emb
      .select(
        col("vec_id"),
        array(cents.map(c => VectorFunctions.planeDot(col("embedding"), c)): _*).as("cd"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Seq[Double])].collect().toMap
    // bit-identical (map equality on raw doubles, no tolerance): the
    // kernel replaces the Column form wherever C scales with the corpus,
    // so any drift would silently move IVF cell boundaries
    assert(rows(kernel) == rows(column))

    // null surface: null vector -> null; wrong length or null element ->
    // array of C nulls (every shared-v planeDot was null in the Column form)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}
    val nullAt7: Seq[java.lang.Double] =
      (0 until 64).map(i => if (i == 7) null else java.lang.Double.valueOf(1.0))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null),                                  // null vector
        Row(2L, Seq(1.0, 2.0)),                         // wrong length
        Row(3L, nullAt7)                                // null element
      )),
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(DoubleType))
      ))
    )
    val got = df
      .select(col("vec_id"), VectorFunctions.cellDots(col("embedding"), cents).as("cd"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Any](1)))
      .toMap
    assert(got(1L) == null)
    assert(got(2L) == Seq.fill(cents.size)(null))
    assert(got(3L) == Seq.fill(cents.size)(null))
  }
}
