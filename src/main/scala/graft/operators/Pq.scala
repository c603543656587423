package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the ANN storage codec for 100 TB memory
  * budgets (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011).
  *
  * A unit-normalized `dim`-vector is split into `M` contiguous
  * subvectors; each subspace has its own `Ksub`-centroid codebook, and a
  * vector is stored as M small codes — here M=16 x 4-bit codes = 16
  * BYTES per 64-float embedding (16x smaller than float32, vs 4x for
  * int8). Search is ASYMMETRIC (ADC): the query stays full-precision,
  * per-subspace lookup tables hold dot(query_sub, centroid), and a
  * corpus vector's approximate dot product is M table lookups over its
  * CODES — the corpus floats are never touched until a final exact
  * rerank of the ADC shortlist (the standard two-stage production
  * shape; on near-isotropic data ADC alone ranks poorly, and the
  * shortlist+rerank recovers recall 0.92 where raw ADC gives 0.40 —
  * PqSpec pins both).
  *
  * All engine-side math is driver-shipped literals + the codegen'd
  * `graft_dot` kernel, so the DuckDB oracle reproduces codes bit-wise
  * (same construction as [[Similarity.ivfTopK]]'s centroids).
  */
object Pq {

  /** Stage a unit-normalized double copy of `vecCol` as `outCol` via the
    * native one-pass kernel ([[graft.functions.UnitNormalize]]) — same
    * IEEE ops (left-to-right dot, one sqrt, per-element divide) as the
    * oracle's list_transform over list_dot_product, so values are
    * bit-identical. An all-zero vector stays all-zero (0/0 would be
    * NaN, and NaN ordering differs between engines — zero keeps the
    * downstream argmax deterministic).
    *
    * Was a withColumn chain (__vd -> __nrm -> transform lambda):
    * projection collapse re-inlined that lambda into every consumer —
    * 16 copies at the IVF cell assignment — and the generated method
    * blew Janino's 64 KB limit, dropping whole ANN stages to
    * interpreted execution (see the kernel's scaladoc).
    */
  def withNormalized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, call_function("graft_unit", col(vecCol)))

  /** Per-subspace argmin-L2 assignment scores via the native
    * [[graft.functions.PqScores]] kernel: for centroid c,
    * argmin ||x - c||^2 == argmax (dot(x, c) - ||c||^2 / 2), evaluated
    * as ONE kernel call over the subrange `vn[offset, offset+sub)`
    * instead of ksub separate slice+dot expressions — the Column form's
    * m x ksub expression fan-out blew Janino's 64 KB method limit and
    * dropped PQ stages to interpreted execution. Arithmetic order
    * (left-to-right dot, then `- halfNorm`) is unchanged, so scores and
    * codes are bit-identical to the oracle.
    */
  private def scoreArr(vn: Column, offset: Int, book: Seq[Array[Double]]): Column = {
    val sub  = book.head.length
    val half = book.map(c => c.map(x => x * x).sum / 2.0)
    call_function(
      "graft_pq_scores", vn, lit(0),
      lit(book.flatten.toArray), lit(Array.empty[Double]), lit(half.toArray),
      lit(offset), lit(sub), lit(book.size))
  }

  /** Query-side ADC lookup table for one subspace: plain per-code dots
    * (no bias terms), same kernel. */
  private def lutArr(vn: Column, offset: Int, book: Seq[Array[Double]]): Column =
    call_function(
      "graft_pq_scores", vn, lit(0),
      lit(book.flatten.toArray), lit(Array.empty[Double]), lit(Array.empty[Double]),
      lit(offset), lit(book.head.length), lit(book.size))

  /** Train `m` per-subspace codebooks (each `ksub` centroids of
    * dim/m values) with plain L2 Lloyd iterations — ONE distributed
    * job per round for ALL subspaces (explode to (subspace, cell,
    * subvector), then a (m, cell)-keyed partial-aggregated sum).
    * Deterministic md5-ordered init samples the same rows for every
    * subspace, but each subspace takes its first `ksub` DISTINCT
    * subvectors from the sample (duplicate subvectors in one subspace
    * would seed duplicate centroids, and the first-max assignment
    * tiebreak would leave the copies as permanently dead codes). If the
    * sample has fewer than `ksub` distinct subvectors the remainder
    * fills with duplicates — the dead-code possibility then is real but
    * so is the degenerate corpus. Vectors are normalized before
    * training — PQ here approximates COSINE via dot products on unit
    * vectors.
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      iters: Int
  ): Seq[Seq[Array[Double]]] = {
    require(dim % m == 0, s"m ($m) must divide dim ($dim)")
    val v = withNormalized(
      corpus.select(col(idCol).as("id"), col(vecCol).as("__vec")),
      "__vec",
      "vn"
    ).select(col("id"), col("vn"))
    lloyd(v, dim, m, ksub, iters)
  }

  /** The shared Lloyd core over an already-staged `(id, vn)` frame —
    * `vn` is used EXACTLY as given (no renormalization), so residual
    * training can feed non-unit vectors through the same loop.
    */
  private def lloyd(
      v: DataFrame,
      dim: Int,
      m: Int,
      ksub: Int,
      iters: Int
  ): Seq[Seq[Array[Double]]] = {
    val sub = dim / m
    // oversample so per-subspace dedup has replacement rows to draw from
    val sample: Array[Array[Double]] = v
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(math.max(ksub * 4, ksub + 16))
      .select(col("vn"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= ksub, s"corpus has fewer than ksub=$ksub vectors")
    var books: IndexedSeq[IndexedSeq[Array[Double]]] = (0 until m).map { mi =>
      val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
      sample.iterator
        .map(r => r.slice(mi * sub, (mi + 1) * sub).toSeq)
        .foreach(s => if (seen.size < ksub) seen += s)
      val distinct = seen.toIndexedSeq.map(_.toArray)
      // fewer than ksub distinct subvectors: fill back with sample rows
      // (duplicates) to keep the codebook shape — degenerate-corpus path
      val filled = (distinct ++ (0 until ksub).map(j =>
        sample(j % sample.length).slice(mi * sub, (mi + 1) * sub))).take(ksub)
      filled
    }

    val sumCols = (0 until sub).map(i => sum(element_at(col("sv"), i + 1)).as(s"s$i"))
    for (_ <- 1 to iters) {
      val perSub = (0 until m).map { mi =>
        val sv = slice(col("vn"), mi * sub + 1, sub)
        struct(
          lit(mi).as("m"),
          (array_position(col(s"__sc$mi"), array_max(col(s"__sc$mi"))) - 1)
            .cast("int")
            .as("cell"),
          sv.as("sv")
        )
      }
      val staged = (0 until m).foldLeft(v) { (df, mi) =>
        df.withColumn(s"__sc$mi", scoreArr(col("vn"), mi * sub, books(mi)))
      }
      val rows = staged
        .select(explode(array(perSub: _*)).as("a"))
        .select(col("a.m").as("m"), col("a.cell").as("cell"), col("a.sv").as("sv"))
        .groupBy(col("m"), col("cell"))
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getLong(2), Array.tabulate(sub)(i => r.getDouble(3 + i))))
        .toMap
      books = (0 until m).map { mi =>
        (0 until ksub).map { c =>
          rows.get((mi, c)) match {
            case Some((n, s)) if n > 0 => s.map(_ / n)
            case _                     => books(mi)(c)
          }
        }
      }
    }
    books.map(_.toSeq)
  }

  /** Train RESIDUAL codebooks (the FAISS IVFPQ encoding): each vector is
    * first assigned to its coarse IVF cell, and the codebooks quantize
    * `vn - centroid(cell)` instead of `vn`. Residuals concentrate the
    * codebook budget on WITHIN-cell variance (the coarse quantizer
    * already explains the between-cell part), which is what lifts ADC
    * ordering quality at the same code size.
    */
  def trainResidual(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      iters: Int,
      centroids: Seq[Array[Double]]
  ): Seq[Seq[Array[Double]]] = {
    require(dim % m == 0, s"m ($m) must divide dim ($dim)")
    val v = withResidual(
      withNormalized(
        corpus.select(col(idCol).as("id"), col(vecCol).as("__vec")),
        "__vec",
        "vn"
      ),
      "vn",
      centroids,
      "__res"
    ).select(col("id"), col("__res").as("vn"))
    lloyd(v, dim, m, ksub, iters)
  }

  /** Stage `outCol` = vnCol - centroid(assigned cell). Cell assignment
    * is the same argmax-dot / first-max tiebreak as [[Similarity.ivfTopK]];
    * the chosen centroid is staged as its own projected column before the
    * zip_with so the argmax is evaluated once, not once per element.
    */
  private def withResidual(
      df: DataFrame,
      vnCol: String,
      centroids: Seq[Array[Double]],
      outCol: String
  ): DataFrame =
    df.withColumn("__cd", VectorFunctions.cellDots(col(vnCol), centroids))
      .withColumn("__cell", (array_position(col("__cd"), array_max(col("__cd"))) - 1).cast("int"))
      .withColumn(
        "__cent",
        element_at(array(centroids.map(c => array(c.map(lit): _*)): _*), col("__cell") + 1)
      )
      .withColumn(outCol, zip_with(col(vnCol), col("__cent"), (a, b) => a - b))
      .drop("__cd", "__cell", "__cent")

  /** Per-(subspace, code) dot products against every cell centroid's
    * subvector — DRIVER-computed literals (left-to-right sums), shared
    * verbatim with the SQL oracle so residual scores are bit-identical
    * across engines: score(residual_sub, cv) decomposes as
    * dot(vn_sub, cv) - dot(cent_sub, cv) - ||cv||^2/2, and the middle
    * term is this table. Indexed [mi][code][cell].
    */
  def cellCodeDots(
      centroids: Seq[Array[Double]],
      codebooks: Seq[Seq[Array[Double]]]
  ): Seq[Seq[Array[Double]]] = {
    val sub = codebooks.head.head.length
    codebooks.zipWithIndex.map { case (book, mi) =>
      book.map { cv =>
        centroids.map { cent =>
          val cs = cent.slice(mi * sub, (mi + 1) * sub)
          (0 until sub).foldLeft(0.0)((acc, i) => acc + cs(i) * cv(i))
        }.toArray
      }
    }
  }

  /** Encode with RESIDUAL codes: adds the assigned IVF `cellCol` plus
    * int code columns pq0..pq{M-1} where code = argmin-L2 of
    * (vn - centroid(cell)) per subspace. The residual is never
    * materialized: the score decomposes into the raw subspace dot minus
    * the [[cellCodeDots]] literal for the assigned cell (identical
    * IEEE ops on both engines). The staged normalized vector survives
    * as `vnCol` for rerank callers.
    */
  def withResidualCodes(
      df: DataFrame,
      vecCol: String,
      centroids: Seq[Array[Double]],
      codebooks: Seq[Seq[Array[Double]]],
      vnCol: String = "vn",
      cellCol: String = "cell"
  ): DataFrame = {
    val m    = codebooks.size
    val sub  = codebooks.head.head.length
    val ccd  = cellCodeDots(centroids, codebooks)
    val base = withNormalized(df, vecCol, vnCol)
      .withColumn("__cd", VectorFunctions.cellDots(col(vnCol), centroids))
      .withColumn(cellCol, (array_position(col("__cd"), array_max(col("__cd"))) - 1).cast("int"))
    val staged = (0 until m).foldLeft(base) { (d, mi) =>
      d.withColumn(
        s"__sc$mi",
        // kernel preserves the exact term order (dot - ccd - half) the
        // Column form used, so residual codes stay bit-identical
        call_function(
          "graft_pq_scores", col(vnCol), col(cellCol),
          lit(codebooks(mi).flatten.toArray),
          lit(ccd(mi).flatten.toArray), // [code][cell] row-major = c*nCells+cell
          lit(codebooks(mi).map(cv => cv.map(x => x * x).sum / 2.0).toArray),
          lit(mi * sub), lit(sub), lit(codebooks(mi).size)
        )
      )
    }
    val codes = (0 until m).map { mi =>
      (array_position(col(s"__sc$mi"), array_max(col(s"__sc$mi"))) - 1)
        .cast("int")
        .as(s"pq$mi")
    }
    staged.select(df.columns.map(col) ++ Seq(col(vnCol), col(cellCol)) ++ codes: _*)
  }

  /** IVF-PQ with RESIDUAL encoding — the full FAISS IVFPQ shape. Same
    * plan as [[ivfPqTopK]] (cells prune, ADC equi-join on cell,
    * shortlist window over (ids, adc), exact rerank) with two changes:
    * corpus codes quantize the residual, and the ADC score adds the
    * query-to-centroid dot back in:
    *   dot(q, v) ~ dot(q, cent(cell)) + sum_m LUT_m[code_m]
    * (the probe side already carries dot(q, cent) — it is the probe
    * ranking key). Residual codebooks make the second term a tighter
    * estimate of dot(q, v - cent), so the shortlist ordering — and with
    * it recall at a fixed shortlist — improves at identical cost.
    */
  def ivfPqResidualTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Seq[Array[Double]],
      codebooks: Seq[Seq[Array[Double]]],
      nProbe: Int,
      shortlist: Int,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.size, "nProbe must be in [1, centroids.size]")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val m   = codebooks.size
    val sub = codebooks.head.head.length

    def cellDots(v: Column): Column =
      VectorFunctions.cellDots(v, centroids)

    // materialized once for the same two-consumer reason as ivfPqTopK
    // (round 15); EAGER — construction runs the residual encode
    val encoded = Materialize.frame(
      withResidualCodes(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__vec")),
        "__vec",
        centroids,
        codebooks,
        vnCol = "c_vn"
      ),
      checkpointDir)
    val codes   = encoded.select(
      col("neighbor_id") +: col("cell") +: (0 until m).map(i => col(s"pq$i")): _*
    )
    val vectors = encoded.select(col("neighbor_id"), col("c_vn"))

    val qw = Window.partitionBy(col("query_id")).orderBy(col("celldot").desc, col("cell").asc)
    val qBase = (0 until m).foldLeft(
      withNormalized(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")),
        "__qv",
        "q_vn"
      ).withColumn("__cd", cellDots(col("q_vn")))
    ) { (d, mi) =>
      d.withColumn(
        s"__lut$mi",
        lutArr(col("q_vn"), mi * sub, codebooks(mi))
      )
    }
    val qProbes = qBase
      .select(
        col("query_id") +: posexplode_outer(col("__cd")).as(Seq("cell", "celldot")) +:
          (0 until m).map(i => col(s"__lut$i")): _*
      )
      .where(col("cell").isNotNull)
      .withColumn("rn", row_number().over(qw))
      .where(col("rn") <= nProbe)
      .drop("rn")

    // celldot leads the fixed left-to-right sum (oracle mirrors the order)
    val adc = (col("celldot") +: (0 until m)
      .map(i => element_at(col(s"__lut$i"), col(s"pq$i") + 1))).reduce(_ + _)
    val ws = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("neighbor_id").asc)
    val short = codes
      .join(broadcast(qProbes), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("adc"))
      .withColumn("srank", row_number().over(ws))
      .where(col("srank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))

    val wk = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    short
      .join(vectors, "neighbor_id")
      .join(
        broadcast(qBase.select(col("query_id"), col("q_vn"))),
        "query_id"
      )
      .withColumn("cos", VectorFunctions.dotD(col("q_vn"), col("c_vn")))
      .withColumn("rank", row_number().over(wk))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Encode: add int code columns pq0..pq{M-1} (argmin L2 per subspace,
    * FIRST-max tiebreak like ivfTopK's cell assignment) plus the staged
    * normalized vector as `vnCol` for callers that rerank. Narrow map
    * stage: M * Ksub compiled dot products per row.
    */
  def withCodes(
      df: DataFrame,
      vecCol: String,
      codebooks: Seq[Seq[Array[Double]]],
      vnCol: String = "vn"
  ): DataFrame = {
    val m   = codebooks.size
    val sub = codebooks.head.head.length
    val staged = (0 until m).foldLeft(withNormalized(df, vecCol, vnCol)) { (d, mi) =>
      d.withColumn(s"__sc$mi", scoreArr(col(vnCol), mi * sub, codebooks(mi)))
    }
    val codes = (0 until m).map { mi =>
      (array_position(col(s"__sc$mi"), array_max(col(s"__sc$mi"))) - 1)
        .cast("int")
        .as(s"pq$mi")
    }
    staged.select(df.columns.map(col) ++ Seq(col(vnCol)) ++ codes: _*)
  }

  /** Two-stage PQ ANN: ADC shortlist over codes, exact cosine rerank.
    *
    *   1. corpus side: codes only (M ints per row after the one-time
    *      encode — at scale this is the frame that fits in memory);
    *   2. queries broadcast with per-subspace LUTs (Ksub dots each);
    *      approximate dot = sum of M `element_at` lookups — no corpus
    *      floats touched;
    *   3. top-`shortlist` per query by ADC score (WindowGroupLimit);
    *   4. rerank: join the shortlist pairs BACK to the corpus vectors
    *      by id (the disk fetch in production) and take exact-cosine
    *      top-k.
    *
    * Output: (query_id, neighbor_id, rank, cos) like the other ANN paths.
    */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      codebooks: Seq[Seq[Array[Double]]],
      shortlist: Int
  ): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val m   = codebooks.size
    val sub = codebooks.head.head.length

    val encoded = withCodes(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__vec")),
      "__vec",
      codebooks,
      vnCol = "c_vn"
    )
    val codes   = encoded.select(col("neighbor_id") +: (0 until m).map(i => col(s"pq$i")): _*)
    val vectors = encoded.select(col("neighbor_id"), col("c_vn"))

    val qLuts = (0 until m).foldLeft(
      withNormalized(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")),
        "__qv",
        "q_vn"
      )
    ) { (d, mi) =>
      d.withColumn(
        s"__lut$mi",
        lutArr(col("q_vn"), mi * sub, codebooks(mi))
      )
    }.select(col("query_id") +: col("q_vn") +: (0 until m).map(i => col(s"__lut$i")): _*)

    val adc = (0 until m)
      .map(i => element_at(col(s"__lut$i"), col(s"pq$i") + 1))
      .reduce(_ + _)
    val ws = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("neighbor_id").asc)
    // project down to (query_id, neighbor_id, adc) BEFORE the ranking
    // window: the sort would otherwise spill rows carrying the query
    // vector and all M LUT arrays (~300 doubles each) — the ids+score
    // projection keeps the shuffle/sort narrow, and the query vector
    // rejoins from the tiny broadcast side at rerank
    val short = codes
      .join(broadcast(qLuts.drop("q_vn")), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("adc"))
      .withColumn("srank", row_number().over(ws))
      .where(col("srank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))

    // exact rerank on the shortlist only — unit vectors, so cosine = dot
    val wk = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    short
      .join(vectors, "neighbor_id")
      .join(broadcast(qLuts.select(col("query_id"), col("q_vn"))), "query_id")
      .withColumn("cos", VectorFunctions.dotD(col("q_vn"), col("c_vn")))
      .withColumn("rank", row_number().over(wk))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** IVF-PQ — the composed 100 TB ANN index (the FAISS IVFPQ shape):
    * the trained coarse quantizer PARTITIONS the corpus into cells
    * (only nProbe/C of the corpus is ever touched per query), PQ codes
    * provide the in-cell ADC scoring (16 bytes per vector in the
    * scan), and an exact rerank of the per-query shortlist recovers
    * full-precision ordering. Both stages reuse the shipped artifacts
    * ([[IvfCentroids]], [[PqCodebooks]]).
    *
    * Cell assignment runs on the normalized vector — argmax dot is
    * invariant to the positive per-vector scale, so cells are identical
    * to [[Similarity.ivfTopK]]'s raw-vector assignment.
    *
    * Plan shape: corpus side is one narrow map stage (C cell dots +
    * M*Ksub code dots per row, all compiled `graft_dot`); queries fan
    * out only nProbe-fold and broadcast; the ADC join is an equi-join
    * on `cell`; the shortlist window sees only (ids, adc); the rerank
    * fetches shortlist vectors by id join-back.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Seq[Array[Double]],
      codebooks: Seq[Seq[Array[Double]]],
      nProbe: Int,
      shortlist: Int,
      checkpointDir: Option[String] = None
  ): DataFrame =
    // the IN-QUERY composition materializes the encode output once —
    // exactly the frame the store path persists — so the search half's
    // two consumers (codes shortlist + vector rerank) read blocks
    // instead of scanning and normalizing the corpus twice (round 15).
    // EAGER: construction runs the encode. The store path
    // (ivfPqTopKEncoded over AnnIndex.readStore) is untouched: its
    // encoded frame is already persisted and must never be re-copied.
    ivfPqTopKEncoded(
      Materialize.frame(
        ivfPqEncode(corpus, idCol, vecCol, centroids, codebooks), checkpointDir),
      idCol, queries, vecCol, k, centroids, codebooks, nProbe, shortlist)

  /** The ENCODE half of [[ivfPqTopK]] on its own: assign every vector
    * its coarse cell (argmax centroid dot on the normalized vector,
    * first-max tiebreak) and its M PQ codes against FROZEN artifacts.
    * This is the per-batch work of incremental index maintenance — a
    * new batch encodes against the shipped quantizers exactly like the
    * initial corpus did, independent of anything already stored
    * ([[AnnIndex]] appends the result to the bucketed store; the
    * ann_index_append oracle row pins append == full recompute).
    * Output: idCol + cell (int) + pq0..pq{M-1} (int) + `vn`
    * (normalized double vector, kept for the exact rerank fetch).
    */
  def ivfPqEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Array[Double]],
      codebooks: Seq[Seq[Array[Double]]]
  ): DataFrame = {
    val m = codebooks.size
    def cellDots(v: Column): Column =
      VectorFunctions.cellDots(v, centroids)
    withCodes(
      corpus.select(col(idCol), col(vecCol).as("__vec")),
      "__vec",
      codebooks,
      vnCol = "vn"
    )
      .withColumn("__cd", cellDots(col("vn")))
      .select(
        col(idCol) +:
          (array_position(col("__cd"), array_max(col("__cd"))) - 1).cast("int").as("cell") +:
          ((0 until m).map(i => col(s"pq$i")) :+ col("vn")): _*
      )
  }

  /** The SEARCH half of [[ivfPqTopK]] over an ALREADY-ENCODED corpus —
    * the production read path once an index store exists: queries never
    * pay the corpus encode, they probe the stored (cell, codes, vn)
    * rows directly. `encoded` must carry idCol + cell + pq0..pq{M-1} +
    * vn as [[ivfPqEncode]] emits (e.g. [[AnnIndex.readStore]]).
    * Results are identical to ivfPqTopK over the raw corpus: encoding
    * is deterministic per row, so where it happened cannot show.
    */
  def ivfPqTopKEncoded(
      encoded: DataFrame,
      idCol: String,
      queries: DataFrame,
      vecCol: String,
      k: Int,
      centroids: Seq[Array[Double]],
      codebooks: Seq[Seq[Array[Double]]],
      nProbe: Int,
      shortlist: Int
  ): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.size, "nProbe must be in [1, centroids.size]")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val m   = codebooks.size
    val sub = codebooks.head.head.length

    def cellDots(v: Column): Column =
      VectorFunctions.cellDots(v, centroids)

    val indexed = encoded.select(
      (col(idCol).as("neighbor_id") +: col("cell") +: col("vn").as("c_vn") +:
        (0 until m).map(i => col(s"pq$i"))): _*
    )
    val codes   = indexed.select(col("neighbor_id") +: col("cell") +: (0 until m).map(i => col(s"pq$i")): _*)
    val vectors = indexed.select(col("neighbor_id"), col("c_vn"))

    // query side: nProbe best cells + per-subspace LUTs, all broadcast
    val qw = Window.partitionBy(col("query_id")).orderBy(col("celldot").desc, col("cell").asc)
    val qBase = (0 until m).foldLeft(
      withNormalized(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")),
        "__qv",
        "q_vn"
      ).withColumn("__cd", cellDots(col("q_vn")))
    ) { (d, mi) =>
      d.withColumn(
        s"__lut$mi",
        lutArr(col("q_vn"), mi * sub, codebooks(mi))
      )
    }
    val qProbes = qBase
      .select(
        col("query_id") +: posexplode_outer(col("__cd")).as(Seq("cell", "celldot")) +:
          (0 until m).map(i => col(s"__lut$i")): _*
      )
      .where(col("cell").isNotNull)
      .withColumn("rn", row_number().over(qw))
      .where(col("rn") <= nProbe)
      .drop("rn", "celldot")

    val adc = (0 until m)
      .map(i => element_at(col(s"__lut$i"), col(s"pq$i") + 1))
      .reduce(_ + _)
    val ws = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("neighbor_id").asc)
    val short = codes
      .join(broadcast(qProbes), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("adc"))
      .withColumn("srank", row_number().over(ws))
      .where(col("srank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))

    val wk = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    short
      .join(vectors, "neighbor_id")
      .join(
        broadcast(qBase.select(col("query_id"), col("q_vn"))),
        "query_id"
      )
      .withColumn("cos", VectorFunctions.dotD(col("q_vn"), col("c_vn")))
      .withColumn("rank", row_number().over(wk))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
