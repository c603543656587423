package graft.operators

import graft.functions.{Fingerprint, TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines: MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Design for 100 TB:
  *   - signatures are computed as a narrow map stage (no shuffle) from
  *     engine-portable seeded md5 hashes (Fingerprint.seededLongHash);
  *   - candidate generation is a self-join on LSH band/bucket keys —
  *     shuffle is proportional to the number of (bucket, doc) pairs, not
  *     to |docs|^2;
  *   - exact verification (Jaccard / cosine) runs only on candidates.
  */
object ApproxDedup {
  /** Word n-gram (shingle) array, n >= 1, via sliding window over tokens.
    * Expressed with transform over index offsets (no explode needed).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    if (n == 1) toks
    else {
      // positions 0 .. size-n; shingle_i = tokens[i] .. tokens[i+n-1]
      val idx = sequence(lit(0), size(toks) - n)
      transform(idx, i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    }
  }

  /** One MinHash value: min over distinct shingles of seeded 60-bit hash. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(array_distinct(shingleArr), s => Fingerprint.seededLongHash(s, seed)))

  /** MinHash signature as `nHashes` columns named mh0..mh{n-1}. */
  def withMinhashSignature(df: DataFrame, text: Column, n: Int, nHashes: Int): DataFrame = {
    val sh = shingles(text, n)
    (0 until nHashes).foldLeft(df)((d, i) => d.withColumn(s"mh$i", minhash(sh, i)))
  }

  /** LSH candidate pairs: docs sharing any band of `rowsPerBand`
    * consecutive minhashes. Returns (id_a, id_b) with id_a < id_b,
    * distinct across bands. The band fingerprint is md5 of the band's
    * minhash values, so the join key is narrow.
    */
  def lshCandidatePairs(
      sigs: DataFrame,
      idCol: String,
      nHashes: Int,
      rowsPerBand: Int
  ): DataFrame = {
    val nBands = nHashes / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val bandCols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      struct(lit(b).as("band"), Fingerprint.rowHash(bandCols).as("sig"))
    }
    val buckets = sigs
      .select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val a = buckets.select(col("band"), col("sig"), col(idCol).as("id_a"))
    val b = buckets.select(col("band"), col("sig"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact Jaccard similarity between two shingle-set columns (arrays). */
  def jaccard(aSet: Column, bSet: Column): Column = {
    val inter = size(array_intersect(aSet, bSet)).cast("double")
    val uni   = size(array_union(aSet, bSet)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  /** n-gram Jaccard near-dup pairs above `threshold`, verified exactly.
    * Candidates come from a shared-shingle join (every colliding pair
    * shares >= 1 shingle, so recall is exact for threshold > 0); at scale
    * swap the candidate stage for `lshCandidatePairs`.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      text: Column,
      n: Int,
      threshold: Double
  ): DataFrame = {
    val withSets = docs.select(col(idCol), array_distinct(shingles(text, n)).as("sh"))
    val exploded = withSets.select(col(idCol), explode(col("sh")).as("s"))
    val cand = exploded
      .select(col("s"), col(idCol).as("id_a"))
      .join(exploded.select(col("s"), col(idCol).as("id_b")), Seq("s"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val aSets = withSets.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val bSets = withSets.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    cand
      .join(aSets, "id_a")
      .join(bSets, "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash of a token multiset over the low `nBits` bits of the seeded
    * token hash: bit b is set iff sum over tokens of (+1 if hash bit b
    * set else -1) > 0. Computed per row with array expressions — a pure
    * map stage, no explode/shuffle.
    */
  def simhash(text: Column, nBits: Int): Column = {
    val hashes = transform(TextFunctions.tokens(text), t => Fingerprint.seededLongHash(t, 0))
    (0 until nBits)
      .map { b =>
        val contrib = aggregate(
          hashes,
          lit(0L),
          (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)
        )
        when(contrib > 0, lit(1L) * (1L << b)).otherwise(0L)
      }
      .reduce(_ + _)
  }

  /** Hamming distance between two simhash values (over nBits). */
  def hammingDistance(a: Column, b: Column, nBits: Int): Column =
    (0 until nBits)
      .map(bit => shiftright(a.bitwiseXOR(b), bit).bitwiseAND(1))
      .reduce(_ + _)

  /** Embedding-cosine near-duplicate pairs above `threshold`.
    * Candidate stage: random-hyperplane LSH buckets (collision-based);
    * verification: exact cosine. At 100 TB the bucket join replaces the
    * quadratic cross-join.
    */
  def cosineNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int,
      dim: Int,
      threshold: Double
  ): DataFrame = {
    val planes = VectorFunctions.randomPlanes(nPlanes, dim)
    val bucketed = emb.select(
      col(idCol),
      col(vecCol),
      VectorFunctions.lshBucket(col(vecCol), planes).as("bucket")
    )
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .distinct()
  }
}
