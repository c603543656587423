package graft.operators

import graft.functions.{Fingerprint, TextFunctions, VectorFunctions}
import graft.{functions => functions_}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines: MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Design for 100 TB:
  *   - signatures are computed as a narrow map stage (no shuffle) from
  *     engine-portable seeded md5 hashes (Fingerprint.seededLongHash);
  *   - the shingle array is materialized into its own projection before
  *     fan-out into per-seed minhashes, so Catalyst's CollapseProject
  *     keeps it evaluated ONCE per row (it refuses to inline non-cheap
  *     expressions referenced more than once) instead of once per seed;
  *   - candidate generation is groupBy(bucket) + in-bucket pair
  *     expansion, NOT a bucket self-join: one shuffle of narrow
  *     (bucket, id) rows, a single evaluation of the signature pipeline,
  *     and shuffle volume proportional to the number of (bucket, doc)
  *     pairs, never |docs|^2. Degenerate buckets (massive exact-dup
  *     families, adversarial collisions) are truncated to the first
  *     `maxBucket` ids in sorted order — deterministic, oracle-mirrorable,
  *     and a no-op on healthy data — so no single task ever materializes
  *     an unbounded B^2/2 pair expansion;
  *   - exact verification (Jaccard / cosine) runs only on candidates.
  */
object ApproxDedup {
  /** Word n-gram (shingle) array, n >= 1, via sliding window over tokens.
    * Expressed with transform over index offsets (no explode needed).
    *
    * PERF: only for one-off/filter use. Inside higher-order lambdas
    * Spark re-evaluates the argument subtree at EVERY reference — here
    * each of the n element_at calls per window re-runs split(text), so
    * shingling straight off text is O(T^2) string splits per document.
    * Hot paths must materialize the token array in its own projection
    * and call shinglesOfTokens on the column reference (round-2 fix:
    * this single duplication made the sf0.1 jaccard/minhash queries
    * ~100x slower than the same plan over staged tokens).
    */
  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(TextFunctions.tokens(text), n)

  /** Shingle array over an ALREADY-MATERIALIZED token-array column —
    * pass a plain column reference so every element_at is an O(1) array
    * access, not a re-evaluation of the tokenizer.
    */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    if (n == 1) toks
    else {
      // positions 0 .. size-n; shingle_i = tokens[i] .. tokens[i+n-1].
      // Guarded: sequence(0, negative) counts DOWNWARD, which would send
      // element_at out of bounds for docs shorter than n tokens — those
      // yield an empty array instead.
      val idx = sequence(lit(0), size(toks) - n)
      when(size(toks) >= n,
        transform(idx, i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(slice(toks, 1, 0))
    }

  /** Hard ceiling on bucket width for in-bucket pair expansion: a bucket
    * of B ids materializes B(B-1)/2 pairs in ONE task, so an uncapped
    * degenerate bucket (mass-duplicated content, an adversarial band
    * collision) is a single-task OOM at scale. Buckets are truncated to
    * the first `maxBucket` ids in sorted order — deterministic on both
    * engines (oracles mirror the same list-slice), and a no-op whenever
    * every bucket is narrower than the cap. 4096 ids = ~8.4M pairs from
    * one task, the most a healthy task should ever emit.
    */
  val DefaultMaxBucket = 4096

  /** All unordered pairs (a, b) with a < b from a sorted-ascending,
    * duplicate-free id array, capped to the first `maxBucket` ids —
    * the native [[graft.functions.IdPairs]] kernel (compiled loop inside
    * the bucket's own task, no join; the old nested-transform HOF form
    * allocated an interpreted slice per outer element).
    */
  private def pairsWithin(ids: Column, maxBucket: Int): Column =
    call_function("graft_id_pairs", ids, lit(maxBucket))

  // NOTE on payload-bearing pair expansion: every pair operator now runs
  // a FUSED native kernel (graft_hamming_pairs / graft_cosine_pairs /
  // graft_sig_agree_pairs) that loops the capped bucket compiled and
  // allocates only for emitted pairs. Two rejected designs, kept for the
  // record: (1) a bucket-local id->payload MAP probed per pair is an
  // O(B) element_at scan that filter pushdown re-evaluates at every
  // predicate term (the round-2 650 s simhash-pairs regression);
  // (2) a Column-level nested-transform expansion carrying payload
  // structs is interpreted per pair and materializes every candidate
  // before the verify filter runs (~57 of 60 s of the pre-fusion query).

  /** Affine re-hash family for MinHash over one md5 base hash:
    * mh_i = min over shingles of (A_i * h + B_i) mod P, with
    * h = md5-derived base hash reduced mod P and P = 2^31 - 1 (Mersenne
    * prime). One md5 per shingle TOTAL — the classic k-permutations
    * construction costs one cryptographic hash per (shingle, seed).
    * Products stay < 2^62, so the arithmetic is overflow-free in both
    * Spark Longs and ANSI BIGINT (the oracle mirrors it verbatim).
    */
  val MinhashMod: Long = functions_.MinhashFamily.Mod
  def affineA(i: Int): Long = functions_.MinhashFamily.a(i)
  def affineB(i: Int): Long = functions_.MinhashFamily.b(i)

  /** Base hash of one shingle: 60-bit md5 prefix reduced mod P. */
  def baseHash(s: Column): Column =
    Fingerprint.hexToLong(md5(s)) % MinhashMod

  /** One MinHash value: min over distinct shingles of the i-th affine
    * re-hash of the md5 base hash.
    */
  def minhash(shingleArr: Column, i: Int): Column =
    array_min(
      transform(array_distinct(shingleArr), s => (baseHash(s) * affineA(i) + affineB(i)) % MinhashMod)
    )

  /** MinHash signature as `nHashes` columns named mh0..mh{n-1}.
    * The base-hash array (one md5 per distinct shingle) is staged in its
    * own projection so the signature kernel reads one materialized array
    * instead of re-deriving shingles + md5 from raw text; the signature
    * itself is the native single-pass [[graft.functions.MinhashSignature]]
    * kernel (one codegen'd loop for all `nHashes` mins), staged likewise
    * so the per-seed `element_at` projections read it once.
    */
  def withMinhashSignature(df: DataFrame, text: Column, n: Int, nHashes: Int): DataFrame = {
    // base hashes via graft_md5_longs (native loop; bit-identical to
    // transform(shingles, baseHash) — Md5LongsSpec); distinct runs on
    // the hashed longs, equivalent to distinct shingles under injective
    // md5 and cheaper to compare
    val staged = df
      .withColumn("__toks", TextFunctions.tokens(text))
      .withColumn(
        "__baseHashes",
        array_distinct(
          call_function(
            "graft_md5_longs",
            shinglesOfTokens(col("__toks"), n),
            lit(""),
            lit(MinhashMod)
          )
        )
      )
      .withColumn("__sig", functions_.MinhashFamily.signature(col("__baseHashes"), nHashes))
    val sigCols = (0 until nHashes).map(i => element_at(col("__sig"), i + 1).as(s"mh$i"))
    staged
      .select(df.columns.map(col) ++ sigCols: _*)
  }

  /** Flattened LSH band rows (id, band, sig): one row per (doc, band)
    * with the band's md5 fingerprint over its `rowsPerBand` consecutive
    * minhashes. This is the PERSISTABLE unit of LSH state — what an
    * incremental pipeline stores per corpus document
    * ([[IncrementalDedup]]) and what in-corpus banding groups by. Narrow
    * (long, int, 32-char string) rows, produced by a single explode from
    * the signature columns — no shuffle.
    */
  def bandRows(
      sigs: DataFrame,
      idCol: String,
      nHashes: Int,
      rowsPerBand: Int
  ): DataFrame = {
    require(
      nHashes % rowsPerBand == 0,
      s"rowsPerBand ($rowsPerBand) must divide nHashes ($nHashes): leftover signature " +
        "positions would be silently excluded from banding"
    )
    val nBands = nHashes / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val bandCols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      struct(lit(b).as("band"), Fingerprint.rowHash(bandCols).as("sig"))
    }
    sigs
      .select(col(idCol).as("id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
  }

  /** In-bucket candidate pairs from band rows: groupBy(band, sig) +
    * capped native pair expansion — ONE narrow shuffle, never a bucket
    * self-join. `dedup = false` skips the trailing distinct for callers
    * that union several pair sources and dedup once at the end (one
    * shuffle over the union instead of one per branch).
    */
  def pairsFromBandRows(
      bands: DataFrame,
      maxBucket: Int = DefaultMaxBucket,
      dedup: Boolean = true
  ): DataFrame = {
    val pairs = bands
      .groupBy(col("band"), col("sig"))
      .agg(array_sort(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(pairsWithin(col("ids"), maxBucket)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
    if (dedup) pairs.distinct() else pairs
  }

  /** LSH candidate pairs: docs sharing any band of `rowsPerBand`
    * consecutive minhashes. Returns (id_a, id_b) with id_a < id_b,
    * distinct across bands. The band fingerprint is md5 of the band's
    * minhash values, so the grouping key is narrow; pairs are generated
    * inside each bucket after a single groupBy shuffle (no self-join,
    * no second evaluation of the signature pipeline).
    */
  def lshCandidatePairs(
      sigs: DataFrame,
      idCol: String,
      nHashes: Int,
      rowsPerBand: Int,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame =
    pairsFromBandRows(bandRows(sigs, idCol, nHashes, rowsPerBand), maxBucket)

  /** MinHash Jaccard ESTIMATION over LSH candidate pairs: for every pair
    * of docs sharing a band, the fraction of signature positions that
    * agree — the unbiased MinHash estimator of Jaccard similarity
    * (E[mh_i(A) = mh_i(B)] = J(A,B)). This is the cheap scorer a corpus
    * pipeline runs INSTEAD of exact verification when candidate volume
    * makes array_intersect joins too expensive: signatures are nHashes
    * longs (fixed width, already computed for banding), so scoring is
    * O(nHashes) per pair with no join back to the shingle sets.
    *
    * Same bucketed shape as the other pair operators: one groupBy
    * shuffle, fused capped in-bucket expansion + scoring
    * ([[graft.functions.SigAgreePairs]]). Output: (id_a, id_b, n_match,
    * jaccard_est) with jaccard_est = n_match / nHashes (exact in binary
    * for power-of-two nHashes — engine-portable as a double).
    */
  def minhashJaccardEstimates(
      docs: DataFrame,
      idCol: String,
      text: Column,
      n: Int,
      nHashes: Int,
      rowsPerBand: Int,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = {
    require(
      nHashes % rowsPerBand == 0,
      s"rowsPerBand ($rowsPerBand) must divide nHashes ($nHashes): leftover signature " +
        "positions would be excluded from banding but still counted in the estimate denominator"
    )
    val nBands = nHashes / rowsPerBand
    val sigs = withMinhashSignature(
      docs.select(col(idCol).as("id"), text.as("__text")),
      col("__text"),
      n,
      nHashes
    ).select(col("id"), array((0 until nHashes).map(i => col(s"mh$i")): _*).as("sg"))
    val bandStructs = (0 until nBands).map { b =>
      val bandCols =
        (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => element_at(col("sg"), i + 1))
      struct(lit(b).as("band"), Fingerprint.rowHash(bandCols).as("sig"))
    }
    // fused native expansion+score (graft_sig_agree_pairs): every
    // candidate is output with its estimate (no filter), so the fusion
    // removes the interpreted expansion and the nHashes element_at
    // probes per pair — signatures are read once per bucket element
    sigs
      .select(col("id"), col("sg"), explode(array(bandStructs: _*)).as("bk"))
      .groupBy(col("bk.band").as("band"), col("bk.sig").as("sig"))
      .agg(array_sort(collect_list(struct(col("id").as("id"), col("sg").as("sg")))).as("xs"))
      .where(size(col("xs")) > 1)
      .select(explode(call_function("graft_sig_agree_pairs", col("xs"), lit(maxBucket))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("p.n_match").as("n_match"))
      .distinct()
      .withColumn("jaccard_est", col("n_match").cast("double") / nHashes)
  }

  /** Exact Jaccard similarity between two shingle-set columns (arrays). */
  def jaccard(aSet: Column, bSet: Column): Column = {
    val inter = size(array_intersect(aSet, bSet)).cast("double")
    val uni   = size(array_union(aSet, bSet)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  /** n-gram Jaccard near-dup pairs above `threshold`, verified exactly,
    * with an AllPairs/PPJoin-style PREFIX-FILTERED candidate stage
    * (Bayardo et al., WWW'07; Vernica et al., SIGMOD'10 for the
    * group-by-prefix-token MapReduce shape):
    *
    *   1. per-doc sorted distinct shingle set (narrow map stage);
    *   2. global shingle document-frequency (one count shuffle);
    *   3. each doc keeps only its PREFIX — the first
    *      |d| - ceil(t*|d|) + 1 shingles in rare-first (df asc, shingle
    *      asc) global order. Any pair with J >= t must share a shingle
    *      lying in BOTH prefixes under a consistent total order, so
    *      recall stays exact while the highest-frequency ~t*|d| shingles
    *      of every doc — exactly the stopword shingles whose buckets
    *      blow up quadratically — never enter candidate generation;
    *   4. candidates = in-bucket pairs over prefix shingles only,
    *      bucket-capped (see DefaultMaxBucket);
    *   5. exact verify: join the two shingle sets back, |intersection|
    *      via array_intersect, |union| = |a| + |b| - |intersection|.
    *
    * vs the naive shared-shingle candidate stage (round 1): a shingle
    * shared by B docs emitted B^2/2 candidate pairs from one task; with
    * rare-first prefixes a frequent shingle is ranked past the prefix
    * cutoff in almost every doc that contains it, so its bucket — and
    * the candidate count — collapses. 129.7s -> low single digits at
    * sf0.1 for identical output.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      text: Column,
      n: Int,
      threshold: Double,
      maxBucket: Int = DefaultMaxBucket,
      persistSets: Option[org.apache.spark.storage.StorageLevel] = None
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    // tokens staged in their own projection (see shinglesOfTokens); the
    // shingle SET is the native graft_ngram_hashes kernel — sorted
    // distinct 64-bit window hashes, no shingle strings ever built
    // (Jaccard only needs sizes + intersections, which an injective
    // hash preserves; see NgramHashes scaladoc) — staged in the next
    // projection so every downstream reference (explode, size, both
    // verify sides) reads one materialized long array
    //
    // The sets SUBPLAN appears three times in the final plan (candidate
    // stage + both verify sides); exchange reuse does not collapse them
    // (measured: 0 ReusedExchange — AQE plans the subqueries
    // independently). `persistSets` trades one materialization plus
    // cache reads for the two recomputations. MEASURED at sf0.1
    // (local[32], min over 5/3 interleaved reps, see PLANS.md):
    // default None wins — 3.13 s vs 3.27 s with MEMORY_AND_DISK —
    // because the shingle derivation is a cheap narrow map over a
    // column-pruned scan while caching serializes + scans the
    // materialized arrays three times. The knob exists for the regime
    // where that flips: docs so large (100 TB text, n-gram arrays >>
    // scan cost) that recomputing the kernel twice dominates a
    // columnar cache read.
    val sets0 = docs
      .withColumn("__toks", TextFunctions.tokens(text))
      // cheap equivalent of size(sh) > 0: pushdown substitutes the
      // filter's aliases all the way back to raw text, so filtering on
      // the shingle array would re-evaluate the whole shingle tree
      // inside the scan — the token-count form costs one split
      .where(size(col("__toks")) >= n)
      .withColumn(
        "__sh",
        array_sort(array_distinct(call_function("graft_ngram_hashes", col("__toks"), lit(n))))
      )
      .select(col(idCol).as("id"), col("__sh").as("sh"), size(col("__sh")).as("sz"))
    val sets = persistSets.map(sets0.persist).getOrElse(sets0)

    // explode_outer, NOT explode: plain explode makes Generate insert a
    // pushable `size(sh) > 0 AND isnotnull(sh)` pre-filter, and pushdown
    // alias-substitutes that into the scan's post-scan filters — i.e. the
    // whole tokenize+shingle+sort tree is re-evaluated per row in the
    // FILTER and then again in the projection. The outer variant inserts
    // no pre-filter; the guard moves to a cheap isnotnull on the
    // GENERATED attribute (empty arrays can't occur here anyway — every
    // doc that passes the token-count guard has >= 1 shingle).
    val exploded = sets
      .select(col("id"), col("sz"), explode_outer(col("sh")).as("s"))
      .where(col("s").isNotNull)
    val freq = exploded.groupBy("s").agg(count(lit(1)).as("df"))

    // rank each doc's shingles in the global rare-first order and keep
    // the prefix; (df, s) is a total order shared by every doc, which
    // the prefix-filter correctness proof requires
    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz")) + lit(1)).cast("int")
    val prefixes = exploded
      .join(freq, "s")
      .groupBy(col("id"), col("sz"))
      .agg(array_sort(collect_list(struct(col("df"), col("s")))).as("ranked"))
      .select(col("id"), explode(slice(col("ranked"), lit(1), prefixLen)).as("r"))
      .select(col("id"), col("r.s").as("s"))

    val candidates = prefixes
      .groupBy("s")
      .agg(array_sort(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(pairsWithin(col("ids"), maxBucket)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()

    // exact verify on candidates only: the candidate side is small, so
    // AQE broadcasts it and the full shingle-set side never shuffles
    val a = sets.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sz").as("n_a"))
    val b = sets.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sz").as("n_b"))
    candidates
      .join(a, "id_a")
      .join(b, "id_b")
      .withColumn("i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn(
        "jaccard",
        col("i").cast("double") / (col("n_a") + col("n_b") - col("i")).cast("double")
      )
      // coalesce makes the threshold predicate null-TOLERANT, so
      // constraint propagation cannot infer isnotnull(sz)/isnotnull(sh)
      // — which alias-substitution would expand into re-running the full
      // shingle tree inside the verify-side scan filters. jaccard is
      // never null here (sets rows all have non-null sh/sz), so the
      // rewrite is observationally identical.
      .where(coalesce(col("jaccard"), lit(-1.0)) >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash of a token multiset over the low `nBits` bits of the seeded
    * token hash: bit b is set iff sum over tokens of (+1 if hash bit b
    * set else -1) > 0. The per-token hash array is staged in its own
    * projection (one md5 per token), then every bit's signed sum reads
    * the materialized array — a pure map stage, no explode/shuffle.
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

  /** DataFrame-level simhash that stages the token-hash array once
    * (one md5 per token total, not per bit), then assembles all `nBits`
    * bit-counters in ONE pass via the native codegen'd
    * [[graft.functions.SimhashBits]] kernel — the HOF form above walks
    * the array `nBits` times through interpreted `aggregate` calls.
    * Bit-identical to [[simhash]] (SimhashExprSpec). Adds `outCol`.
    */
  def withSimhash(df: DataFrame, text: Column, nBits: Int, outCol: String): DataFrame = {
    // token hashes via the native graft_md5_longs kernel (one generated
    // loop per row) — same values as transform(tokens, seededLongHash),
    // which walks an interpreted md5 tree per token (Md5LongsSpec)
    val staged = df.withColumn(
      "__tokHashes",
      call_function("graft_md5_longs", TextFunctions.tokens(text), lit("0:"), lit(0L))
    )
    val sig = call_function("graft_simhash", col("__tokHashes"), lit(nBits))
    staged.select(df.columns.map(col) :+ sig.as(outCol): _*)
  }

  /** Popcount of the low `nBits` bits of `x`. Pass a plain column
    * reference (or a cheap expression): filter pushdown substitutes the
    * argument into every one of the nBits terms.
    */
  def bitSum(x: Column, nBits: Int): Column =
    (0 until nBits)
      .map(bit => shiftright(x, bit).bitwiseAND(1))
      .reduce(_ + _)
      .cast("int")

  /** Hamming distance between two simhash values (over nBits). */
  def hammingDistance(a: Column, b: Column, nBits: Int): Column =
    bitSum(a.bitwiseXOR(b), nBits)

  /** SimHash near-dup pairs: band the nBits signature into `nBands`
    * contiguous bit slices — by pigeonhole, any pair with Hamming
    * distance < nBands shares at least one identical slice — then verify
    * candidates with the exact Hamming distance. Exact recall for
    * `maxHamming < nBands`; same bucketed shape as the other pair
    * operators (one groupBy shuffle, capped in-bucket expansion); each
    * candidate pair carries both signatures as struct fields, so the
    * pushed-down Hamming filter reads O(1) fields per term.
    */
  def simhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      text: Column,
      nBits: Int,
      nBands: Int,
      maxHamming: Int,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = {
    require(nBits % nBands == 0, "nBands must divide nBits")
    require(maxHamming < nBands, s"recall guarantee needs maxHamming < nBands")
    val bandBits = nBits / nBands
    val sigs = withSimhash(docs.select(col(idCol).as("id"), text.as("__text")),
      col("__text"), nBits, "__sh").drop("__text")
    val bandStructs = (0 until nBands).map { b =>
      struct(
        lit(b).as("band"),
        shiftright(col("__sh"), b * bandBits).bitwiseAND(lit((1 << bandBits) - 1)).as("sig")
      )
    }
    // fused native expansion+verify (graft_hamming_pairs): candidate
    // volume is quadratic in bucket width while survivors are sparse, so
    // materializing every candidate struct through an interpreted
    // explode(pairsOfStructs)+filter dominated the query (~57 of 60 s at
    // sf0.1 for 3.3k surviving pairs from ~1M candidates); the kernel
    // runs the B^2/2 loop compiled, one Long.bitCount per candidate,
    // allocating only for survivors
    sigs
      .select(col("id"), col("__sh"), explode(array(bandStructs: _*)).as("bk"))
      .groupBy(col("bk.band").as("band"), col("bk.sig").as("sig"))
      .agg(array_sort(collect_list(struct(col("id").as("id"), col("__sh").as("sh")))).as("xs"))
      .where(size(col("xs")) > 1)
      .select(
        explode(
          call_function(
            "graft_hamming_pairs",
            col("xs"),
            lit(nBits),
            lit(maxHamming),
            lit(maxBucket)
          )
        ).as("p")
      )
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("p.hamming").as("hamming"))
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`.
    * Candidate stage: random-hyperplane LSH buckets; verification: exact
    * cosine on the candidate pairs only. Vectors DO travel through the
    * bucket groupBy here (unlike the text path) because the verifier
    * needs them; bucket fan-out replaces the quadratic cross-join.
    */
  def cosineNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int,
      dim: Int,
      threshold: Double,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = {
    val planes = VectorFunctions.randomPlanes(nPlanes, dim)
    // double-cast vectors + norms are computed once per row here, then
    // ride through the bucket groupBy as (vec, norm) structs carried
    // into each candidate pair, so the per-pair verify is just a dot
    // product and one divide on plain struct fields
    val bucketed = emb.select(
      col(idCol).as("id"),
      struct(
        VectorFunctions.toDouble(col(vecCol)).as("v"),
        VectorFunctions.norm2(col(vecCol)).as("n")
      ).as("vn"),
      VectorFunctions.lshBucket(col(vecCol), planes).as("bucket")
    )
    // fused native expansion+verify (graft_cosine_pairs): the
    // compositional explode+filter materialized every candidate pair
    // carrying BOTH full vectors before the threshold filter — quadratic
    // allocations and payload copies per bucket; the kernel reads each
    // vector once and emits only survivors (same dot order, identical
    // values — see CosinePairs scaladoc)
    bucketed
      .groupBy("bucket")
      .agg(array_sort(collect_list(struct(col("id").as("id"), col("vn").as("vn")))).as("xs"))
      .where(size(col("xs")) > 1)
      .select(
        explode(
          call_function("graft_cosine_pairs", col("xs"), lit(threshold), lit(maxBucket))
        ).as("p")
      )
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("p.cos").as("cos"))
      .distinct()
  }
}
