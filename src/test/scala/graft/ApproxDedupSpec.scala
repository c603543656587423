package graft

import graft.multimodal.Multimodal
import graft.operators.{ApproxDedup, Similarity}
import org.apache.spark.sql.functions._

class ApproxDedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: sliding word trigrams, too-short docs yield empty") {
    val df  = Seq("a b c d", "x y").toDF("text")
    val got = df.select(ApproxDedup.shingles(col("text"), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty) // negative sequence bound -> empty via where-guard upstream
  }

  test("affine minhash: deterministic, equal sets -> equal signatures, disjoint differ") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),          // identical
      (3L, "entirely different words here now")   // disjoint
    ).toDF("id", "text")
    val sigs = ApproxDedup
      .withMinhashSignature(df, col("text"), n = 3, nHashes = 8)
      .orderBy("id")
      .collect()
    val s1 = (0 until 8).map(i => sigs(0).getAs[Long](s"mh$i"))
    val s2 = (0 until 8).map(i => sigs(1).getAs[Long](s"mh$i"))
    val s3 = (0 until 8).map(i => sigs(2).getAs[Long](s"mh$i"))
    assert(s1 == s2)
    assert(s1 != s3)
    assert(s1.forall(v => v >= 0 && v < ApproxDedup.MinhashMod))
  }

  test("lshCandidatePairs: identical docs collide, pairs are ordered + distinct") {
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),
      (3L, "h i j k l m n")
    ).toDF("id", "text")
    val sigs  = ApproxDedup.withMinhashSignature(df, col("text"), 3, 8)
    val pairs = ApproxDedup.lshCandidatePairs(sigs, "id", 8, 2).as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L))) // every band collides for 1-2; 3 joins nothing
  }

  test("minhashJaccardEstimates: exact dups estimate 1.0, disjoint docs never pair") {
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),
      (3L, "h i j k l m n")
    ).toDF("id", "text")
    val est = ApproxDedup
      .minhashJaccardEstimates(df, "id", col("text"), n = 3, nHashes = 8, rowsPerBand = 2)
      .as[(Long, Long, Int, Double)]
      .collect()
    assert(est.toSeq == Seq((1L, 2L, 8, 1.0))) // identical sets agree on every position
  }

  test("profileColumns: null/distinct/bounds per column from one pass") {
    val df = Seq(
      (Some(3L), "b"),
      (None, "a"),
      (Some(3L), "c"),
      (Some(9L), "a")
    ).toDF("k", "v")
    val got = graft.operators.Profile
      .profileColumns(df, Seq("k", "v"))
      .as[(String, Long, Long, Long, String, String)]
      .collect()
      .sortBy(_._1)
    assert(got(0) == ("k", 4L, 1L, 2L, "3", "9"))
    assert(got(1) == ("v", 4L, 0L, 3L, "a", "c"))
  }

  test("graft_hamming_pairs: emits exactly the pairs within maxHamming, capped, i<j") {
    // ids 1..4 with signatures 0b0000, 0b0001, 0b0111, 0b1111 (4 bits)
    val df = Seq(Seq((1L, 0L), (2L, 1L), (3L, 7L), (4L, 15L)))
      .toDF("xs")
      .select(explode(call_function("graft_hamming_pairs", col("xs"), lit(4), lit(2), lit(4096))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .as[(Long, Long, Int)]
      .collect()
      .toSeq
      .sorted
    // distances: (1,2)=1 (1,3)=3 (1,4)=4 (2,3)=2 (2,4)=3 (3,4)=1
    assert(df == Seq((1L, 2L, 1), (2L, 3L, 2), (3L, 4L, 1)))
    // cap at 2: only the first two elements of the sorted array are expanded
    val capped = Seq(Seq((1L, 0L), (2L, 1L), (3L, 0L)))
      .toDF("xs")
      .select(explode(call_function("graft_hamming_pairs", col("xs"), lit(4), lit(4), lit(2))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .as[(Long, Long)]
      .collect()
      .toSeq
    assert(capped == Seq((1L, 2L)))
  }

  test("int8 quantization: symmetric scale, extremes hit ±127, zero vector -> zeros") {
    val df = Seq(
      (1L, Array(1.0f, -0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = graft.functions.VectorFunctions
      .withInt8Quant(df, "embedding", "scale", "q")
      .select(col("vec_id"), col("scale"), col("q"))
      .as[(Long, Double, Seq[Int])]
      .collect()
      .sortBy(_._1)
    assert(got(0)._2 == 1.0 / 127.0)
    assert(got(0)._3 == Seq(127, -32, 0)) // -0.25/(1/127) ~ -31.75 -> -32
    assert(got(1)._2 == 0.0 && got(1)._3 == Seq(0, 0, 0))
  }

  test("contamination: overlap counts and integer-threshold flag") {
    val corpus = Seq(
      (1L, "a b c d e"), // shingles {abc,bcd,cde}; 2 of 3 in ref -> 667mil >= 500 -> contaminated
      (2L, "x y z w v"), // no overlap
      (3L, "a b")        // too short, excluded
    ).toDF("id", "text")
    val ref = Seq((100L, "a b c d")).toDF("id", "text") // shingles {abc,bcd}
    val got = graft.operators.Contamination
      .ngramOverlap(corpus, "id", col("text"), ref, col("text"), n = 3, threshMil = 500)
      .as[(Long, Int, Int, Int)]
      .collect()
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 3, 2, 1), (2L, 3, 0, 0)))

    // removal half: contaminated doc 1 dropped; clean doc 2 AND the
    // too-short doc 3 (no shingles, cannot be contaminated) survive
    val kept = graft.operators.Contamination
      .decontaminate(corpus, "id", col("text"), ref, col("text"), n = 3, threshMil = 500)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("repeatedSpans: span-level dup counts, cross-doc and within-doc") {
    val docs = Seq(
      (1L, "a b c d e f g h i"),     // 6 windows of 4; shares "a b c d" with doc 2
      (2L, "x a b c d y z w"),       // 5 windows
      (3L, "p p q p p q p p q p p"), // within-doc repetition: "p p q p" x2 etc.
      (4L, "q r s")                  // too short, excluded
    ).toDF("id", "text")
    val got = graft.operators.SubstringDedup
      .repeatedSpans(docs, "id", col("text"), n = 4)
      .as[(Long, Int, Int, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4)))
      .toMap
    assert(got(1L) == ((6, 1, 2L)))
    assert(got(2L) == ((5, 1, 2L)))
    // doc 3 windows: ppqp, pqpp, qppq, ppqp, pqpp, qppq, ppqp, pqp p? ->
    // 8 windows; "p p q p" x3, "p q p p" x2, "q p p q" x2, last "q p p" ...
    // exact: tokens p p q p p q p p q p p -> windows at 1..8:
    // ppqp pqpp qppq ppqp pqpp qppq ppqp pqpp -> ppqp x3, pqpp x3, qppq x2
    assert(got(3L) == ((8, 8, 3L)))
    assert(!got.contains(4L))
  }

  test("ngramJaccardPairs: exact jaccard on shared-shingle candidates") {
    val df = Seq(
      (1L, "a b c d"), // shingles {abc, bcd}
      (2L, "a b c e"), // shingles {abc, bce} -> jaccard 1/3 with doc 1
      (3L, "x y z w")  // no overlap
    ).toDF("id", "text")
    val got = ApproxDedup
      .ngramJaccardPairs(df, "id", col("text"), n = 3, threshold = 0.2)
      .as[(Long, Long, Double)]
      .collect()
    assert(got.toSeq == Seq((1L, 2L, 1.0 / 3.0)))
  }

  test("ngramJaccardPairs: prefix filter loses no pair at the threshold boundary") {
    // docs engineered so some shingles are common (high df, likely
    // excluded from prefixes) and pairs sit right at / below threshold
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e g"),
      (3L, "a b c x y z"),
      (4L, "p q r s t u"),
      (5L, "a b c d e f") // exact dup of 1
    ).toDF("id", "text")
    def run(t: Double) =
      ApproxDedup.ngramJaccardPairs(docs, "id", col("text"), n = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
    // brute-force expected via the (exact) jaccard helper over all pairs
    val sets = docs
      .select(col("id"), array_sort(array_distinct(ApproxDedup.shingles(col("text"), 3))).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    def expected(t: Double) = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = sets(a).toSet.intersect(sets(b).toSet).size
      uni   = sets(a).toSet.union(sets(b).toSet).size
      j     = inter.toDouble / uni if j >= t
    } yield (a, b, j)).toSet
    for (t <- Seq(0.05, 0.25, 0.5, 1.0)) assert(run(t) == expected(t), s"threshold $t")
  }

  test("bucket cap: degenerate buckets truncate deterministically to first maxBucket ids") {
    val docs = (1L to 10L).map(i => (i, "a b c d e")).toDF("id", "text") // one giant bucket
    val sigs = ApproxDedup.withMinhashSignature(docs, col("text"), 3, 8)
    val got = ApproxDedup
      .lshCandidatePairs(sigs, "id", 8, 2, maxBucket = 4)
      .as[(Long, Long)].collect().toSet
    val want = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)).toSet
    assert(got == want) // only the 4 smallest ids expand; 6 pairs, not 45
  }

  test("simhashNearDupPairs: exact dups pair at hamming 0, disjoint docs do not pair") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "totally unrelated corpus vocabulary entirely elsewhere")
    ).toDF("id", "text")
    val got = ApproxDedup
      .simhashNearDupPairs(df, "id", col("text"), nBits = 60, nBands = 4, maxHamming = 3)
      .as[(Long, Long, Int)]
      .collect()
    assert(got.toSeq == Seq((1L, 2L, 0)))
  }

  test("cosineNearDupPairs: identical vectors pair up, orthogonal do not") {
    val v1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val v3 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val df = Seq((1L, v1.toSeq), (2L, v1.toSeq), (3L, v3.toSeq)).toDF("id", "v")
    val got = ApproxDedup
      .cosineNearDupPairs(df, "id", "v", nPlanes = 4, dim = 4, threshold = 0.99)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("simhash: withSimhash matches the column formulation; near-dup Hamming small") {
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"), (3L, "alpha beta gamma delta"))
      .toDF("id", "text")
    val staged = ApproxDedup
      .withSimhash(df, col("text"), 16, "sh")
      .orderBy("id")
      .select("sh")
      .as[Long]
      .collect()
    val direct = df
      .orderBy("id")
      .select(ApproxDedup.simhash(col("text"), 16))
      .as[Long]
      .collect()
    assert(staged.toSeq == direct.toSeq)
    assert(staged(0) == staged(1))
    val dist = spark
      .range(1)
      .select(
        ApproxDedup.hammingDistance(lit(staged(0)), lit(staged(2)), 16)
      )
      .as[Int]
      .head()
    assert(dist > 0)
  }

  test("lshTopK: self-similar corpus returns the identical vector at rank 1") {
    val base = Array(0.5f, -0.25f, 0.75f, 0.1f)
    val corpus = Seq(
      (1L, base.toSeq),
      (2L, base.map(_ * 2.0f).toSeq),           // same direction -> cos 1
      (3L, Seq(-0.5f, 0.25f, -0.75f, -0.1f))    // opposite
    ).toDF("id", "v")
    val queries = Seq((1L, base.toSeq)).toDF("id", "v")
    val got = Similarity
      .lshTopK(corpus, queries, "id", "v", k = 2, nPlanes = 4, dim = 4)
      .select("neighbor_id", "rank")
      .as[(Long, Int)]
      .collect()
      .toMap
    assert(got.get(2L).contains(1)) // cos=1 neighbor first
  }

  test("multimodal: pack schema + REAL PNG decode feature extraction") {
    val df     = Seq((7L, "hello world")).toDF("doc_id", "text")
    val packed = Multimodal.pack(df, "doc_id", "text", "text", "text/plain")
    // same names + types; nullability may tighten when inputs are non-null
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.sql.replace(" NOT NULL", ""))).toSeq
    assert(shape(packed.schema) == shape(Multimodal.PayloadSchema))
    val img   = Multimodal.toImagePayload(packed, w = 4, h = 4)
    val feats = Multimodal.extractFeatures(img, batchSize = 4).collect()
    assert(feats.length == 1)
    val arr = feats(0).getSeq[Float](feats(0).fieldIndex("features"))
    assert(arr.length == 16)
    assert(feats(0).getAs[Int]("feat_dim") == 16)
    // md5("hello world") = 5eb63bbbe01eeed093cb22bb8f5acdc3 -> the DECODED
    // luminance of pixel 0 must be byte 0x5e / 255
    assert(arr.head == (0x5e / 255.0).toFloat)
    // null payloads and undecodable (non-image) payloads are skipped
    val withNull = img.unionByName(
      Seq((8L, "image", null.asInstanceOf[Array[Byte]]))
        .toDF("media_id", "modality", "payload")
        .withColumn("meta", lit(null).cast(Multimodal.PayloadSchema("meta").dataType))
    )
    assert(Multimodal.extractFeatures(withNull, 4).count() == 1)
    assert(Multimodal.extractFeatures(packed, 4).count() == 0) // raw text is not an image
  }
}
