package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // pos: "good fine", "good good"; neg: "bad awful", "bad fine"
  private def docs = Seq(
    (1L, "good fine", true),
    (2L, "good good", true),
    (3L, "bad awful", false),
    (4L, "bad fine", false)
  ).toDF("id", "text", "pos")

  test("train: hand-computed smoothed ppm weights") {
    val m = Classifier
      .train(docs, col("text"), col("pos"), minCount = 1L)
      .as[(String, Long, Long, Long)]
      .collect()
      .map { case (t, p, n, w) => t -> ((p, n, w)) }
      .toMap
    // good: 3 pos, 0 neg -> (4*1e6) div 5 = 800000
    assert(m("good") == ((3L, 0L, 800000L)))
    // fine: 1 pos, 1 neg -> (2*1e6) div 4 = 500000
    assert(m("fine") == ((1L, 1L, 500000L)))
    // bad: 0 pos, 2 neg -> (1*1e6) div 4 = 250000
    assert(m("bad") == ((0L, 2L, 250000L)))
    // awful: 0 pos, 1 neg -> (1*1e6) div 3 = 333333
    assert(m("awful") == ((0L, 1L, 333333L)))
  }

  test("train: minCount prunes rare tokens") {
    val m = Classifier.train(docs, col("text"), col("pos"), minCount = 2L)
    val toks = m.select("token").as[String].collect().toSet
    assert(toks == Set("good", "fine", "bad")) // awful occurs once
  }

  test("score: per-doc mean over in-vocabulary occurrences; unseen-only docs score -1") {
    val model = Classifier.train(docs, col("text"), col("pos"), minCount = 1L)
    val toScore = Seq(
      (10L, "good bad"),     // (800000 + 250000) div 2 = 525000 -> keep
      (11L, "bad bad awful"), // (250000*2 + 333333) div 3 = 277777 -> drop
      (12L, "zzz unseen"),   // no in-vocab tokens -> -1, drop
      (13L, "good good zzz") // repeats count: (800000*2) div 2 = 800000
    ).toDF("id", "text")
    val out = Classifier
      .score(toScore, "id", col("text"), model)
      .as[(Long, Long, Long, Boolean)]
      .collect()
      .map { case (id, n, sc, k) => id -> ((n, sc, k)) }
      .toMap
    assert(out(10L) == ((2L, 525000L, true)))
    assert(out(11L) == ((3L, 277777L, false)))
    assert(out(12L) == ((0L, -1L, false)))
    assert(out(13L) == ((2L, 800000L, true)))
  }

  test("hashed features: model bounded by bucket count, collisions pool counts") {
    import graft.functions.TextFunctions
    // nBuckets = 1 forces EVERY token into one bucket: the model must
    // collapse to a single pooled row and every doc scores that row's
    // weight — the degenerate case that makes collision semantics exact
    val feats = docs
      .select(col("id"), col("pos"), explode(split(col("text"), " ")).as("token"))
      .withColumn("bucket", TextFunctions.splitBucket(col("token"), 1, "fh"))
    val model = Classifier.trainOnFeatures(feats, "bucket", col("pos"), minCount = 1L)
    val rows  = model.as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 1)
    // 4 pos occurrences (good fine good good), 4 neg (bad awful bad fine)
    assert(rows.head == ((0L, 4L, 4L, 500000L)))
    val scores = Classifier
      .scoreOnFeatures(feats, "id", "bucket", model)
      .select("score_ppm").distinct().as[Long].collect().toSeq
    assert(scores == Seq(500000L))
  }

  test("hashed features at a wide bucket space match the word-path scores") {
    import graft.functions.TextFunctions
    // 1<<20 buckets over a 4-token vocabulary: collision-free with
    // overwhelming margin, so bucketing is a bijection on this fixture
    // and the hashed pipeline must reproduce the word-path result
    val feats = docs
      .select(col("id"), col("pos"), explode(split(col("text"), " ")).as("token"))
      .withColumn("bucket", TextFunctions.splitBucket(col("token"), 1 << 20, "fh"))
    val hm = Classifier.trainOnFeatures(feats, "bucket", col("pos"), minCount = 1L)
    val hashed = Classifier
      .scoreOnFeatures(feats, "id", "bucket", hm)
      .select("id", "n_scored", "score_ppm")
      .as[(Long, Long, Long)].collect().map { case (i, n, sc) => i -> ((n, sc)) }.toMap
    val wm = Classifier.train(docs, col("text"), col("pos"), minCount = 1L)
    val words = Classifier
      .score(docs, "id", col("text"), wm)
      .select("id", "n_scored", "score_ppm")
      .as[(Long, Long, Long)].collect().map { case (i, n, sc) => i -> ((n, sc)) }.toMap
    assert(hashed == words)
  }

  test("quality gate: confusion counts and precision/recall pinned at the shipped 500000-ppm threshold") {
    // The release-gate the PR-curve query feeds, pinned as a spec (the
    // ANN family's AnnRecallSpec precedent). NOT on the sf documents
    // table: the synthetic corpus shares one vocabulary across langs,
    // so every doc scores within ±4% of the class prior and the
    // 500000-ppm operating point degenerates (tp=fp=0 — measured; a
    // floor there would gate nothing). This fixture has real signal
    // plus two BORDERLINE docs whose scores land within ~10000 ppm of
    // the threshold, so a tokenizer, smoothing, or integer-rounding
    // regression moves the confusion matrix and fails the exact pins.
    val fixture =
      (1 to 10).map(i => (i.toLong, "p p s", true)) ++
        Seq((11L, "p n s s", true)) ++ // mixed evidence, near-threshold
        (20 to 29).map(i => (i.toLong, "n n s", false)) ++
        Seq((30L, "s s", false)) // shared-only: scores exactly the 500000 prior
    val d     = fixture.toDF("id", "text", "is_pos")
    val model = Classifier.train(d, col("text"), col("is_pos"), minCount = 1L)
    val thr   = 500000L
    val (tp, fp, fn, tn) = Classifier
      .score(d, "id", col("text"), model)
      .join(d.select(col("id"), col("is_pos")), "id")
      .agg(
        sum(when(col("score_ppm") >= thr && col("is_pos"), 1L).otherwise(0L)),
        sum(when(col("score_ppm") >= thr && !col("is_pos"), 1L).otherwise(0L)),
        sum(when(col("score_ppm") < thr && col("is_pos"), 1L).otherwise(0L)),
        sum(when(col("score_ppm") < thr && !col("is_pos"), 1L).otherwise(0L))
      )
      .as[(Long, Long, Long, Long)]
      .head()
    info(s"thr=500000ppm tp=$tp fp=$fp fn=$fn tn=$tn")
    // exact deterministic confusion matrix: the 11 positives all clear
    // the threshold (the mixed doc barely), the shared-only negative
    // sits AT the 500000 prior and >= counts it as a false positive
    assert((tp, fp, fn, tn) == ((11L, 1L, 0L, 10L)), s"confusion drifted: tp=$tp fp=$fp fn=$fn tn=$tn")
    val prec = tp.toDouble / (tp + fp)
    val rec  = tp.toDouble / (tp + fn)
    assert(prec >= 0.91 && rec >= 0.99, f"gate floors: precision=$prec%.4f recall=$rec%.4f")
  }

  test("score is deterministic under repartitioning") {
    val model = Classifier.train(docs, col("text"), col("pos"), minCount = 1L)
    def run(parts: Int) = Classifier
      .score(docs.repartition(parts), "id", col("text"), model)
      .orderBy("id")
      .as[(Long, Long, Long, Boolean)]
      .collect()
      .toSeq
    assert(run(1) == run(7))
  }
}
