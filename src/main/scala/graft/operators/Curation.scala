package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation: deterministic stratified sampling — the data-mixing
  * step of a pretraining pipeline ("keep 60% of English web, 90% of
  * code, 10% of everything else"). The reference's closest analogue is
  * its per-source routing of feeds into one conformed mart (SURVEY
  * §2.7); here the strata are data-driven (a column) and the keep
  * decision must be REPRODUCIBLE across runs, engines, and
  * repartitioning — no rand().
  *
  * Mechanism: the same salted-md5 bucket primitive as the train/val/test
  * split ([[TextFunctions.splitBucket]]) — bucket(id) in [0, 1000) and a
  * row survives iff bucket < rate_permille(stratum). Per-stratum rates
  * ship as a literal when-chain (strata counts are small), so the whole
  * operator is one codegen'd filter on a narrow map stage: no join, no
  * shuffle, linear at 100 TB, and the kept set is STABLE under
  * re-ingestion (same ids survive every run — the property that keeps
  * incremental pipelines consistent).
  */
object Curation {
  val RateDenominator = 1000

  /** Keep each row of `df` iff its salted id-bucket falls under its
    * stratum's per-mille rate. Unknown strata use `defaultPermille`.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      ratesPermille: Map[String, Int],
      defaultPermille: Int,
      salt: String
  ): DataFrame = {
    require(
      (ratesPermille.values ++ Seq(defaultPermille)).forall(r => r >= 0 && r <= RateDenominator),
      s"rates must be in [0, $RateDenominator] per-mille"
    )
    val rate: Column = ratesPermille.toSeq
      .sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, r).otherwise(acc)
      }
    df.where(TextFunctions.splitBucket(col(idCol), RateDenominator, salt) < rate)
  }

  /** Micro-unit denominator for [[weightedSample]] weights: a weight of
    * 1_000_000 means "always keep".
    */
  val WeightDenominator = 1000000

  /** Weighted (importance) sampling: keep each row with probability
    * `weightMicro / 1e6`, where the weight is a per-ROW column (quality
    * score, source priority, length prior) rather than a per-stratum
    * constant — the "upsample the good data" half of data mixing that
    * [[stratifiedSample]]'s fixed per-stratum rates cannot express.
    *
    * Same determinism contract as the other curation primitives: the
    * keep decision is `salted-md5-bucket(id) < weightMicro`, so it is
    * reproducible across runs/engines/partitioning, per-row MONOTONE in
    * the weight (raising a row's weight can only keep it), and a new
    * salt is an independent redraw. Pure codegen'd filter on a map
    * stage: no join, no shuffle, linear at 100 TB.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightMicro: Column,
      salt: String
  ): DataFrame =
    df.where(TextFunctions.splitBucket(col(idCol), WeightDenominator, salt) < weightMicro)

  /** Token-BUDGET data mixture: the production form of data mixing.
    * Mixing targets are stated as "the training run sees B tokens,
    * with share s_g of the budget from group g" — not as per-group
    * keep-rates, which depend on how much data each group HAS. This
    * operator converts (shares, budget) into per-group rates against
    * the groups' actual token mass and samples deterministically:
    *
    *   keep(row) iff bucket_micro(id) < (s_g/1000 * B) / T_g * 1e6
    *
    * evaluated as one exact integer CROSS-MULTIPLICATION in decimal
    * (`bucket * 1000 * T_g < s_g * B * 1e6`) — no division, no FP, so
    * the kept set is bit-reproducible across runs, engines, and
    * partitioning, and per-row monotone in the group's allocation.
    * Groups whose mass is under their allocation keep everything
    * (rate >= 1 makes the predicate always true) — the undersubscribed
    * case; redistribution of their unused allocation is a policy
    * choice left to the caller (re-run with adjusted shares).
    *
    * Scale shape: one tiny per-group agg (|groups| rows, broadcast
    * back), then a codegen'd filter on a narrow map stage — the corpus
    * itself never shuffles. Expected kept tokens per group ≈
    * min(T_g, s_g/1000 * B); sampling noise is O(sqrt) because the
    * md5 bucket is uniform and independent of token counts.
    */
  def tokenBudgetMix(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      tokensCol: Column,
      sharesPermille: Map[String, Int],
      defaultPermille: Int,
      budgetTokens: Long,
      salt: String
  ): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(
      (sharesPermille.values ++ Seq(defaultPermille)).forall(r => r >= 0 && r <= RateDenominator),
      s"shares must be in [0, $RateDenominator] per-mille"
    )
    val share: Column = sharesPermille.toSeq
      .sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (g, s)) =>
        when(col(groupCol) === g, s).otherwise(acc)
      }
    val totals = df.groupBy(col(groupCol)).agg(sum(tokensCol).as("__tg"))
    val bucket = TextFunctions.splitBucket(col(idCol), WeightDenominator, salt)
    df.join(broadcast(totals), groupCol)
      .where(
        bucket.cast("decimal(38,0)") * lit(RateDenominator.toLong) * col("__tg") <
          share.cast("decimal(38,0)") * lit(budgetTokens) * lit(WeightDenominator.toLong)
      )
      .drop("__tg")
  }

  /** Temperature-weighted (alpha = 1/2) domain mixture — the standard
    * rebalancing of a skewed multi-domain corpus before sampling
    * (multilingual pretraining's p_l^alpha reweighting, Conneau &
    * Lample 2019 §3.1; alpha < 1 upweights rare domains so the head
    * domain stops dominating the mixture). Per domain d with n_d docs:
    *
    *   p_ppm  = 1e6 * n_d / N                (the natural share)
    *   w_d    = floor(sqrt(n_d * 1e6))       (the alpha=1/2 weight)
    *   q_ppm  = 1e6 * w_d / sum(w)           (the temperature share)
    *   boost_bp = 1e4 * q_ppm / p_ppm        (per-domain up/down factor)
    *   quota_docs = budgetDocs * w_d / sum(w)
    *
    * alpha is FIXED at 1/2: sqrt is the one power IEEE requires
    * correctly rounded, so both engines floor the SAME double and every
    * downstream number is exact integer arithmetic — a general
    * pow(x, a) is not correctly-rounded and would put an FP boundary
    * inside the oracle compare. (Other alphas decompose into sqrt
    * chains if ever needed: a=1/4 is sqrt∘sqrt.)
    *
    * Scale shape: ONE domain-keyed partial agg over the corpus; the
    * domain table (small by construction) then computes its totals via
    * a broadcast scalar cross-join. The corpus never shuffles twice and
    * never joins back here — pair this with [[stratifiedSample]] /
    * [[tokenBudgetMix]] feeding `q_ppm` as the per-stratum rate to
    * realize the mixture.
    */
  def temperatureMixture(
      df: DataFrame,
      domainCol: String,
      budgetDocs: Long
  ): DataFrame = {
    require(budgetDocs >= 0, s"budgetDocs must be >= 0, got $budgetDocs")
    val counts = df
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__w", floor(sqrt(col("n_docs").cast("double") * 1000000d)).cast("long"))
    val totals = counts.agg(
      sum(col("n_docs")).as("__n"),
      sum(col("__w")).as("__sw")
    )
    counts
      .crossJoin(broadcast(totals))
      .select(
        col(domainCol),
        col("n_docs"),
        expr("(1000000 * n_docs) div __n").as("p_ppm"),
        expr("(1000000 * __w) div __sw").as("q_ppm"),
        // greatest(..,1): a sub-ppm domain floors p_ppm to 0, and x div 0
        // is null in Spark but an ERROR in DuckDB — clamp on both engines
        expr("(10000 * ((1000000 * __w) div __sw)) div greatest((1000000 * n_docs) div __n, 1)")
          .as("boost_bp"),
        expr(s"(${budgetDocs}L * __w) div __sw").as("quota_docs")
      )
  }

  /** Deterministic corpus SHUFFLE assignment — the standard way to
    * randomize 100 TB of training data: give every row a pseudorandom
    * but reproducible position (shard, pos_in_shard) derived from a
    * salted md5 of its id, instead of any RNG.
    *
    *   - `shard` = salted-hash bucket (pure map stage, no shuffle):
    *     rows scatter uniformly across `nShards` output streams;
    *   - `pos_in_shard` = rank of the row's hash inside its shard (one
    *     window shuffle on shard) — reading each shard in pos order
    *     yields a uniformly shuffled stream.
    *
    * Scale shape: per-shard windows sort in parallel (pick nShards ≥
    * cluster parallelism); no global total order exists to funnel
    * through one task. Same id + same salt → same position on any
    * engine, rerun, or cluster size; a new `salt` is an independent
    * reshuffle (epoch 2 of training). Hash ties (astronomically rare)
    * break by id, so the order is total and engine-portable.
    */
  def shuffleAssign(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String
  ): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val h = TextFunctions.splitHash(col(idCol), salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** LEAKAGE-SAFE train/val/test split: the split unit is the near-dup
    * CLUSTER, not the document. Splitting by document hash puts two
    * near-copies of the same page on both sides of the train/test
    * boundary — the classic contamination that inflates eval scores
    * (the reason dedup pipelines cluster BEFORE splitting). Hashing the
    * cluster id sends every member of a cluster to the same split by
    * construction; singleton docs (cluster id = own id) behave exactly
    * like the plain [[graft.functions.TextFunctions.splitBucket]]
    * split. Same salted-md5 determinism: re-runs, engines, and
    * repartitioning all reproduce the assignment bit-for-bit, and the
    * split is a pure map stage over the clustered frame — no
    * additional shuffle beyond what clustering already paid.
    */
  def leakageSafeSplit(
      clustered: DataFrame,
      clusterCol: String,
      nBuckets: Int,
      trainLt: Int,
      valLt: Int,
      salt: String
  ): DataFrame = {
    require(0 < trainLt && trainLt <= valLt && valLt <= nBuckets,
      s"need 0 < trainLt <= valLt <= nBuckets, got $trainLt/$valLt/$nBuckets")
    clustered
      .withColumn("bucket", TextFunctions.splitBucket(col(clusterCol), nBuckets, salt))
      .withColumn(
        "split",
        when(col("bucket") < trainLt, "train")
          .when(col("bucket") < valLt, "val")
          .otherwise("test")
      )
  }

  /** Robust per-group outlier pruning by median/MAD — the distribution-
    * aware sibling of a fixed length cut: keep rows with
    * `|x - median| <= (kNum/kDen) * MAD` where MAD is the median
    * absolute deviation WITHIN the row's group. Mean/stddev gates move
    * with the outliers they should catch; median/MAD do not (50%
    * breakdown point), which is why corpus quality pruning uses them.
    *
    * Exactness discipline: medians of integers land on halves, so the
    * comparison is carried in scaled integers — `med2 = 2*median(x)`
    * and `mad4 = 2*median(|2x - med2|)` are integer-VALUED doubles
    * (exact), and the keep predicate cross-multiplies
    * `2*kDen*|2x - med2| <= kNum*mad4` — no division, no FP boundary,
    * bit-reproducible against any engine with interpolating quantiles.
    *
    * Scale shape: two group-sized aggregations (exact `percentile` —
    * for unbounded-cardinality groups swap in `approx_percentile`, the
    * documented sketch path), each broadcast back onto the corpus scan;
    * the data itself never shuffles. Groups are strata (language,
    * source) — small by construction.
    */
  def robustOutlierPrune(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      kNum: Int,
      kDen: Int
  ): DataFrame = {
    require(kNum >= 0 && kDen >= 1, s"threshold must be >= 0: got $kNum/$kDen")
    val gs  = groupCols.map(col)
    val x2  = col(valueCol).cast("double") * 2
    val med = df.groupBy(gs: _*).agg(expr(s"2 * percentile($valueCol, 0.5d)").as("__med2"))
    val dev = df.join(broadcast(med), groupCols).withColumn("__dev2", abs(x2 - col("__med2")))
    val mad = dev.groupBy(gs: _*).agg(expr("2 * percentile(__dev2, 0.5d)").as("__mad4"))
    dev
      .join(broadcast(mad), groupCols)
      .where(col("__dev2") * (2 * kDen) <= col("__mad4") * kNum)
      .drop("__med2", "__dev2", "__mad4")
  }

  /** Curriculum scheduling — assign every row an easy-to-hard PHASE by
    * exact difficulty quantiles plus a deterministic within-phase
    * shuffle key, so a writer can materialize the curriculum order as
    * a range-partitioned sort on (phase, ord_hash) — curriculum
    * learning's data-side half (Bengio et al., ICML 2009) without ever
    * ranking the corpus through a single-partition window (the naive
    * ntile/row_number formulation collapses the whole corpus onto one
    * task; this one never does).
    *
    * Mechanism: the nPhases-1 quantile boundaries of `difficultyCol`
    * are ONE aggregation broadcast back; phase = 1 + #(boundaries
    * strictly below the row's difficulty) — a codegen'd comparison
    * against a handful of literals-by-broadcast. `ord_hash` is the
    * salted-md5 of the id: a new salt is a fresh epoch-order redraw,
    * same salt is bit-identical across runs and engines. No join keyed
    * on the corpus, no window.
    *
    * Boundary estimator: `approx = false` uses Spark's EXACT
    * `percentile`, whose aggregation state buffers every difficulty
    * value and merges the whole column onto the final task — fine at
    * fixture/oracle scale (and required for bit-equality with the
    * DuckDB twin), an OOM risk at corpus scale. At 100 TB pass
    * `approx = true`: `approx_percentile` (t-digest-style bounded
    * sketch, mergeable map-side) holds per-partition state at
    * O(accuracy), never the column — phase boundaries shift by at most
    * the sketch error, which curriculum bucketing tolerates by design.
    */
  def curriculumPhases(
      df: DataFrame,
      idCol: String,
      difficultyCol: String,
      nPhases: Int,
      salt: String,
      approx: Boolean = false,
      approxAccuracy: Int = 10000
  ): DataFrame = {
    require(nPhases >= 2, s"nPhases must be >= 2: got $nPhases")
    val qs = (1 until nPhases).map(_.toDouble / nPhases)
    val pctl =
      if (approx) s"approx_percentile($difficultyCol, array(${qs.mkString(", ")}), $approxAccuracy)"
      else s"percentile($difficultyCol, array(${qs.mkString(", ")}))"
    val bounds = df.agg(expr(pctl).cast("array<double>").as("__qb"))
    val phase = (0 until nPhases - 1)
      .map(i => when(col(difficultyCol) > col("__qb").getItem(i), 1).otherwise(0))
      .reduce(_ + _) + 1
    df.crossJoin(broadcast(bounds))
      .withColumn("phase", phase)
      .withColumn("ord_hash", TextFunctions.splitHash(col(idCol), salt))
      .drop("__qb")
  }

  /** Epoch-based domain upsampling — materialize the dataset a training
    * run actually reads when the mixture is stated in EPOCHS per domain
    * (e.g. "wiki 2.5 epochs, crawl 1 epoch, code 0.6"): every row is
    * emitted floor(e) times, plus one more with probability frac(e)
    * decided by the salted-md5 bucket of its id — so 2.5 epochs means
    * two full copies and a deterministic independent half-sample as the
    * third. Fractional epochs < 1 degenerate to plain subsampling, and
    * the whole schedule is RNG-free: re-runs are bit-identical, and
    * raising a domain's epoch count only ADDS copies (per-row monotone).
    *
    * Each emitted copy gets a copy index and a salted-hash shard
    * assignment (decorrelated from the keep hash by a distinct salt),
    * so downstream writers can scatter repeats across shards instead of
    * feeding a training loader the same document twice in a row.
    *
    * Scale shape: one narrow map stage — a per-row integer copy count
    * from a broadcast-sized epoch map, then a bounded `posexplode` fan-out
    * of at most ceil(max epochs) per row. No join, no shuffle; linear at
    * 100 TB with output-proportional cost, exactly like the training-run
    * read it simulates.
    *
    * `epochsMilli` maps domain value -> milli-epochs (2500 = 2.5
    * epochs); domains absent from the map get 1000 (one epoch).
    */
  def epochUpsample(
      df: DataFrame,
      idCol: String,
      domainCol: Column,
      epochsMilli: Map[String, Int],
      salt: String,
      nShards: Int
  ): DataFrame = {
    require(epochsMilli.values.forall(_ >= 0), "epochsMilli must be non-negative")
    require(nShards >= 1, s"nShards must be >= 1: got $nShards")
    val eMilli = epochsMilli.foldLeft(lit(1000)) { case (acc, (dom, e)) =>
      when(domainCol === dom, lit(e)).otherwise(acc)
    }
    val frac = TextFunctions.splitBucket(col(idCol), 1000, salt)
    df.withColumn("__e", eMilli)
      .withColumn(
        "n_copies",
        (col("__e") / 1000).cast("int") + when(frac < col("__e") % 1000, 1).otherwise(0)
      )
      .where(col("n_copies") > 0)
      .select(
        col("*"),
        posexplode(expr("array_repeat(1, n_copies)")).as(Seq("copy_idx", "__one"))
      )
      .withColumn(
        "shard",
        TextFunctions.splitBucket(
          concat(col(idCol).cast("string"), lit("#"), col("copy_idx").cast("string")),
          nShards,
          s"$salt:shard"
        )
      )
      .drop("__e", "__one")
  }

  /** DSIR-shaped importance scoring (Xie et al. 2023, arXiv:2302.03169):
    * score every document by how much its hashed-n-gram feature profile
    * looks like a TARGET distribution relative to the RAW corpus, then
    * select the top mass. The published method weights by
    * prod_f p_target(f)/p_raw(f) over hashed bigram features; this
    * implementation keeps the architecture (hashed feature buckets,
    * target-vs-raw contrast table, per-document feature-sum score)
    * but replaces the floating log-likelihood ratio with an ADDITIVE
    * INTEGER surrogate — score = sum over feature occurrences of
    * `((target_count_f + 1) * 10^6) div (raw_count_f + 1)` — so the
    * score is engine-portable bit-for-bit (the repo's integer-exact
    * oracle discipline; ln() differs across libm implementations in
    * the last ulp, which a micro-grid floor can flip). Monotonicity in
    * each feature's target affinity is preserved; the multiplicative
    * coupling of the true likelihood ratio is not, and callers who can
    * tolerate float drift can swap the contrast literal for
    * log-ratios without touching the plan shape.
    *
    * Scale shape: training is ONE explode + aggregate whose output is
    * `nBuckets` rows (collected to the driver — the trained-literal
    * pattern shared with KMeans centroids / PQ codebooks); scoring is a
    * PURE map stage (the contrast table ships as a literal array, each
    * doc folds its feature array through element_at) — zero joins,
    * zero shuffles over the corpus beyond the one training aggregate.
    *
    * @param targetPred row predicate defining the target distribution
    *                   (e.g. `col("lang") === "en"`)
    * @return input columns + `score_micro` (long)
    */
  def importanceContrast(
      docs: DataFrame,
      textCol: String,
      targetPred: Column,
      nBuckets: Int = 64,
      seed: Int = 11
  ): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2: got $nBuckets")
    // The token split is bound to its OWN projected column and the
    // bigram lambda references that attribute — never the split
    // expression itself. A higher-order-function lambda re-evaluates
    // its subtrees per element, so splicing `split(text)` into the
    // body re-splits the whole document for EVERY bigram — O(tokens²)
    // work per document (the spliced shape measured 46.8 s solo at sf1;
    // this bound-attribute form 8.3 s — tools/bench_ic_tokens_r11.json).
    // Working-column name must not collide with an input column — the
    // operator's contract is input-preserving, and a caller column named
    // "__ic_tk" would otherwise be silently clobbered during scoring and
    // then dropped from the output. Derive a fresh name instead.
    val tkCol = Iterator
      .from(0)
      .map(i => if (i == 0) "__ic_tk" else s"__ic_tk$i")
      .find(n => !docs.columns.contains(n))
      .get
    def features(tk: Column): Column =
      when(
        size(tk) >= 2,
        transform(
          sequence(lit(0), size(tk) - 2),
          i =>
            (graft.functions.Fingerprint.seededLongHash(
              concat_ws(" ", element_at(tk, i + 1), element_at(tk, i + 2)),
              seed
            ) % nBuckets).cast("int")
        )
      ).otherwise(array().cast("array<int>"))
    // train: bucket -> (raw count, target count); nBuckets rows, the
    // bounded driver collect every trained-literal operator uses
    val counts = docs
      .withColumn(tkCol, TextFunctions.tokens(col(textCol)))
      .select(explode(features(col(tkCol))).as("__b"), targetPred.cast("long").as("__t"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__r"), sum(col("__t")).as("__tc"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val contrast = (0 until nBuckets).map { b =>
      val (r, t) = counts.getOrElse(b, (0L, 0L))
      ((t + 1L) * 1000000L) / (r + 1L)
    }
    val table = array(contrast.map(lit): _*)
    docs
      .withColumn(tkCol, TextFunctions.tokens(col(textCol)))
      .withColumn(
        "score_micro",
        aggregate(
          features(col(tkCol)),
          lit(0L),
          (acc, b) => acc + element_at(table, b + 1)
        )
      )
      .drop(tkCol)
  }
}
