package graft

/** Plan-shape regression tests: pin the physical-plan properties PLANS.md
  * documents, so a refactor that silently loses pushdown, broadcast, or
  * single-evaluation shows up as a test failure, not a bench surprise.
  */
class PlanSpec extends SparkSpec {
  private def plan(name: String): String =
    SparkEntry
      .queries(name)(spark, Sf)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("p5: all three predicates and column pruning reach the parquet scan") {
    val p = plan("p5_filter_predicates")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_quantity,30.0)"))
    assert(p.contains("LessThan(l_shipdate"))
    assert(p.contains("Not(EqualTo(l_returnflag,N))"))
    // pruned scan: 16-column lineitem read as 5 columns
    assert(!p.contains("l_extendedprice"))
  }

  /** One "Location: InMemoryFileIndex" line per physical scan node
    * (the tree section repeats node NAMES, the detail section is unique).
    */
  private def scanCount(p: String): Int =
    "Location: InMemoryFileIndex".r.findAllIn(p).size

  test("j2: both dimension joins are broadcast, fact side never shuffles") {
    val p = plan("j2_broadcast_dim_enrich")
    assert(p.contains("BroadcastHashJoin"))
    assert(scanCount(p) == 3) // fact + 2 pruned dims
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("Exchange hashpartitioning")) // no fact-side shuffle
  }

  test("cdc_router: probe side broadcast, no shuffle of the feed") {
    val p = plan("cdc_router")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("a4: aggregation is partial (map-side) before the exchange") {
    val p = plan("a4_agg_pricing_summary")
    assert(p.contains("partial_sum"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"))
  }

  test("w1 + ann: per-key top-N is pre-shuffled via WindowGroupLimit") {
    assert(plan("w1_window_dedup_latest").contains("WindowGroupLimit"))
    assert(plan("ann_knn_bruteforce").contains("WindowGroupLimit"))
  }

  test("lsh pairs: signature pipeline evaluated once — exactly one documents scan") {
    val p = plan("dedup_minhash_lsh_pairs")
    assert(scanCount(p) == 1, "a bucket self-join would re-scan documents")
  }

  test("ngram jaccard: no filter re-derives the shingle tree (InferFiltersFromGenerate)") {
    // plain explode(sh) lets the optimizer infer `size(sh) > 0` and
    // alias-substitute the whole tokenize+shingle+sort tree into a
    // per-row filter below the projection — the tree must only ever
    // appear in projections (evaluated once), never in a Filter
    val opt = SparkEntry
      .queries("dedup_ngram_jaccard")(spark, Sf)
      .queryExecution
      .optimizedPlan
    val offending = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("array_distinct") =>
        f
    }
    assert(offending.isEmpty, offending.mkString("\n"))
  }

  test("ngram jaccard: no cartesian/self-join of document sets") {
    val p = plan("dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct"))
    // prefix-filtered shape: the exploded shingle stream feeds both the
    // df count and the rank join (2 scans), and the verify stage reads
    // the shingle-set frame once per candidate side (2 more). 4 scans of
    // narrow projections; more means a pipeline is being re-evaluated.
    assert(scanCount(p) <= 4)
  }

  test("native kernels own the hot map stages (no interpreted HOF twins left)") {
    // simhash: ONE graft_simhash + ONE graft_md5_longs per plan — a
    // CollapseProject regression that re-inlines the staged token-hash
    // array into multiple references would duplicate the md5 pass
    val sim = plan("dedup_simhash")
    assert("graft_simhash".r.findAllIn(sim).size == 1, sim)
    assert("graft_md5_longs".r.findAllIn(sim).size == 1, sim)
    assert(!sim.contains("aggregate("), "per-bit HOF aggregates are back:\n" + sim)
    // jaccard: the shingle sets are the hashed-long kernel, not string
    // shingles (concat_ws only appears if the string pipeline returns)
    val jac = plan("dedup_ngram_jaccard")
    assert(jac.contains("graft_ngram_hashes"), jac)
    assert(!jac.contains("concat_ws"), "string shingles are back:\n" + jac)
    // minhash: base hashes come from the md5-array kernel feeding the
    // single-pass signature kernel
    val mh = plan("dedup_minhash_signature")
    assert(mh.contains("graft_md5_longs") && mh.contains("graft_minhash_sig"), mh)
  }

  test("contamination: reference side broadcast, corpus side not shuffled before the agg") {
    val p = plan("contamination_ngram_overlap")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum") || p.contains("partial"), "match counts must combine map-side")
  }

  test("round-6 operators: no cartesian/nested-loop anywhere, kernels in plan") {
    // ER pairs: block-bucket agg + in-bucket explode — zero join nodes,
    // the native JW kernel scores inside the projection
    val er = plan("er_fuzzy_part_pairs")
    assert(!er.contains("CartesianProduct") && !er.contains("BroadcastNestedLoop"), er)
    assert(er.contains("graft_jaro_winkler"), er)
    // linkage: the clipped catalog is a broadcast equi-join, election is
    // a window over scored candidates only
    val lb = plan("er_link_best")
    assert(lb.contains("BroadcastHashJoin") && !lb.contains("CartesianProduct"), lb)
    // all-pairs: prefix-index equi-joins only — a cartesian would mean
    // the prefix filter degenerated
    val ap = plan("dedup_allpairs_exact")
    assert(!ap.contains("CartesianProduct") && !ap.contains("BroadcastNestedLoop"), ap)
    // triangles: each plan arm is pinned on ITS OWN plan (round 15 —
    // the old plan-wide `contains("LeftSemi")` OR could be satisfied by
    // any unrelated join). The adjacency-broadcast default intersects
    // neighbor arrays inside a projection fed by broadcast joins:
    // array_intersect is the close itself and appears nowhere else in
    // the query, and no non-broadcast join strategy may appear at all.
    val tr = plan("graph_triangles")
    assert(!tr.contains("CartesianProduct") && !tr.contains("BroadcastNestedLoop"), tr)
    assert(tr.contains("array_intersect"), tr)
    assert(tr.contains("BroadcastHashJoin"), tr) // the adjacency builds
    // the wedge fallback, FORCED (adjBroadcastBytes = 0, legacy lazy
    // arm): the close is the LeftSemi equi-join on (b, c)
    import spark.implicits._
    val wedge = graft.operators.Triangles
      .perNode(Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"),
        adjBroadcastBytes = 0)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(wedge.contains("LeftSemi"), wedge)
    assert(!wedge.contains("CartesianProduct") && !wedge.contains("BroadcastNestedLoop"), wedge)
  }

  test("r7 additions: containment never cross-joins; temperature/lm_train shuffle once per level") {
    // exact containment: prefix x inverted-index equi-join on the
    // element — any cartesian/BNLJ would be the O(n^2) failure mode
    val ct = plan("dedup_containment")
    assert(!ct.contains("CartesianProduct") && !ct.contains("BroadcastNestedLoop"), ct)
    // temperature mixture: corpus aggregates ONCE on the domain; the
    // scalar totals come back via a broadcast nested-loop of ONE row
    // (crossJoin(broadcast(totals)) — the one legal BNLJ shape)
    val tm = plan("curation_domain_temperature")
    assert(tm.split("Exchange hashpartitioning").length - 1 <= 1,
      "corpus must shuffle at most once (domain agg):\n" + tm)
    // bigram LM training: the corpus-sized shuffle is the (w1,w2) agg
    // with a map-side partial; the marginal works on the vocab table
    val lm = plan("text_lm_train")
    assert(lm.contains("partial_count") || lm.contains("partial_sum"),
      "bigram agg must be partial (map-side):\n" + lm)
    assert(!lm.contains("CartesianProduct"), lm)
    // lsh: all table buckets from the native kernel, not per-plane dots
    val lsh = plan("ann_knn_lsh")
    assert(lsh.contains("graft_lsh_buckets"), lsh)
  }

  test("random projection: narrow map stage — no hash exchange, native dot kernel") {
    val p = plan("embedding_random_projection")
    assert(p.contains("graft_dot"), p)
    assert(
      !p.contains("Exchange hashpartitioning"),
      "the projection must not shuffle (posexplode is narrow):\n" + p
    )
  }

  test("token-budget mix: group mass broadcasts back; digest aggregates partially") {
    assert(plan("curation_token_budget_mix").contains("BroadcastHashJoin"))
    assert(plan("dq_content_digest").contains("partial_sum"))
  }

  test("pair operators: payloads ride the pair structs, never a bucket map") {
    // probing a bucket-local id->payload map per pair is an O(bucket)
    // scan that pushdown alias-substitution re-evaluates at every
    // predicate term (the 650 s simhash-pairs regression) — the pair
    // plans must contain no map construction at all
    for (q <- Seq("dedup_simhash_pairs", "dedup_embedding_cosine")) {
      val p = plan(q)
      assert(!p.contains("map_from_arrays"), s"$q builds a bucket map:\n$p")
      assert(!p.contains("element_at"), s"$q probes per pair:\n$p")
    }
  }
}
