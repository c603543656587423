package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT all-pairs set-similarity join via prefix filtering (Bayardo,
  * Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007;
  * the PPJoin prefix bound of Xiao et al., WWW 2008) — the guaranteed-
  * no-false-negative complement of the LSH candidate generators in
  * [[ApproxDedup]]: LSH recall is probabilistic in the band geometry;
  * this join returns EVERY pair with Jaccard >= t, with pruning that is
  * purely a performance device.
  *
  * Prefix principle: order every set's elements by a single global
  * total order (ascending document frequency, ties by element value —
  * rarest first). For Jaccard threshold t, two sets can only reach t if
  * they share an element among their first `|s| - ceil(t*|s|) + 1`
  * elements, so only those PREFIX elements are ever indexed. Rare
  * elements index; corpus-hot elements land in suffixes and never
  * generate candidates — exactly the posting-explosion control a 100 TB
  * corpus needs. A length filter (`den*min >= num*max`) prunes
  * cross-size candidates before the verify.
  *
  * All arithmetic is integer: the threshold is the rational num/den and
  * every comparison cross-multiplies (`inter * den >= uni * num`), so
  * there is no floating-point boundary anywhere — Spark and the oracle
  * agree exactly by construction.
  *
  * Shuffle shape: one agg for df, one window shuffle on id for prefix
  * ranks, one equi-join on prefix element, one distinct on the
  * candidate pair key, and an exact verify that touches only candidate
  * pairs (array intersect of the two staged element arrays). Never a
  * corpus cross-join.
  */
object AllPairs {

  /** All pairs (id_a < id_b) with Jaccard(setA, setB) >= num/den.
    *
    * @param sets   one row per set
    * @param idCol  unique orderable id column name
    * @param setCol array column; elements are deduplicated internally
    * @param num    threshold numerator (Jaccard >= num/den)
    * @param den    threshold denominator
    * @param materializeSets cut the set/prefix lineage with eager
    *   localCheckpoints. The element arrays appear in SIX plan branches
    *   and recompute in each — but for CHEAP constructions (in-memory
    *   string shingling) the measured recompute is FASTER than
    *   serializing the fat arrays to executor storage (8.9 s vs
    *   10.2 s at sf0.1), so the default stays false. Turn it on when
    *   building a set row is genuinely expensive — remote reads,
    *   heavy parsing, UDF-priced tokenization — where one
    *   materialization beats six re-executions.
    * @return (id_a, id_b, inter, uni) — intersection / union sizes
    */
  def jaccardPairs(
      sets: DataFrame,
      idCol: String,
      setCol: String,
      num: Int,
      den: Int,
      materializeSets: Boolean = false
  ): DataFrame = {
    require(num > 0 && num <= den, s"threshold must be in (0,1]: got $num/$den")
    val docsPlan = sets
      .select(col(idCol).as("id"), array_distinct(col(setCol)).as("es"))
      .where(size(col("es")) > 0)
    val docs = if (materializeSets) docsPlan.localCheckpoint() else docsPlan
    val elems = docs.select(col("id"), size(col("es")).as("n"), explode(col("es")).as("e"))
    val dfreq = elems.groupBy("e").agg(count(lit(1)).as("df"))
    // global element order: (df asc, element asc) — rarest first, total
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("e"))
    val prefixPlan = elems
      .join(dfreq, "e")
      .withColumn("rn", row_number().over(w))
      // prefix length |s| - ceil(t*|s|) + 1, integer ceil
      .where(col("rn") <= col("n") - expr(s"($num * n + ${den - 1}) div $den") + 1)
      .select(col("e"), col("id"), col("n"))
    // the prefix index feeds BOTH sides of the candidate self-join —
    // materialize it once too (it is the small end: |prefix| < |elems|)
    val prefix = if (materializeSets) prefixPlan.localCheckpoint() else prefixPlan
    // The candidate stage deliberately keeps Catalyst's OWN exchanges —
    // both width experiments regressed it (measured at sf0.1,
    // control-normalized): an explicit repartition onto the pair keys
    // before distinct() ships every raw pair (losing the map-side
    // partial dedup of the per-shared-prefix-element duplication,
    // 9.1 -> 15.0 s), and explicit repartition(width, e) on the join
    // sides carries REPARTITION_BY_COL shuffle origin, which makes the
    // candidate join ineligible for AQE's OptimizeSkewedJoin — and a
    // hot prefix element IS the skew case this join lives with
    // (~1.5x). ENSURE_REQUIREMENTS exchanges keep skew-split + AQE
    // re-sizing; InputSizing stays the remedy for NON-join heavies
    // (wedge sorts) where no skew handler competes.
    val cand = prefix
      .as("a")
      .join(
        prefix.as("b"),
        col("a.e") === col("b.e") && col("a.id") < col("b.id") &&
          least(col("a.n"), col("b.n")) * den >= greatest(col("a.n"), col("b.n")) * num
      )
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(docs.select(col("id").as("id_a"), col("es").as("ea")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("es").as("eb")), "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        size(array_intersect(col("ea"), col("eb"))).cast("long").as("inter"),
        (size(col("ea")) + size(col("eb"))).cast("long").as("__sum")
      )
      .withColumn("uni", col("__sum") - col("inter"))
      .where(col("inter") * den >= col("uni") * num)
      .select("id_a", "id_b", "inter", "uni")
  }

  /** All DIRECTED pairs where set A is (near-)contained in set B:
    * |A ∩ B| / |A| >= num/den, id_a != id_b. The ASYMMETRIC complement
    * of [[jaccardPairs]]: symmetric Jaccard misses the
    * quote-wrapped / boilerplate-expanded duplicate (a 100-shingle doc
    * fully embedded in a 2000-shingle page scores Jaccard ~0.05 but
    * containment 1.0) — exactly the pair a training-corpus dedup must
    * catch, since the small doc contributes nothing the big one
    * doesn't.
    *
    * Prefix filtering adapts to the one-sided threshold: a qualifying
    * pair shares >= ceil(t*|A|) of A's elements, so A indexes only its
    * |A| - ceil(t*|A|) + 1 RAREST elements (global df-asc order — the
    * Bayardo/Chaudhuri prefix argument verbatim). The CONTAINER side
    * has no overlap bound relative to its own size, so it indexes all
    * its elements — the candidate join is A-prefix x B-inverted-index,
    * pruned by the cross-size bound |B| >= t*|A| (overlap can't exceed
    * |B|). df-asc ordering keeps boilerplate shingles out of prefixes,
    * which is what bounds the hot posting lists; threshold arithmetic
    * is integer cross-multiplication (no FP boundary on either
    * engine).
    *
    * @return (id_a, id_b, inter, n_a, n_b): A = the contained side;
    *         containment = inter / n_a >= num/den.
    */
  def containmentPairs(
      sets: DataFrame,
      idCol: String,
      setCol: String,
      num: Int,
      den: Int,
      materializeSets: Boolean = false
  ): DataFrame = {
    require(num > 0 && num <= den, s"threshold must be in (0,1]: got $num/$den")
    val docsPlan = sets
      .select(col(idCol).as("id"), array_distinct(col(setCol)).as("es"))
      .where(size(col("es")) > 0)
    val docs  = if (materializeSets) docsPlan.localCheckpoint() else docsPlan
    val elems = docs.select(col("id"), size(col("es")).as("n"), explode(col("es")).as("e"))
    val dfreq = elems.groupBy("e").agg(count(lit(1)).as("df"))
    val w     = Window.partitionBy(col("id")).orderBy(col("df"), col("e"))
    val ranked = elems.join(dfreq, "e").withColumn("rn", row_number().over(w))
    // contained-side prefix: |A| - ceil(t*|A|) + 1 rarest elements
    val prefixPlan = ranked
      .where(col("rn") <= col("n") - expr(s"($num * n + ${den - 1}) div $den") + 1)
      .select(col("e"), col("id"), col("n"))
    val prefix = if (materializeSets) prefixPlan.localCheckpoint() else prefixPlan
    // container-side index: every element (no prefix bound exists for
    // the big side of an asymmetric containment)
    val index = ranked.select(col("e"), col("id"), col("n"))
    // Catalyst's own exchanges on the candidate join — see the
    // jaccardPairs note: explicit width repartitions forfeit AQE
    // skew-splitting on hot posting elements, which this join (full
    // container index) needs even more than the symmetric one
    val cand = prefix
      .as("a")
      .join(
        index.as("b"),
        col("a.e") === col("b.e") && col("a.id") =!= col("b.id") &&
          col("b.n") * den >= col("a.n") * num // overlap <= |B|
      )
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(docs.select(col("id").as("id_a"), col("es").as("ea"), size(col("es")).as("n_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("es").as("eb"), size(col("es")).as("n_b")), "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        size(array_intersect(col("ea"), col("eb"))).cast("long").as("inter"),
        col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b")
      )
      .where(col("inter") * den >= col("n_a") * num)
  }
}
