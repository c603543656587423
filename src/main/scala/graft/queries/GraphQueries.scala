package graft.queries

import graft.Tables
import graft.operators.{LabelPropagation, PageRank}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph/centrality queries — the link-analysis quality-signal family
  * of web-corpus curation (Common Crawl ships per-host PageRank /
  * harmonic centrality; corpus filters consume it). The oracle unrolls
  * the fixed iteration count into chained CTEs because DuckDB bans
  * aggregates inside a recursive CTE member; integer-only rank
  * arithmetic (see [[graft.operators.PageRank]]) makes the two engines
  * agree exactly, iteration by iteration.
  */
object GraphQueries {
  private val Iterations = 5
  private val LpaRounds  = 4

  /** Shared undirected part <-> supplier co-occurrence edge list (both
    * directions from ONE lineitem scan via explode).
    */
  private def coEdges(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .select(
        explode(
          array(
            struct((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst")),
            struct((col("l_suppkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
          )
        ).as("e")
      )
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()

  private val EdgesSql =
    """edges AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT l_partkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
      |    UNION ALL
      |    SELECT l_suppkey*2+1, l_partkey*2 FROM lineitem))""".stripMargin

  /** Undirected part <-> supplier co-occurrence graph from lineitem,
    * node ids disambiguated by parity (part = 2k, supplier = 2k+1).
    * Both edge directions come out of ONE scan via explode (a
    * union-of-two-selects would plant the lineitem scan twice).
    */
  val qs: Seq[Q] = Seq(
    Q(
      "graph_pagerank",
      (s, dir) => {
        val edges = Tables
          .lineitem(s, dir)
          .select(
            explode(
              array(
                struct(
                  (col("l_partkey") * 2).as("src"),
                  (col("l_suppkey") * 2 + 1).as("dst")
                ),
                struct(
                  (col("l_suppkey") * 2 + 1).as("src"),
                  (col("l_partkey") * 2).as("dst")
                )
              )
            ).as("e")
          )
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .distinct()
        PageRank.ranks(edges, Iterations).select(col("id"), col("r"))
      },
      Some {
        val init = PageRank.InitMicro
        val base = PageRank.InitMicro - PageRank.DampMilli * 1000L
        val d    = PageRank.DampMilli
        val steps = (1 to Iterations)
          .map { i =>
            s"""c$i AS (
               |  SELECT e.dst AS id, CAST(sum(p.r // d.outdeg) AS BIGINT) AS s
               |  FROM edges e JOIN deg d ON e.src = d.src
               |  JOIN it${i - 1} p ON p.id = e.src GROUP BY 1),
               |it$i AS (
               |  SELECT n.id, CAST($base + ($d * coalesce(c.s, 0)) // 1000 AS BIGINT) AS r
               |  FROM nodes n LEFT JOIN c$i c ON n.id = c.id)""".stripMargin
          }
          .mkString(",\n")
        s"""WITH edges AS (
           |  SELECT DISTINCT src, dst FROM (
           |    SELECT l_partkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
           |    UNION ALL
           |    SELECT l_suppkey*2+1, l_partkey*2 FROM lineitem)),
           |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
           |nodes AS (SELECT DISTINCT id FROM (
           |  SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
           |it0 AS (SELECT id, CAST($init AS BIGINT) AS r FROM nodes),
           |$steps
           |SELECT id, r FROM it$Iterations""".stripMargin
      }
    ),

    // ---- deterministic synchronous label propagation (community
    //      detection): every node adopts its in-neighbors' most
    //      frequent label, ties to the SMALLEST label — a pure function
    //      of (edges, rounds), unlike the async/random-tie textbook
    //      LPA, so the oracle replays every round. Per round: one
    //      edge-label join + (dst,lbl) counts partial-agg + max_by —
    //      never a window over raw neighbor rows. The oracle picks via
    //      row_number, an independent argmax formulation. ----
    Q(
      "graph_label_prop",
      (s, dir) =>
        LabelPropagation
          .propagate(coEdges(s, dir), LpaRounds)
          .select(col("id"), col("lbl")),
      Some {
        val steps = (1 to LpaRounds)
          .map { i =>
            s"""c$i AS (
               |  SELECT e.dst AS id, p.lbl, count(*) AS c
               |  FROM edges e JOIN it${i - 1} p ON p.id = e.src GROUP BY 1, 2),
               |w$i AS (
               |  SELECT id, lbl, row_number() OVER (
               |    PARTITION BY id ORDER BY c DESC, lbl) AS rn FROM c$i),
               |it$i AS (
               |  SELECT prev.id, coalesce(w.lbl, prev.lbl) AS lbl
               |  FROM it${i - 1} prev
               |  LEFT JOIN (SELECT id, lbl FROM w$i WHERE rn = 1) w ON w.id = prev.id)""".stripMargin
          }
          .mkString(",\n")
        s"""WITH $EdgesSql,
           |nodes AS (SELECT DISTINCT id FROM (
           |  SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
           |it0 AS (SELECT id, id AS lbl FROM nodes),
           |$steps
           |SELECT id, lbl FROM it$LpaRounds""".stripMargin
      }
    ),

    // ---- exact per-node triangle counts (local clustering coefficient
    //      ingredient) over the part-part co-purchase graph (parts
    //      sharing an order). Spark runs the degree-ordered orientation
    //      (compact-forward): wedge fan-out bounded O(sqrt(m)) per
    //      node, closing is one equi-join; the oracle is the naive
    //      a<b<c enumeration — an independent formulation. ----
    Q(
      "graph_triangles",
      (s, dir) => {
        val pp = Tables
          .lineitem(s, dir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val edges = pp
          .as("a")
          .join(pp.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .select(col("a.p").as("src"), col("b.p").as("dst"))
        // capacity lever, not a semantics lever: K>1 bounds the peak
        // materialized wedge intermediate to ~1/K (the result is pass-
        // count-invariant — TrianglesSpec pins it), so the O(m^1.5)
        // wedge set can be walked within a fixed scratch-disk budget.
        // "auto" sizes K from the analytic wedge count against the
        // budget (SPARK_GRAFT_TRIANGLES_DISK_BUDGET_GB, default 16).
        // Both values are validated HERE so a typo surfaces as a named
        // config error, not a NumberFormatException mid-query.
        def envFail(name: String, got: String, want: String): Nothing =
          throw new IllegalArgumentException(
            s"$name must be $want, got '$got'")
        val passes = sys.env.get("SPARK_GRAFT_TRIANGLES_PASSES") match {
          case None         => 1
          case Some("auto") => 0
          case Some(v) =>
            v.toIntOption.filter(_ >= 1).getOrElse(
              envFail("SPARK_GRAFT_TRIANGLES_PASSES", v, "a positive integer or 'auto'"))
        }
        val budget = sys.env.get("SPARK_GRAFT_TRIANGLES_DISK_BUDGET_GB") match {
          case None => graft.operators.Triangles.DefaultWedgeDiskBudgetBytes
          case Some(v) =>
            v.toLongOption.filter(_ >= 1).map(_ << 30).getOrElse(
              envFail("SPARK_GRAFT_TRIANGLES_DISK_BUDGET_GB", v, "a positive integer (GiB)"))
        }
        // plan lever (round 14): "auto" picks adjacency-broadcast when
        // the out-adjacency fits the budget (no wedge intermediate at
        // all), else the chunked wedge join; "adj"/"wedge" force one
        // arm for A/Bs. Result-identical — TrianglesSpec pins it.
        val adjBudget = sys.env.get("SPARK_GRAFT_TRIANGLES_PLAN") match {
          case None | Some("auto") => graft.operators.Triangles.DefaultAdjBroadcastBytes
          case Some("adj")         => Long.MaxValue
          case Some("wedge")       => 0L
          case Some(v) =>
            envFail("SPARK_GRAFT_TRIANGLES_PLAN", v, "'auto', 'adj', or 'wedge'")
        }
        graft.operators.Triangles
          .perNode(edges, wedgePasses = passes, wedgeDiskBudgetBytes = budget,
            adjBroadcastBytes = adjBudget)
      },
      Some("""WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
             |e AS (SELECT DISTINCT a.p AS u, b.p AS v
             |      FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p),
             |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
             |        FROM e e1 JOIN e e2 ON e2.u = e1.v
             |        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
             |x AS (SELECT unnest([a, b, c]) AS id FROM tri),
             |cnt AS (SELECT id, count(*) AS n FROM x GROUP BY 1),
             |nodes AS (SELECT DISTINCT u AS id FROM e UNION SELECT v FROM e)
             |SELECT n.id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_tri
             |FROM nodes n LEFT JOIN cnt c USING (id)""".stripMargin)
    ),

    // ---- common-neighbor link prediction over the same co-purchase
    //      graph: top-5 non-edges per part ranked by capped common-
    //      neighbor count, with exact-integer Jaccard against true
    //      degrees. The per-center cap (32 smallest neighbor ids) is
    //      the deterministic-truncation scale lever — a hub's wedge
    //      fan-out is bounded at cap^2/2 regardless of its degree, and
    //      the oracle replays the identical cap. ----
    Q(
      "graph_link_prediction",
      (s, dir) => {
        val pp = Tables
          .lineitem(s, dir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val edges = pp
          .as("a")
          .join(pp.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .select(col("a.p").as("src"), col("b.p").as("dst"))
        graft.operators.LinkPrediction
          .predictLinks(edges, capDeg = 32, minCommon = 2L, topK = 5)
      },
      Some("""WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
             |e AS (SELECT DISTINCT a.p AS eu, b.p AS ev
             |      FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p),
             |adj AS (SELECT eu AS w, ev AS n FROM e UNION ALL SELECT ev, eu FROM e),
             |deg AS (SELECT w AS id, count(*) AS d FROM adj GROUP BY 1),
             |capped AS (SELECT w, n FROM (
             |    SELECT w, n, row_number() OVER (PARTITION BY w ORDER BY n ASC) AS rn
             |    FROM adj) WHERE rn <= 32),
             |wed AS (SELECT a.n AS u, b.n AS v
             |        FROM capped a JOIN capped b ON a.w = b.w AND a.n < b.n),
             |cnt AS (SELECT u, v, count(*) AS cn FROM wed GROUP BY 1, 2
             |        HAVING count(*) >= 2),
             |ne AS (SELECT cnt.u, cnt.v, cnt.cn FROM cnt
             |       LEFT JOIN e ON cnt.u = e.eu AND cnt.v = e.ev WHERE e.eu IS NULL),
             |sc AS (SELECT ne.u, ne.v, ne.cn, du.d AS du, dv.d AS dv,
             |         (1000000 * ne.cn) // (du.d + dv.d - ne.cn) AS jac
             |       FROM ne JOIN deg du ON du.id = ne.u JOIN deg dv ON dv.id = ne.v),
             |sym AS (SELECT u AS node, v AS candidate, cn, du, dv, jac FROM sc
             |        UNION ALL SELECT v, u, cn, dv, du, jac FROM sc),
             |r AS (SELECT node, candidate, cn, du, dv, jac,
             |        row_number() OVER (PARTITION BY node ORDER BY cn DESC, candidate ASC) AS rnk
             |      FROM sym)
             |SELECT node, candidate, CAST(cn AS BIGINT) AS cn, CAST(du AS BIGINT) AS du,
             |  CAST(dv AS BIGINT) AS dv, CAST(jac AS BIGINT) AS jac_micro, CAST(rnk AS INT) AS rnk
             |FROM r WHERE rnk <= 5""".stripMargin)
    ),

    // ---- k-core peeling over the co-purchase graph: 4 SYNCHRONOUS
    //      rounds (every round simultaneously removes all survivors
    //      with surviving-degree < k), emitting each node's removal
    //      round — the onion-layer depth signal. The round cap makes
    //      the result round-count-deterministic at ANY scale (the
    //      PageRank unrolled-iterations discipline; at sf0.01 true
    //      convergence needs 5 rounds, so the cap genuinely binds);
    //      KCoreSpec pins the uncapped fixpoint == a naive peel. ----
    Q(
      "graph_kcore",
      (s, dir) => {
        val pp = Tables
          .lineitem(s, dir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val edges = pp
          .as("a")
          .join(pp.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .select(col("a.p").as("src"), col("b.p").as("dst"))
        // degree-plan A/B lever (round-14): 'reaggregate' replays the
        // r13 per-round full-degree plan so the incremental cut's win
        // is measurable same-session from one HEAD. Validated here so
        // a typo is a named config error, not a silent default.
        val kcorePlan = sys.env.get("SPARK_GRAFT_KCORE_PLAN") match {
          case None => graft.operators.KCore.Plan.Incremental
          case Some(v)
              if v == graft.operators.KCore.Plan.Incremental ||
                v == graft.operators.KCore.Plan.Reaggregate => v
          case Some(v) =>
            throw new IllegalArgumentException(
              s"SPARK_GRAFT_KCORE_PLAN must be 'incremental' or 'reaggregate', got '$v'")
        }
        graft.operators.KCore.peel(edges, k = 80L, maxRounds = Some(4), plan = kcorePlan)
      },
      Some {
        // every a_r is referenced several times by round r+1; DuckDB
        // inlines plain CTEs, which re-evaluates the whole prefix
        // EXPONENTIALLY across rounds (observed: >25 GB spill at
        // sf0.1) — MATERIALIZED pins each round to one evaluation
        val rounds = (1 to 4).map { r =>
          val prev = if (r == 1) "n0" else s"a${r - 1}"
          s"""d$r AS MATERIALIZED (SELECT adj.id, count(*) AS d FROM adj
             |  JOIN $prev x ON adj.id = x.id JOIN $prev y ON adj.nbr = y.id GROUP BY 1),
             |r$r AS MATERIALIZED (SELECT $prev.id FROM $prev LEFT JOIN d$r ON $prev.id = d$r.id
             |  WHERE coalesce(d, 0) < 80),
             |a$r AS MATERIALIZED (SELECT id FROM $prev EXCEPT SELECT id FROM r$r)""".stripMargin
        }.mkString(",\n")
        s"""WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
           |e AS MATERIALIZED (SELECT DISTINCT a.p AS eu, b.p AS ev
           |      FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p),
           |n0 AS MATERIALIZED (SELECT DISTINCT eu AS id FROM e UNION SELECT ev FROM e),
           |adj AS MATERIALIZED (SELECT eu AS id, ev AS nbr FROM e UNION ALL SELECT ev, eu FROM e),
           |$rounds
           |SELECT id, CAST(0 AS INT) AS removed_round FROM a4
           |UNION ALL SELECT id, 1 FROM r1
           |UNION ALL SELECT id, 2 FROM r2
           |UNION ALL SELECT id, 3 FROM r3
           |UNION ALL SELECT id, 4 FROM r4""".stripMargin
      }
    )
  )
}
