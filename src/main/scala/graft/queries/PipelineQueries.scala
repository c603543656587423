package graft.queries

import graft.jobs.PipelineE2e

/** The orchestrated end-to-end chain as a first-class bench/verify row.
  * No SQL oracle — the run is a multi-load stateful pipeline (two SCD2
  * upserts per source with intermediate snapshot state), which a single
  * DuckDB statement cannot express; the driver records the rows/schema
  * check here, and JobMainSpec pins the exact audit counts the summary
  * emits (every value is a deterministic function of the orders
  * keyspace). The bench row is the point: it times the reference's
  * actual operating mode — feed -> conform -> route -> SCD2 -> audit,
  * x3 sources against a pre-seeded snapshot — not just its operators.
  */
object PipelineQueries {
  val qs: Seq[Q] = Seq(
    Q(
      "pipeline_e2e",
      (s, dir) => {
        // per-application workspace with age-based GC of prior runs
        val work = TmpWorkspace.scoped(s, "graft_e2e", dir)
        PipelineE2e.run(s, dir, work)
      },
      None
    )
  )
}
