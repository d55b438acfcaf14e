package graft

import org.apache.spark.sql.DataFrame

/** pr01: QUERY-PLAN dataflow report (DHive, VLDB'23 — execution
  * analysis via dataflow — scoped to what a library can assert
  * statically): count the plan features that decide cost at 100 TB —
  * exchanges (each one is a cluster-wide shuffle barrier), join
  * strategies (broadcast vs sort-merge), and whole-stage codegen
  * spans — from the SAME formatted explain a human reads.
  *
  * Two uses:
  *  - observability: `analyze(df)` → a one-row summary any dashboard
  *    or notebook can collect;
  *  - PLAN-BUDGET regression specs: `PlanBudgetSpec` pins exchange
  *    ceilings and broadcast-join floors for flagship operators, so a
  *    future edit that silently degrades a broadcast join into a
  *    sort-merge join, or adds a shuffle, FAILS THE SUITE instead of
  *    surfacing as a 100× regression in production. The bench catches
  *    wall-time drift at test scale; the plan budget catches shape
  *    drift that only costs at cluster scale.
  */
object PlanReport {

  case class Report(exchanges: Int, broadcastExchanges: Int,
                    broadcastJoins: Int, sortMergeJoins: Int,
                    codegenSpans: Int, inMemoryScans: Int = 0)

  /** Count plan features from the formatted explain output. String-
    * based on purpose: stable across AQE wrapping (AdaptiveSparkPlan
    * hides children from `collect` until execution) and across Spark
    * minor versions. With `execute = true` the frame is collected
    * first — `collect()` runs THE df's own QueryExecution (foreach/
    * count would compile a fresh one), so the explain then shows the
    * FINAL adaptive plan, where codegen ids and AQE join rewrites
    * live. Only use on result-sized frames (budget specs run at
    * sf0.001). */
  def analyze(df: DataFrame, execute: Boolean = false): Report = {
    if (execute) { df.collect(); () }
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out))(df.explain("formatted"))
    val s = out.toString
    def count(re: String): Int = re.r.findAllIn(s).size
    Report(
      exchanges = count("""\(\d+\) Exchange"""),
      broadcastExchanges = count("""\(\d+\) BroadcastExchange"""),
      broadcastJoins = count("""\(\d+\) BroadcastHashJoin"""),
      sortMergeJoins = count("""\(\d+\) SortMergeJoin"""),
      codegenSpans = """\[codegen id : (\d+)\]""".r
        .findAllMatchIn(s).map(_.group(1)).toSet.size,
      // each InMemoryTableScan is a consumer reading a pinned frame
      // instead of replaying its plan — the reuse floor budget specs
      // assert for multi-consumer sub-plans
      inMemoryScans = count("""\(\d+\) InMemoryTableScan"""))
  }
}
