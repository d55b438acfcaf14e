package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (SURVEY.md
  * §2c) — PageRank over the crawl's domain link graph, the standard
  * domain-authority signal a crawl-curation pipeline feeds into
  * quality weighting (OPIC/Common-Crawl-style harmonic-centrality
  * ranks are this plan shape too).
  *
  * Spark-first iteration: ranks live in a domain-keyed DataFrame; each
  * round is one equi-join (edges ⋈ ranks ⋈ outdeg) + one map-side-
  * combined aggregation — the exchange carries (node, long) rows, never
  * the graph payload. `localCheckpoint(eager)` per round cuts the
  * growing lineage exactly like q64's min-label loop. Iteration count
  * is FIXED (default 10), which is what makes the DuckDB oracle
  * possible: ten unrolled chained CTEs, no recursion-with-aggregation.
  *
  * Float discipline (§6): the per-round contribution Σ r(src)/outdeg
  * floor-scales each term to an exact 1e-12-granular long BEFORE the
  * sum (the q122 idiom), so the aggregation is order-free integer
  * arithmetic and every iteration is BIT-IDENTICAL in both engines by
  * induction: identical inputs → identical IEEE divide/multiply/floor
  * per term, identical integer sum, identical damping update.
  * Truncation loses < edges·1e-12 of rank mass per round — far below
  * any ranking-relevant signal, and deterministically the same
  * everywhere. */
object Graphs {

  /** Fixed-iteration damped PageRank over a directed edge list
    * (src, dst). Every node must appear as a src (no dangling mass —
    * the q154 edge derivation guarantees it by construction); dangling
    * nodes would silently lose their mass rather than redistribute. */
  def pagerank(edges: DataFrame, iters: Int = 10,
               alpha: Double = 0.85): DataFrame = {
    // Plan shape per round: the EDGE list (the only corpus-sized frame,
    // pinned — one derivation feeds all rounds) streams through two
    // BROADCAST hash joins against the node-sized ranks and out-degree
    // tables — no edge-side exchange, ever — then one map-side-combined
    // aggregation whose exchange carries ≤ nodes (node, long) rows.
    // `localCheckpoint(eager)` per round keeps each round's plan flat
    // (a lazily-composed 10-round tree re-plans all prior rounds per
    // round — measured 12 s vs ~4 s at sf0.01). Broadcasting ranks
    // bounds the node count to broadcast-able (~100M domains at
    // 8 GiB) — the right trade for domain graphs; a billion-node graph
    // swaps the hints for a co-partitioned shuffle join, same algebra.
    val e = graft.Pins.pin(edges.select(col("src"), col("dst")))
    val nodes = graft.Pins.pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val outdeg = graft.Pins.pin(
      e.groupBy(col("src")).agg(count(lit(1)).as("od")))
    val nn = nodes.agg(count(lit(1)).cast("double").as("n"))
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n")).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = e
        .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
        .join(broadcast(outdeg), "src")
        .select(col("dst").as("node"),
          floor(col("pr") / col("od").cast("double") * lit(1.0e12))
            .cast("long").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.crossJoin(broadcast(nn))
        .join(broadcast(contrib), Seq("node"), "left_outer")
        .select(col("node"),
          ((lit(1.0) - lit(alpha)) / col("n") +
            lit(alpha) * (coalesce(col("s"), lit(0L)).cast("double") /
              lit(1.0e12))).as("pr"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** q154: DOMAIN-AUTHORITY PageRank — the q148 domains linked along
    * the crawl path (each document's domain links the next doc_id's
    * domain, wrapping max→min so every domain has out-edges: no
    * dangling mass, a strongly-connected chain). A synthetic link
    * derivation — the documents table has no anchor/href data — but
    * one that is pure portable column algebra, so the WHOLE iterative
    * computation is oracle hash-exact, not rows-only: the first
    * fixed-point-verified iterative operator in the suite. */
  def q154(documents: DataFrame, iters: Int = 10,
           alpha: Double = 0.85): DataFrame = {
    val d = UrlCuration.q148(documents).select(col("doc_id"), col("domain"))
    val succ = d.select((col("doc_id") - 1).as("doc_id"),
      col("domain").as("dst"))
    val bounds = d.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    val chain = d.join(succ, "doc_id")
      .select(col("domain").as("src"), col("dst"))
    val wrap = d.crossJoin(broadcast(bounds))
      .filter(col("doc_id") === col("hi"))
      .select(col("domain").as("src"), col("lo"))
      .join(d.select(col("doc_id").as("lo"), col("domain").as("dst")), "lo")
      .select(col("src"), col("dst"))
    pagerank(chain.unionByName(wrap), iters, alpha)
      .withColumnRenamed("node", "domain")
      .orderBy(col("domain"))
  }
}
