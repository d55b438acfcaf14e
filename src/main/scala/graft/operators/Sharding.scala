package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shard-placement analytics (SURVEY §2c) — what fraction of a corpus
  * MOVES when the shard count changes, under naive modulo placement
  * vs a consistent-hash ring (Karger et al. 1997; the memcached/Dynamo
  * placement scheme). The capacity-planning number behind every
  * "add 4 shards to the embedding store" decision: modulo re-shuffles
  * nearly everything (cache cold, re-index storm), a ring moves only
  * ~(M−N)/M of keys, all of them TO the new shards.
  */
object Sharding {

  /** q171: REBALANCE REPORT for N → M shards. Placement domains:
    *  - `mod`:  shard = h(doc) % N  →  h(doc) % M
    *  - `ring`: each shard owns `vnodes` virtual points at
    *    h("s:<shard>:<j>"); a doc at position p belongs to the first
    *    vnode clockwise (smallest pos ≥ p, wrapping to the ring min).
    *
    * Per strategy: docs moved, moved fraction, and how many moves
    * landed on a NEW shard (≥ N) — for a ring that is ALL of them
    * (a doc moves only when a new vnode lands between it and its old
    * successor), which the spec asserts as the structural guarantee.
    *
    * Exactness (§6): positions are the portable
    * [[graft.functions.PolyFingerprint]]; ring lookup = first element
    * of a SORTED (pos, shard) struct array (ties pos→shard,
    * deterministic in both engines); counts exact longs, one double
    * divide → hash-exact.
    *
    * Plan shape at scale: both rings are (N+M)·vnodes structs — a
    * one-row broadcast; assignment is a per-row array probe inside
    * codegen, no join, no shuffle except the final 2-row aggregate.
    * (A binary search would beat the linear `filter` probe for
    * thousand-vnode rings; at 8–160 points the array filter is
    * already cache-resident.) */
  def q171(documents: DataFrame, n: Int = 16, m: Int = 20,
           vnodes: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    // the char-fold fingerprint has NO avalanche (consecutive strings
    // land adjacent), so ring positions get the Knuth multiplicative
    // mix — (h·2654435761) mod p — the q150 oracle's portable idiom;
    // ~2.65e18 max product, well inside long range in both engines
    def mix(h: org.apache.spark.sql.Column) =
      pmod(h * lit(2654435761L), lit(1000000007L))
    def ring(shards: Int): DataFrame =
      spark.range(shards.toLong * vnodes)
        .select(expr(s"id div $vnodes").as("shard"),
          pmod(col("id"), lit(vnodes.toLong)).as("j"))
        .select(col("shard"),
          mix(graft.functions.PolyFingerprint(
            concat(lit("s:"), col("shard").cast("string"),
              lit(":"), col("j").cast("string")))).as("pos"))
        .agg(sort_array(collect_list(struct(col("pos"), col("shard"))))
          .as("ring"))
    def ringAssign(arr: String, p: org.apache.spark.sql.Column) = {
      val succ = filter(col(arr), x => x.getField("pos") >= p)
      element_at(coalesce(
        when(size(succ) > 0, succ), col(arr)), 1).getField("shard")
    }
    val scored = documents
      .select(mix(graft.functions.PolyFingerprint(
        col("doc_id").cast("string"))).as("h"))
      .crossJoin(broadcast(ring(n).withColumnRenamed("ring", "ring_n")))
      .crossJoin(broadcast(ring(m).withColumnRenamed("ring", "ring_m")))
      .select(
        pmod(col("h"), lit(n.toLong)).as("mod_old"),
        pmod(col("h"), lit(m.toLong)).as("mod_new"),
        ringAssign("ring_n", col("h")).as("ring_old"),
        ringAssign("ring_m", col("h")).as("ring_new"))
    val report = (strategy: String, o: String, nw: String) =>
      scored.agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(when(col(o) =!= col(nw), 1L).otherwise(0L)).cast("long")
          .as("n_moved"),
        sum(when(col(o) =!= col(nw) && col(nw) >= n, 1L).otherwise(0L))
          .cast("long").as("moved_to_new"))
        .select(lit(strategy).as("strategy"), col("n_docs"),
          col("n_moved"), col("moved_to_new"),
          (col("n_moved").cast("double") / col("n_docs").cast("double"))
            .as("moved_frac"))
    report("mod", "mod_old", "mod_new")
      .unionByName(report("ring", "ring_old", "ring_new"))
      .orderBy(col("strategy"))
  }
}
