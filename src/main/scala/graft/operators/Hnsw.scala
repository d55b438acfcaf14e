package graft.operators

import scala.collection.mutable

/** HNSW (Malkov & Yashunin, TPAMI '18) — the graph-index ANN path a
  * Faiss/Milvus/pgvector user expects as the production default for
  * high-recall serving, completing the engine's six-path recall gate
  * (lsh / ivf / int8 / pq / ivfpq / hnsw, all under one
  * [[Similarity.RecallFloors]] map).
  *
  * Distribution model (the part Spark owns): a navigable small-world
  * graph is an IN-MEMORY, pointer-chasing structure — the literature's
  * distributed deployments shard it (one sub-graph per partition;
  * queries fan out to every shard, shard-local beam search, global
  * merge), because a cross-machine graph walk would pay a network hop
  * per edge. [[Similarity.hnswCandidates]] implements exactly that:
  * each corpus partition builds its own HNSW once per query batch and
  * beam-searches the broadcast panel; the union of shard-local top
  * candidates is exact-re-ranked globally. Per-shard memory is the
  * shard's vectors + M links/node — the planner's partition sizing
  * (maxPartitionBytes) already bounds it. Recall composes cleanly:
  * the true global top-k is the union of each shard's true top-k, so
  * shard-level recall lower-bounds global recall.
  *
  * This class is the single-shard graph: deterministic (seeded level
  * draws, insertion in caller-sorted order), cosine metric over
  * pre-normalized vectors (distance = −dot), greedy descent through
  * the upper layers + beam (ef) search in layer 0, bidirectional links
  * pruned to maxM (2·M in layer 0, the paper's defaults). */
private[graft] final class HnswGraph(m: Int = 8, efConstruction: Int = 64,
                                     seed: Long = 20260816L) {
  private val maxM = m
  private val maxM0 = 2 * m
  private val mL = 1.0 / math.log(m.toDouble)
  private val rng = new scala.util.Random(seed)

  private val ids = mutable.ArrayBuffer.empty[Long]
  private val vecs = mutable.ArrayBuffer.empty[Array[Double]]
  // links(node)(level) — level 0 first; node participates in levels
  // 0..nodeLevel
  private val links = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entry = -1
  private var topLevel = -1

  def size: Int = ids.length

  /** −cosine for pre-normalized vectors: smaller = closer. */
  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    -s
  }

  /** Beam search one layer: returns up to `ef` (dist, node) closest to
    * q, seeded from `eps`. The paper's SEARCH-LAYER with a visited set
    * and a bounded result heap. */
  private def searchLayer(q: Array[Double], eps: Seq[Int], ef: Int,
                          level: Int): mutable.PriorityQueue[(Double, Int)] = {
    val visited = mutable.HashSet.empty[Int]
    // candidates: min-dist first (negate for Scala's max-heap)
    val cand = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by[(Double, Int), Double](-_._1))
    // results: max-dist first, so the worst is on top for eviction
    val res = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by[(Double, Int), Double](_._1))
    eps.foreach { ep =>
      if (visited.add(ep)) {
        val d = dist(q, vecs(ep))
        cand.enqueue((d, ep)); res.enqueue((d, ep))
      }
    }
    while (cand.nonEmpty) {
      val (dc, c) = cand.dequeue()
      if (dc > res.head._1 && res.size >= ef) {
        cand.clear() // nothing closer can appear: frontier is sorted
      } else {
        val nbrs = links(c)(level)
        var i = 0
        while (i < nbrs.length) {
          val e = nbrs(i)
          if (visited.add(e)) {
            val d = dist(q, vecs(e))
            if (res.size < ef || d < res.head._1) {
              cand.enqueue((d, e)); res.enqueue((d, e))
              if (res.size > ef) { res.dequeue(); () }
            }
          }
          i += 1
        }
      }
    }
    res
  }

  /** Connect `node` to up to cap closest of `nbrs` at `level`,
    * bidirectionally, pruning any neighbor that overflows its cap to
    * its closest links (the paper's simple selection — ample at shard
    * sizes; the diversity heuristic matters for clustered billions). */
  private def connect(node: Int, nbrs: Seq[(Double, Int)], level: Int): Unit = {
    val cap = if (level == 0) maxM0 else maxM
    val chosen = nbrs.sortBy(n => (n._1, n._2)).take(cap)
    links(node)(level) ++= chosen.map(_._2)
    chosen.foreach { case (_, nb) =>
      val l = links(nb)(level)
      l += node
      if (l.length > cap) {
        val v = vecs(nb)
        val pruned = l.map(x => (dist(v, vecs(x)), x))
          .sortBy(n => (n._1, n._2)).take(cap).map(_._2)
        l.clear(); l ++= pruned
      }
    }
  }

  def add(id: Long, v: Array[Double]): Unit = {
    val node = ids.length
    val level = math.min(31, (-math.log(
      math.max(rng.nextDouble(), 1e-12)) * mL).toInt)
    ids += id; vecs += v
    links += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
    if (entry < 0) { entry = node; topLevel = level; return }
    var ep = entry
    // greedy descent through layers above the node's level
    var l = topLevel
    while (l > level) {
      var improved = true
      while (improved) {
        improved = false
        val nbrs = links(ep)(math.min(l, links(ep).length - 1))
        var i = 0
        var best = dist(v, vecs(ep))
        while (i < nbrs.length) {
          val d = dist(v, vecs(nbrs(i)))
          if (d < best) { best = d; ep = nbrs(i); improved = true }
          i += 1
        }
      }
      l -= 1
    }
    // beam-insert at each layer from min(level, topLevel) down to 0
    var eps = Seq(ep)
    l = math.min(level, topLevel)
    while (l >= 0) {
      val w = searchLayer(v, eps, efConstruction, l).toSeq
      connect(node, w, l)
      eps = w.sortBy(n => (n._1, n._2)).take(1).map(_._2)
      l -= 1
    }
    if (level > topLevel) { topLevel = level; entry = node }
  }

  /** Top-k (id, cosine) for a pre-normalized query. */
  def search(q: Array[Double], k: Int, efSearch: Int): Seq[(Long, Double)] = {
    if (entry < 0) return Nil
    var ep = entry
    var l = topLevel
    while (l > 0) {
      var improved = true
      while (improved) {
        improved = false
        val nbrs = links(ep)(math.min(l, links(ep).length - 1))
        var i = 0
        var best = dist(q, vecs(ep))
        while (i < nbrs.length) {
          val d = dist(q, vecs(nbrs(i)))
          if (d < best) { best = d; ep = nbrs(i); improved = true }
          i += 1
        }
      }
      l -= 1
    }
    searchLayer(q, Seq(ep), math.max(efSearch, k), 0).toSeq
      .sortBy(n => (n._1, n._2)).take(k)
      .map { case (d, n) => (ids(n), -d) }
  }
}
