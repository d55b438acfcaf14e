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
  * This class is the single-shard graph: deterministic (level draws
  * are a PURE HASH of the node id — see [[add]] — so a node's level
  * does not depend on insertion order; links still do, hence
  * insertion in caller-sorted order), cosine metric over
  * pre-normalized vectors (distance = −dot), greedy descent through
  * the upper layers + beam (ef) search in layer 0, bidirectional links
  * pruned to maxM (2·M in layer 0, the paper's defaults).
  *
  * [[toBytes]]/[[HnswGraph.fromBytes]] round-trip the whole graph
  * bit-exactly (raw double bits) — the s29 persisted-index payload.
  * A deserialized graph keeps accepting [[add]]s: hash-based levels
  * mean an append draws the same level the vector would have drawn in
  * a continuous build, so incremental maintenance needs no RNG state
  * in the artifact. */
private[graft] final class HnswGraph(val m: Int = 8,
                                     val efConstruction: Int = 64,
                                     val seed: Long = 20260816L) {
  private val maxM = m
  private val maxM0 = 2 * m
  private val mL = 1.0 / math.log(m.toDouble)

  private val ids = mutable.ArrayBuffer.empty[Long]
  private val vecs = mutable.ArrayBuffer.empty[Array[Double]]
  // links(node)(level) — level 0 first; node participates in levels
  // 0..nodeLevel
  private val links = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entry = -1
  private var topLevel = -1

  def size: Int = ids.length

  /** Ids in insertion order (spec coverage checks). */
  def idList: Seq[Long] = ids.toSeq

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

  /** Geometric level draw as a pure function of the id: splitmix64 of
    * (id ^ seed) → uniform in (0,1] → floor(−ln(u)·mL). Same
    * distribution as the paper's RNG draw, but a node's level is a
    * property of the node, not of when it was inserted — the invariant
    * the persisted-index append path relies on. */
  private def levelOf(id: Long): Int = {
    var z = id ^ seed
    z += 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    // 53 high bits → uniform double in [0,1), nudged away from 0
    val u = math.max((z >>> 11).toDouble / (1L << 53).toDouble, 1e-12)
    math.min(31, (-math.log(u) * mL).toInt)
  }

  def add(id: Long, v: Array[Double]): Unit = {
    val node = ids.length
    val level = levelOf(id)
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

  /** Bit-exact binary image of the graph — the s29 shard payload.
    * Vectors serialize as raw double bits (lossless), links as adjacency
    * ints; entry/topLevel ride along so a loaded graph searches without
    * any reconstruction pass. Versioned so a future layout change can
    * refuse old payloads loudly instead of misreading them. */
  def toBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(
      new java.util.zip.GZIPOutputStream(bos))
    o.writeInt(HnswGraph.Magic); o.writeInt(1)
    o.writeInt(m); o.writeInt(efConstruction); o.writeLong(seed)
    o.writeInt(ids.length)
    o.writeInt(if (ids.isEmpty) 0 else vecs(0).length)
    o.writeInt(entry); o.writeInt(topLevel)
    var n = 0
    while (n < ids.length) {
      o.writeLong(ids(n))
      val v = vecs(n); var i = 0
      while (i < v.length) { o.writeLong(java.lang.Double.doubleToRawLongBits(v(i))); i += 1 }
      val ls = links(n)
      o.writeInt(ls.length)
      var l = 0
      while (l < ls.length) {
        val adj = ls(l)
        o.writeInt(adj.length)
        var j = 0
        while (j < adj.length) { o.writeInt(adj(j)); j += 1 }
        l += 1
      }
      n += 1
    }
    o.close()
    bos.toByteArray
  }
}

private[graft] object HnswGraph {
  private val Magic = 0x47484e57 // "GHNW"

  /** Deterministic shard assignment for the EXPLICIT-layout build and
    * the persisted-index append path: splitmix64 of the id, floorMod
    * into n shards. Self-contained on purpose — the fit-time layout
    * and every later append must agree on this function forever, so it
    * depends on nothing Catalyst might re-seed. */
  def shardOf(id: Long, n: Int): Int = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    java.lang.Math.floorMod(z, n.toLong).toInt
  }

  /** Inverse of [[HnswGraph.toBytes]] — returns a fully functional
    * graph (searchable AND appendable). Fails loudly on a foreign or
    * future-versioned payload: a persisted index artifact misread as
    * an empty graph would silently serve recall 0. */
  def fromBytes(bytes: Array[Byte]): HnswGraph = {
    val in = new java.io.DataInputStream(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    require(in.readInt() == Magic, "not an HNSW shard payload")
    val ver = in.readInt()
    require(ver == 1, s"unsupported HNSW payload version $ver")
    val m = in.readInt(); val efC = in.readInt(); val seed = in.readLong()
    val g = new HnswGraph(m, efC, seed)
    val n = in.readInt(); val dim = in.readInt()
    g.entry = in.readInt(); g.topLevel = in.readInt()
    var k = 0
    while (k < n) {
      g.ids += in.readLong()
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) { v(i) = java.lang.Double.longBitsToDouble(in.readLong()); i += 1 }
      g.vecs += v
      val nLevels = in.readInt()
      val ls = Array.fill(nLevels)(mutable.ArrayBuffer.empty[Int])
      var l = 0
      while (l < nLevels) {
        val deg = in.readInt()
        var j = 0
        while (j < deg) { ls(l) += in.readInt(); j += 1 }
        l += 1
      }
      g.links += ls
      k += 1
    }
    in.close()
    g
  }
}
