package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q155: ORACLE-EXACT distributed k-means (fixed-round Lloyd's) over
  * the embedding corpus — the workhorse clustering a curation pipeline
  * runs for SemDeDup-style semantic buckets, topic mixes, or IVF coarse
  * quantizers (q55/s11 fit on a driver sample; this is the full-corpus
  * distributed form).
  *
  * The second member of the fixed-point ITERATIVE family (q154's
  * induction argument, §6): every round is bit-identical across
  * engines because
  *  - DISTANCES live in the integer domain: dist(v,c) =
  *    Σ_i floor((v_i−c_i)²·1e8) summed as longs — each term is a fixed
  *    IEEE op sequence over identical inputs, the sum is order-free,
  *    and the ARGMIN compares integers (no last-ulp assignment lottery
  *    ever), ties break on the lower centroid id;
  *  - CENTROID UPDATES are the q122 fixed-point mean: per-dimension
  *    sums of floor(x·1e8) longs, one double divide;
  *  - an EMPTY cluster keeps its previous centroid (both engines);
  *  - the round count is FIXED (the oracle unrolls rounds as chained
  *    CTEs; a float convergence test would be a cross-engine lottery).
  *
  * Plan shape per round: assignment is a per-partition primitive loop
  * over the BROADCAST k×D centroid matrix (k·D multiply-adds per row —
  * no shuffle, no per-pair materialization); the update is one
  * map-side-combined aggregate over (cluster, dim) cells (≤ k·D rows
  * per partition reach the exchange); the k×D new centroids collect to
  * the driver (metadata, the s11/pcaFit contract) and broadcast back.
  * Corpus size never reaches an exchange. */
object KMeans {

  /** (vec_id, cluster, dist) after `iters` rounds of Lloyd's from the
    * deterministic seed (the k smallest vec_ids' vectors). `dist` is
    * the fixed-point long distance to the final centroid. */
  def q155(embeddings: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = graft.Pins.pin(
      embeddings.select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])])

    // deterministic seed: the k smallest vec_ids' vectors (same rule in
    // the oracle); collect is k×D — metadata
    var centroids: Array[Array[Double]] = vecs
      .orderBy(col("vec_id")).limit(k).collect()
      .map { case (_, e) => e.map(_.toDouble) }

    // kernel carries the vector through so the update pass needs no
    // join back to the corpus — assignment is shuffle-free, the only
    // exchange per round is the k×D cell aggregate
    def assign(cs: Array[Array[Double]]) = {
      val bc = spark.sparkContext.broadcast(cs)
      vecs.map { case (id, e) =>
        val c = bc.value
        var bestK = 0; var bestD = Long.MaxValue
        var kk = 0
        while (kk < c.length) {
          val row = c(kk); var s = 0L; var i = 0
          while (i < row.length) {
            val d = e(i).toDouble - row(i)
            s += math.floor(d * d * 1.0e8).toLong
            i += 1
          }
          if (s < bestD) { bestD = s; bestK = kk } // strict <: ties → lower k
          kk += 1
        }
        (id, bestK, bestD, e)
      }.toDF("vec_id", "cluster", "dist", "embedding")
    }

    for (_ <- 1 to iters) {
      // fixed-point per-dimension means, map-side combined to k×D cells
      val means = assign(centroids)
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("cluster"), col("i"))
        .agg(sum(floor(col("x").cast("double") * lit(1.0e8)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .select(col("cluster"), col("i"),
          ((col("s").cast("double") / lit(1.0e8)) /
            col("n").cast("double")).as("m"))
        .collect()
      val next = centroids.map(_.clone()) // empty cluster keeps its centroid
      means.foreach { r =>
        next(r.getAs[Int]("cluster"))(r.getAs[Int]("i")) = r.getAs[Double]("m")
      }
      centroids = next
    }
    assign(centroids)
      .select(col("vec_id"), col("cluster"), col("dist"))
      .orderBy(col("vec_id"))
  }

  /** q156: CLUSTER PROFILE — the health dashboard read after a q155
    * fit (and before trusting its buckets for SemDeDup/mix decisions):
    * per cluster, member count, mean distance-to-centroid (cohesion)
    * and max distance (worst member). A bloated mean or a huge max
    * flags a cluster that needs a re-fit with larger k or an outlier
    * scrub (q122) first. One map-side-combined aggregate over q155's
    * assignment; dist stays in the exact integer domain until the one
    * mean divide, so the report is oracle hash-exact like its input. */
  def q156(embeddings: DataFrame, k: Int = 8, iters: Int = 5): DataFrame =
    q155(embeddings, k, iters)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("dist")).as("td"),
        max(col("dist")).as("max_dist"))
      .select(col("cluster"), col("n_vecs"),
        ((col("td").cast("double") / lit(1.0e8)) /
          col("n_vecs").cast("double")).as("mean_dist"),
        col("max_dist"))
      .orderBy(col("cluster"))

  /** q177: SEMDEDUP (Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication") — the
    * paper's exact recipe: k-means the embedding space ([[q155]]),
    * then search for near-duplicate pairs ONLY within each cluster and
    * keep one representative per duplicate relation. The clustering is
    * what makes semantic dedup tractable at 100 TB: pairwise work is
    * Σ|C_i|² instead of n², and k grows with the corpus so cluster
    * sizes stay bounded — each cluster's pair block is an independent
    * task (the equi-join on `cluster` partitions them). The accepted
    * approximation (per the paper): a near-dup pair SPLIT ACROSS two
    * clusters is missed; q46 (guarded exact) and q96 (LSH) are the
    * recall-complete alternatives at smaller scales.
    *
    * Determinism: assignment is oracle-exact ([[q155]]'s integer
    * argmin); cosines are the strict-fold [[Similarity.dot]] so the
    * `> tau` compares agree bit-for-bit; the kept representative is
    * the MINIMUM earlier vec_id among a vector's above-threshold
    * same-cluster partners (the paper keeps a random/centroid-far one;
    * min-id is the deterministic choice, same rule in the oracle).
    *
    * Plan: q155's rounds (corpus never enters an exchange), one
    * cluster-keyed self-join whose both sides carry (id, vec) — the
    * within-cluster pair stream — then a per-id min aggregate and a
    * left join back to the assignment. A single mega-cluster would
    * skew the self-join; q156's profile is the pre-flight check, and
    * re-fitting with larger k is the paper's own remedy. */
  def q177(embeddings: DataFrame, k: Int = 8, iters: Int = 5,
           tau: Double = 0.4): DataFrame = {
    val members = graft.Pins.pin(
      q155(embeddings, k, iters).select(col("vec_id"), col("cluster"))
        .join(Similarity.normalized(embeddings), "vec_id"))
    val a = members.select(col("cluster"), col("vec_id").as("ida"),
      col("v").as("va"), col("norm").as("na"))
    val b = members.select(col("cluster"), col("vec_id").as("idb"),
      col("v").as("vb"), col("norm").as("nb"))
    val dups = a.join(b, Seq("cluster"))
      .filter(col("ida") < col("idb"))
      .withColumn("cos",
        Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") > tau)
      .groupBy(col("idb").as("vec_id"))
      .agg(min(col("ida")).as("dup_of"))
    members.select(col("vec_id"), col("cluster"))
      .join(dups, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster"),
        when(col("dup_of").isNull, lit("keep")).otherwise(lit("drop"))
          .as("status"),
        col("dup_of"))
      .orderBy(col("vec_id"))
  }

  /** q191: CLUSTER PURITY — external validation of the q155 fit
    * against the embeddings' ground-truth `label` column: per cluster,
    * the majority label, its count, and purity = majority/size. q156
    * answers "is the geometry tight?"; this answers "does the
    * clustering AGREE with the labels we already trust?" — the check
    * run before swapping a k-means bucketing into SemDeDup or an IVF
    * coarse quantizer. All integers (majority ties break on the lower
    * label) → hash-exact. Plan: q155's rounds, then ONE (cluster,
    * label) map-side-combined count — k×labels rows, metadata-sized —
    * and a per-cluster top-1 window over it. */
  def q191(embeddings: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    val joint = graft.Pins.pin(
      q155(embeddings, k, iters).select(col("vec_id"), col("cluster"))
        .join(embeddings.select(col("vec_id"), col("label")), "vec_id")
        .groupBy(col("cluster"), col("label"))
        .agg(count(lit(1)).cast("long").as("ncl")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("ncl").desc, col("label"))
    val maj = joint.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("label").as("majority_label"),
        col("ncl").as("n_majority"))
    joint.groupBy(col("cluster"))
      .agg(sum(col("ncl")).cast("long").as("n_vecs"))
      .join(maj, Seq("cluster"))
      .withColumn("purity_e8", expr("(n_majority * 100000000L) div n_vecs"))
      .select(col("cluster"), col("n_vecs"), col("majority_label"),
        col("n_majority"), col("purity_e8"))
      .orderBy(col("cluster"))
  }

  /** q192: NORMALIZED MUTUAL INFORMATION between the q155 clustering
    * and the ground-truth labels — q191's purity rewards shattering
    * (every singleton cluster is 100% pure); NMI = I(C;L)/((H(C)+H(L))/2)
    * penalizes it, the standard external clustering score. Oracle-exact
    * via the fixed-point entropy idiom (q157/q181): every I and H term
    * is floor-scaled to a 1e-9-nat LONG before summing (order-free),
    * ln is [[graft.functions.PortableLn]] (bit-identical in DuckDB via
    * lnChain), and the final nmi is one fixed IEEE divide over exact
    * longs. Trivial partitions (H(C)+H(L) = 0) report nmi = 0.
    *
    * Plan: q155's rounds, one (cluster, label) count, then every
    * aggregate runs over the k×labels grid — metadata-sized; the long
    * products n·n_cl stay far inside 2^63 for any feasible k×labels
    * grid (the corpus size enters linearly, not quadratically). */
  def q192(embeddings: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    val joint = graft.Pins.pin(
      q155(embeddings, k, iters).select(col("vec_id"), col("cluster"))
        .join(embeddings.select(col("vec_id"), col("label")), "vec_id")
        .groupBy(col("cluster"), col("label"))
        .agg(count(lit(1)).cast("long").as("ncl")))
    val cc = joint.groupBy(col("cluster")).agg(sum(col("ncl")).cast("long").as("nc"))
    val ll = joint.groupBy(col("label")).agg(sum(col("ncl")).cast("long").as("nl"))
    val tot = joint.agg(sum(col("ncl")).cast("long").as("n"))
    def t9(p: org.apache.spark.sql.Column, lnArg: org.apache.spark.sql.Column) =
      floor(p * graft.functions.PortableLn(lnArg) * lit(1.0e9)).cast("long")
    val iE9 = joint.join(cc, "cluster").join(ll, "label")
      .crossJoin(broadcast(tot))
      .select(t9(col("ncl").cast("double") / col("n").cast("double"),
        (col("n") * col("ncl")).cast("double") /
          (col("nc") * col("nl")).cast("double")).as("t"))
      .agg(sum(col("t")).cast("long").as("i_e9"))
    def hE9(cnts: DataFrame, cn: String, out: String) =
      cnts.crossJoin(broadcast(tot))
        .select(t9(col(cn).cast("double") / col("n").cast("double"),
          col(cn).cast("double") / col("n").cast("double")).as("t"))
        .agg((-sum(col("t"))).cast("long").as(out))
    iE9.crossJoin(broadcast(hE9(cc, "nc", "hc_e9")))
      .crossJoin(broadcast(hE9(ll, "nl", "hl_e9")))
      .crossJoin(broadcast(tot))
      .select(col("n").as("n_vecs"), col("i_e9"), col("hc_e9"), col("hl_e9"),
        when(col("hc_e9") + col("hl_e9") === 0L, lit(0.0))
          .otherwise(col("i_e9").cast("double") /
            ((col("hc_e9").cast("double") + col("hl_e9").cast("double")) / 2.0))
          .as("nmi"))
  }
}
