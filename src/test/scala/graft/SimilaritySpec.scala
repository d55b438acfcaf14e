package graft

import graft.operators.Similarity
import graft.Tables
import org.apache.spark.sql.functions.{col, lit}

/** Embedding similarity specs (§2c): planted-neighbor correctness for
  * the brute-force baseline, and recall of the LSH scale path against
  * that baseline on the real sf0.001 embeddings. */
class SimilaritySpec extends GraftSpec {
  import spark.implicits._

  /** vec 0 and 1 are near-parallel, vec 2 orthogonal, vec 3 = vec 0. */
  lazy val planted = {
    val e1 = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val e1b = Array.tabulate(64)(i => if (i == 0) 0.9f else if (i == 1) 0.1f else 0.0f)
    val e2 = Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)
    Seq((0L, e1), (1L, e1b), (2L, e2), (3L, e1.clone()))
      .toDF("vec_id", "embedding")
  }

  test("q44 brute-force: exact duplicate is the top-1 neighbor") {
    val rows = Similarity.q44(planted).collect()
    val top0 = rows.filter(_.getAs[Long]("qid") == 0L).minBy(_.getAs[Int]("rk"))
    assert(top0.getAs[Long]("nid") == 3L)       // the exact clone
    assert(math.abs(top0.getAs[Double]("cos") - 1.0) < 1e-12)
  }

  test("q45 LSH buckets co-locate the duplicate pair") {
    val rows = Similarity.q45(planted).collect()
    val pairs = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
    assert(pairs.contains((0L, 3L)), pairs.toSeq) // identical vectors share every hyperplane side
  }

  test("hnsw graph: exact top-k at high ef, deterministic rebuild, shard merge covers the truth") {
    import graft.operators.HnswGraph
    // 200 deterministic unit vectors in R^16
    val rng = new scala.util.Random(7L)
    val vs = (0 until 200).map { i =>
      val v = Array.fill(16)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n))
    }
    def truth(q: Array[Double], k: Int) = vs
      .map { case (id, v) => (id, v.zip(q).map(p => p._1 * p._2).sum) }
      .sortBy(p => (-p._2, p._1)).take(k).map(_._1)
    val g = new HnswGraph(m = 8, efConstruction = 64)
    vs.foreach { case (id, v) => g.add(id, v) }
    // at ef >= n the beam search degenerates to exhaustive: exact top-k
    val q = vs(57)._2
    assert(g.search(q, 5, 256).map(_._1) == truth(q, 5))
    // deterministic: a rebuild returns identical results at serving ef
    val g2 = new HnswGraph(m = 8, efConstruction = 64)
    vs.foreach { case (id, v) => g2.add(id, v) }
    assert(g.search(q, 5, 48) == g2.search(q, 5, 48))
    // shard-and-merge recall composition: split the corpus in two,
    // union the shard-local top-5 lists, re-rank — the true global
    // top-5 of a query is contained whenever each shard's beam finds
    // its own true top-5 (spec'd at full ef where that is guaranteed)
    val (sa, sb) = vs.partition(_._1 % 2 == 0)
    val ga = new HnswGraph(8, 64); sa.foreach { case (id, v) => ga.add(id, v) }
    val gb = new HnswGraph(8, 64); sb.foreach { case (id, v) => gb.add(id, v) }
    val merged = (ga.search(q, 5, 256) ++ gb.search(q, 5, 256))
      .sortBy(p => (-p._2, p._1)).take(5).map(_._1)
    assert(merged == truth(q, 5))
    // s29 payload round-trip: a deserialized graph is bit-identical
    // (same bytes back) and keeps growing — hash-of-id levels mean
    // load-then-add equals one continuous build with the same
    // insertion sequence, byte for byte (no RNG state in the artifact)
    val bytes = g.toBytes
    val loaded = HnswGraph.fromBytes(bytes)
    assert(java.util.Arrays.equals(loaded.toBytes, bytes))
    assert(loaded.search(q, 5, 48) == g.search(q, 5, 48))
    val extra = (200 until 230).map { i =>
      val v = Array.fill(16)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n))
    }
    extra.foreach { case (id, v) => loaded.add(id, v) }
    val continuous = new HnswGraph(m = 8, efConstruction = 64)
    (vs ++ extra).foreach { case (id, v) => continuous.add(id, v) }
    assert(java.util.Arrays.equals(loaded.toBytes, continuous.toBytes))
  }

  test("q193 recall report: counts reconcile, floors hold for all six serving paths") {
    val emb = Tables.embeddings(spark, SF)
    val out = Similarity.q193(emb).collect()
      .map(r => r.getAs[String]("method") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_truth"),
          r.getAs[Long]("n_hits"), r.getAs[Double]("recall_at_5"))).toMap
    graft.Pins.release()
    assert(out.keySet == Similarity.RecallFloors.keySet, out)
    out.foreach { case (m, (nq, nt, nh, rec)) =>
      assert(nq == 20L, s"$m: $nq queries")
      assert(nt == 100L, s"$m: $nt truth pairs")  // 20 queries x top-5
      assert(nh <= nt && rec == nh.toDouble / nt, s"$m: $nh/$nt vs $rec")
    }
    // the single floor definition the driver gate enforces
    Similarity.RecallFloors.foreach { case (m, f) =>
      assert(out(m)._4 >= f, s"$m: recall ${out(m)._4} < floor $f")
    }
    // panel-twin parity: q193's lsh/ivf hit counts must equal the
    // recall computed from the FULL all-pairs operators filtered to
    // the panel — the restriction is a pushdown, not a semantic change
    val exact = Similarity.q44(emb).select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(df: org.apache.spark.sql.DataFrame): Long = {
      val got = df.filter($"qid" < Similarity.QueryPanel)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toLong
    }
    assert(out("lsh")._3 == hits(Similarity.q45(emb)), out("lsh"))
    assert(out("ivf")._3 == hits(Similarity.q55(emb)), out("ivf"))
    // the standalone ivfpq operator and q193's shared-routing inline
    // must agree the same way
    assert(out("ivfpq")._3 == hits(Similarity.ivfPqSearch(emb)), out("ivfpq"))
    graft.Pins.release()
  }

  test("q45 recall vs q44 baseline on real embeddings is nontrivial") {
    val emb = Tables.embeddings(spark, SF)
    val base = Similarity.q44(emb).select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.q45(emb)
      .filter($"qid" < 20).select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (base & lsh).size.toDouble / base.size
    // multi-probe (Hamming-1) 8×8 LSH measures 0.59 recall@5 on these
    // embeddings — the floor pins the measured behavior with margin
    assert(recall >= 0.5, s"recall@5=$recall (expected >=0.5)")
  }

  test("q55 IVF recall vs q44 baseline beats single-table LSH expectations") {
    val emb = Tables.embeddings(spark, SF)
    val base = Similarity.q44(emb).select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.q55(emb)
      .filter($"qid" < 20).select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (base & ivf).size.toDouble / base.size
    // 5-probe/16-list IVF measures 0.69 recall@5 at sf0.001 (0.8 at
    // sf0.01) — floor with margin
    assert(recall >= 0.6, s"recall@5=$recall (expected >=0.6)")
  }

  test("q45/q55 re-rank is distributed: plan joins candidates back to vectors, no collected-RDD scan") {
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val emb = Tables.embeddings(spark, SF)
    for (df <- Seq(Similarity.q45(emb), Similarity.q55(emb))) {
      // AdaptiveSparkPlanExec is a traversal leaf — unwrap to the plan
      // it adaptively executes so collect() sees the join operators
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      // typed-node traversal (not string matching): the distributed
      // re-rank contributes ≥2 physical joins (candidates⋈q, ⋈n) on top
      // of the candidate-generation join; a driver-collected re-rank
      // would plan as a LocalTableScan with no join above the candidates
      val joins = plan.collect { case j: BaseJoinExec => j }
      assert(joins.size >= 2, s"expected >=2 physical joins, got ${joins.size}:\n$plan")
      val localScans = plan.collect { case l: LocalTableScanExec => l }
      assert(localScans.isEmpty, s"driver-materialized scan in plan:\n$plan")
      // the scoring expression must be the codegen'd native DotProduct
      val hasDot = plan.exists(_.expressions.exists(
        _.exists(_.isInstanceOf[graft.functions.DotProduct])))
      assert(hasDot, "re-rank must score via the codegen'd DotProduct expression")
    }
  }

  test("q45 re-rank scores are bit-identical to locally computed exact cosine") {
    val rows = Similarity.q45(planted).collect()
    val vecs = planted.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding").toArray.map(_.toDouble)
      var ss = 0.0; var i = 0
      while (i < v.length) { ss += v(i) * v(i); i += 1 }
      r.getAs[Long]("vec_id") -> ((v, math.sqrt(ss)))
    }.toMap
    for (r <- rows) {
      val (va, na) = vecs(r.getAs[Long]("qid"))
      val (vb, nb) = vecs(r.getAs[Long]("nid"))
      var d = 0.0; var i = 0
      while (i < va.length) { d += va(i) * vb(i); i += 1 }
      assert(r.getAs[Double]("cos") == d / (na * nb), r.toString)
    }
  }

  test("search: external-query LSH ANN hits recall floor vs exact brute force on held-out queries") {
    val emb = Tables.embeddings(spark, SF)
    val queries = emb.filter($"vec_id" < 20)
    val corpus = emb.filter($"vec_id" >= 20)
    val exact = Similarity.searchExact(queries, corpus, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val approx = Similarity.search(queries, corpus, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // same 8×8 multi-probe signature family as q45 (0.59 measured there);
    // floor pins nontrivial recall with margin
    assert(recall >= 0.5, s"recall@5=$recall (expected >=0.5)")
  }

  test("search: a query identical to a corpus vector retrieves it at rank 1 with cos 1") {
    val probe = Seq((100L, Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.search(probe, planted, 3).collect()
    assert(rows.nonEmpty)
    val top = rows.minBy(_.getAs[Int]("rk"))
    // vec 0 and its clone vec 3 are both exact matches; tie breaks by nid
    assert(top.getAs[Long]("nid") == 0L, rows.toSeq)
    assert(math.abs(top.getAs[Double]("cos") - 1.0) < 1e-12)
  }

  test("q74 int8 quantization: codes in range, reconstruction error bounded, zero-vector safe") {
    val zero = Array.fill(64)(0.0f)
    val ramp = Array.tabulate(64)(i => (i - 32) * 0.1f)
    val rows = Similarity.q74(
      Seq((0L, ramp), (1L, zero)).toDF("vec_id", "embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    val r0 = rows(0L)
    val codes = r0.getAs[scala.collection.Seq[Int]]("qv")
    assert(codes.forall(c => c >= -127 && c <= 127))
    assert(codes.max == 127 || codes.min == -127) // scale saturates the max-|x| element
    // per-element rounding error ≤ scale/2 ⇒ RMSE ≤ scale/2
    assert(r0.getAs[Double]("rmse") <= r0.getAs[Double]("scale") / 2 + 1e-12)
    val r1 = rows(1L)
    assert(r1.getAs[Double]("scale") == 1.0) // guarded, not NaN
    assert(r1.getAs[scala.collection.Seq[Int]]("qv").forall(_ == 0))
    assert(r1.getAs[Double]("rmse") == 0.0)
  }

  test("q46 beyond the broadcast ceiling: blocked kernel runs, bit-identical to broadcast") {
    // 10× the sf table with shifted ids — forces the distributed
    // block-pair kernel (maxRows=2) with many blocks (blockRows=37)
    val base = Tables.embeddings(spark, SF)
    val big = (0 until 10).map { i =>
      base.select((col("vec_id") + lit(i * 100000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionAll _)
    val blocked = Similarity.q46(big, maxRows = 2L, blockRows = 37)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    graft.Pins.release()
    val broadcasted = Similarity.q46(big, maxRows = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    graft.Pins.release()
    assert(blocked.nonEmpty)
    assert(blocked.toSeq == broadcasted.toSeq) // same pairs, bit-equal cos
  }

  test("q46 finds planted near-dup pairs above threshold") {
    val pairs = Similarity.q46(planted).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((0L, 3L)), pairs.toSeq)
    assert(pairs.contains((0L, 1L)), pairs.toSeq) // cos(e1, e1b) ≈ 0.994
    assert(!pairs.contains((0L, 2L)), pairs.toSeq) // orthogonal
  }

  test("q92 centroids: exact per-label means, layout-invariant fold") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f), 0),
      (1L, Array(3.0f, 4.0f, 5.0f, 6.0f), 0),
      (2L, Array(10.0f, 0.0f, 0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.q92(vecs).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(rows(0).getAs[Long]("n_vecs") == 2L)
    assert(rows(0).getAs[Double]("mean_0") == 2.0)
    assert(rows(0).getAs[Double]("mean_3") == 5.0)
    assert(rows(1).getAs[Double]("mean_0") == 10.0)
    // sorted-fold result must not depend on the physical layout
    val re = Similarity.q92(vecs.repartition(7)).collect().map(_.toSeq).toSet
    assert(re == Similarity.q92(vecs).collect().map(_.toSeq).toSet)
  }

  test("q96 embed clusters: near-parallel vectors collapse to one component") {
    val rows = Similarity.q96(planted).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("label")).toMap
    // 0, 1 (near-parallel) and 3 (exact clone of 0) share a component
    assert(rows == Map(0L -> 0L, 1L -> 0L, 3L -> 0L)) // 2 is orthogonal: absent
  }

  test("q92 centroids: fixed-point means agree with driver-side double sums") {
    val emb = Tables.embeddings(spark, SF)
    // reference: exact double sums computed on the driver
    val ref = emb.select(col("label"), col("embedding")).collect()
      .map(r => r.getAs[Int]("label") ->
        r.getSeq[Float](1).take(4).map(_.toDouble))
      .groupBy(_._1)
      .map { case (l, xs) =>
        l -> (xs.length.toLong,
          (0 until 4).map(i => xs.map(_._2(i)).sum / xs.length))
      }
    val got = Similarity.q92(emb).collect().map { r =>
      r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vecs"),
          (0 until 4).map(i => r.getAs[Double](s"mean_$i")))
    }.toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (label, (n, means)) =>
      val (ne, me) = ref(label)
      assert(n == ne)
      means.zip(me).foreach { case (a, e) =>
        // floor granularity 1e-8 per term; mean error ≤ 1e-8 + fp noise
        assert(math.abs(a - e) < 1e-7, s"label=$label fixed=$a ref=$e")
      }
    }
  }

  test("q97 gram matrix: exact upper-triangle values on a tiny corpus") {
    val e = Seq((1L, Array(1f, 2f), 0), (2L, Array(3f, 4f), 0))
      .toDF("vec_id", "embedding", "label")
    // G = [[1+9, 2+12], [., 4+16]] upper triangle — integer products,
    // so the 1e-6 fixed-point grid represents them exactly
    val r = Similarity.q97(e).collect()
      .map(x => (x.getAs[Long]("i"), x.getAs[Long]("j")) -> x.getAs[Double]("gram"))
    assert(r.toSeq == Seq((0L, 0L) -> 10.0, (0L, 1L) -> 14.0, (1L, 1L) -> 20.0))
  }

  test("q97 fixed-point cells agree with driver-side double sums") {
    val emb = Tables.embeddings(spark, SF)
    val vecs = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    val got = Similarity.q97(emb).collect()
      .map(r =>
        (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r.getAs[Double]("gram")).toMap
    assert(got.size == 64 * 65 / 2)        // full upper triangle, d from data
    // floor granularity 1e-6 per term → cell error bounded by n·1e-6
    val tol = n * 1e-6 + 1e-9
    got.foreach { case ((i, j), g) =>
      val ref = vecs.map(v => v(i.toInt) * v(j.toInt)).sum
      assert(math.abs(g - ref) <= tol, s"cell=($i,$j) fixed=$g ref=$ref")
    }
  }

  test("q108 int8-quantized ANN: high recall@5 against the exact baseline") {
    val emb = Tables.embeddings(spark, SF)
    val exact = Similarity.q44(emb).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val quant = Similarity.q108(emb).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    assert(quant.size == exact.size)       // top-5 per query both ways
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("searchInt8: external query batch against a held-out corpus tracks searchExact") {
    val emb = Tables.embeddings(spark, SF)
    val queries = emb.filter($"vec_id" < 20).select("vec_id", "embedding")
    val corpus = emb.filter($"vec_id" >= 20).select("vec_id", "embedding")
    val exact = Similarity.searchExact(queries, corpus, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.searchInt8(queries, corpus, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(quant.size == exact.size)
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
    // no leave-one-out on an external batch: a query identical to a
    // corpus vector (same id namespace collision) is a legitimate hit
    val probe = corpus.limit(1)
    val hit = Similarity.searchInt8(probe, corpus, 1).collect()
    assert(hit.length == 1)
    assert(hit.head.getAs[Long]("qid") == hit.head.getAs[Long]("nid"))
  }

  test("knnLabel: external query batch votes from the corpus, true_label rides along") {
    import spark.implicits._
    val corpus = Seq(
      (100L, Array(1f, 0.01f), 1), (101L, Array(1f, -0.01f), 1),
      (102L, Array(0.9f, 0.1f), 2), (103L, Array(0.9f, -0.1f), 2),
      (104L, Array(0.7f, 0.3f), 3)
    ).toDF("vec_id", "embedding", "label")
    // external batch reuses id 100 — without excludeSelf the corpus
    // vector with the same id still votes (independent namespaces)
    val queries = Seq((100L, Array(1f, 0f), 7)).toDF("vec_id", "embedding", "label")
    val r = Similarity.knnLabel(queries, corpus, k = 5).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Int]("true_label") == 7)
    assert(r.head.getAs[Int]("pred_label") == 1)  // labels {1,1,2,2,3} → 2-2 tie → 1
    assert(r.head.getAs[Long]("votes") == 2L)
  }

  test("q103 kNN label vote: majority wins, vote ties break on the smaller label") {
    import spark.implicits._
    // query 0 + five neighbors: labels {1,1,2,2,3} → 2-2 vote tie → label 1
    val e = Seq(
      (0L, Array(1f, 0f), 9),
      (100L, Array(1f, 0.01f), 1), (101L, Array(1f, -0.01f), 1),
      (102L, Array(0.9f, 0.1f), 2), (103L, Array(0.9f, -0.1f), 2),
      (104L, Array(0.7f, 0.3f), 3)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.q103(e).collect()
    assert(r.length == 1)                 // only vec_id < 50 is a query
    assert(r.head.getAs[Long]("qid") == 0L)
    assert(r.head.getAs[Int]("true_label") == 9)
    assert(r.head.getAs[Int]("pred_label") == 1)
    assert(r.head.getAs[Long]("votes") == 2L)
  }

  test("q122 embed outliers: planted far vector flagged, degenerate label safe") {
    import spark.implicits._
    // label 0: 10 near-origin inliers + one planted far vector
    val inliers = (1L to 10L).map { i =>
      (i, Array(0.01f * i, 0f, 0f, 0f), 0)
    }
    val far = Seq((99L, Array(10f, 10f, 10f, 10f), 0))
    // label 1: all identical → zero variance → z NULL, not outlier
    val degen = (200L to 203L).map(i => (i, Array(1f, 1f, 1f, 1f), 1))
    val e = (inliers ++ far ++ degen).toDF("vec_id", "embedding", "label")
    val r = Similarity.q122(e).collect()
      .map(x => x.getAs[Long]("vec_id") ->
        (Option(x.getAs[java.lang.Double]("z")),
          x.getAs[Boolean]("is_outlier"))).toMap
    assert(r.size == 15)
    assert(r(99L)._2, "planted far vector must be flagged")
    assert(inliers.map(_._1).forall(i => !r(i)._2))
    // degenerate label: z undefined, never flagged
    (200L to 203L).foreach { i =>
      assert(r(i)._1.isEmpty && !r(i)._2)
    }
    // z of the planted point is the extreme one
    val zs = r.collect { case (_, (Some(z), _)) => z }
    assert(math.abs(r(99L)._1.get - zs.max) < 1e-12)
  }

  test("q134 PCA: orthonormal components, descending variance, axis recovery") {
    // anisotropic planted set: variance 'a' along dim 3, 'b' along dim
    // 7, noise-free elsewhere → components must recover dims 3 then 7
    val rng = new scala.util.Random(7)
    val rows = (0L until 200L).map { i =>
      val e = new Array[Float](64)
      e(3) = (rng.nextGaussian() * 10.0).toFloat
      e(7) = (rng.nextGaussian() * 3.0).toFloat
      (i, e)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val (comps, evals, _) = Similarity.pcaFit(emb, 4)
    // eigenvalues descending, non-negative (within eigensolver eps)
    evals.sliding(2).foreach(p => assert(p(0) >= p(1) - 1e-9))
    assert(evals.forall(_ > -1e-9))
    // top-2 components align with the planted axes (sign-fixed)
    assert(math.abs(comps(0)(3)) > 0.999 && comps(0)(3) > 0)
    assert(math.abs(comps(1)(7)) > 0.999 && comps(1)(7) > 0)
    // orthonormality
    for (i <- comps.indices; j <- comps.indices) {
      val dot = comps(i).zip(comps(j)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("q134 full-rank projection is an isometry (pairwise distances kept)") {
    val emb = Tables.embeddings(spark, SF).limit(30)
    import org.apache.spark.sql.functions.{col, lit}
    val orig = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    val proj = Similarity.q134(emb, k = 64).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Double]]("proj").toArray)
      .toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(10)
    for (a <- ids; b <- ids if a < b) {
      val od = d2(orig(a).map(_.toDouble), orig(b).map(_.toDouble))
      val pd = d2(proj(a), proj(b))
      // rotation + translation preserves distances (centering cancels)
      assert(math.abs(od - pd) < 1e-6 * math.max(1.0, od))
    }
    // k < D output really is k-dimensional
    assert(Similarity.q134(emb, k = 8).head()
      .getAs[scala.collection.Seq[Double]]("proj").length == 8)
  }

  test("q138 PQ ANN: recall@5 against the exact baseline through 4-bit codes") {
    val emb = Tables.embeddings(spark, SF)
    val exact = Similarity.q44(emb).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val pq = Similarity.q138(emb).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    assert(pq.size == exact.size)          // top-5 per query both ways
    val recall = (exact intersect pq).size.toDouble / exact.size
    // M=16 subspaces × K=16 centroids + 50-candidate exact re-rank
    // measures 0.90 recall@5 at sf0.001; floor pins high recall with
    // margin (the ADC table only generates CANDIDATES — the final
    // ranking is exact float, so misses need the true neighbor outside
    // the top-50 approximate scores)
    assert(recall >= 0.8, s"recall@5=$recall (expected >=0.8)")
  }

  test("pqFit/pqEncode: codebook shape, code range, encode determinism") {
    val emb = Tables.embeddings(spark, SF)
    val cb = Similarity.pqFit(emb)
    assert(cb.length == Similarity.PqM)
    assert(cb.forall(_.length == Similarity.PqK))
    assert(cb.forall(_.forall(_.length == Similarity.Dim / Similarity.PqM)))
    def codesOf(): Map[Long, Seq[Int]] =
      Similarity.pqEncode(emb, cb).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          r.getAs[scala.collection.Seq[Int]]("codes").toSeq).toMap
    val c1 = codesOf()
    assert(c1.values.forall(_.length == Similarity.PqM))
    assert(c1.values.forall(_.forall(c => c >= 0 && c < Similarity.PqK)))
    // same corpus, same codebook ⇒ identical codes on any run (the
    // reproduce-anywhere discipline every dedup hash follows)
    assert(codesOf() == c1)
    // a second independent FIT is also identical (fixed seeds)
    val cb2 = Similarity.pqFit(emb)
    assert(cb.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq)
  }

  test("searchPq: external query batch against a held-out corpus; self-hit allowed") {
    val emb = Tables.embeddings(spark, SF)
    val queries = emb.filter($"vec_id" < 20).select("vec_id", "embedding")
    val corpus = emb.filter($"vec_id" >= 20).select("vec_id", "embedding")
    val exact = Similarity.searchExact(queries, corpus, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.searchPq(queries, corpus, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.size == exact.size)
    val recall = (exact intersect pq).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@5=$recall (expected >=0.8)")
    // no leave-one-out on an external batch: a corpus vector used as
    // its own query is a legitimate (cos=1) top hit
    val probe = corpus.limit(1)
    val hit = Similarity.searchPq(probe, corpus, 1).collect()
    assert(hit.length == 1)
    assert(hit.head.getAs[Long]("qid") == hit.head.getAs[Long]("nid"))
  }

  test("q161 hybrid RRF: hand-computed fusion of text and vector ranks") {
    // query 1: text terms ("apple"), anchor embedding = vec_id 1.
    // BM25 ranks: doc 11 ("apple apple", tf 2) > doc 10 ("apple pie").
    // Cosine vs [1,0,0,0]: 1 (self) ties 10 at cos=1 (nid breaks), then
    // 12 (0.9-ish), then 11 (orthogonal). RRF with C=60, depth 50:
    //   doc 10: 1/62 + 1/62          = 0.032258…  (both lists)
    //   doc 11: 1/61 + 1/64          = 0.032018…
    //   doc  1: 0    + 1/61          (anchor itself, no text hit)
    //   doc 12: 0    + 1/63
    val docs = Seq(
      (10L, "apple pie"), (11L, "apple apple"), (12L, "banana split")
    ).toDF("doc_id", "text")
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val emb = Seq(
      (1L, v(1, 0, 0, 0)), (10L, v(1, 0, 0, 0)),
      (11L, v(0, 1, 0, 0)), (12L, v(0.9, 0.1, 0, 0))
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, Seq("apple"))).toDF("query_id", "terms")
    val out = graft.operators.Similarity
      .q161(docs, emb, queries, depth = 50, k = 10)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 11L, 1L, 12L))
    val r10 = out.find(_.getAs[Long]("doc_id") == 10L).get
    assert(r10.getAs[Long]("r_text") == 2L && r10.getAs[Long]("r_vec") == 2L)
    assert(r10.getAs[Double]("rrf") == 1.0 / 62 + 1.0 / 62)
    val r1 = out.find(_.getAs[Long]("doc_id") == 1L).get
    assert(r1.isNullAt(r1.fieldIndex("r_text")) &&
      r1.getAs[Long]("r_vec") == 1L)
    assert(r1.getAs[Double]("rrf") == 1.0 / 61)
  }

  test("q169 semantic decontam: clone of a benchmark vector flagged, orthogonal clean") {
    def v(x: Double, y: Double) =
      Array.tabulate(64)(i => if (i == 0) x.toFloat else if (i == 1) y.toFloat else 0.0f)
    val bench = Seq((1L, v(1, 0)), (2L, v(0, 1))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, v(1, 0)),      // exact clone of bench 1 -> contaminated
      (11L, v(0.6, 0.8)),  // cos 0.6/0.8 to bench -> clean at tau 0.95
      (12L, v(0, 1))       // clone of bench 2 -> contaminated
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.q169(corpus, bench, tau = 0.95)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("nearest_bench"), r.getAs[String]("status"))).toMap
    assert(out(10L) == ((1L, "contaminated")), out)
    assert(out(11L)._2 == "clean", out)
    assert(out(12L) == ((2L, "contaminated")), out)
  }

  test("q164 MMR: diversified pick escapes the redundant cluster") {
    // query [1,0,...]; docs 10-12 a tight highly-relevant cluster
    // tilted OFF the query axis (so their mutual sim ~1 exceeds their
    // relevance ~0.9), doc 20 less relevant (0.6) but nearly
    // orthogonal to the cluster (sim ~0.19). Plain top-3 = the three
    // clones; MMR round 2 scores 0.7*0.6-0.3*0.19=0.36 for doc 20 vs
    // 0.7*0.9-0.3*1.0=0.33 for a second clone -> 20 must be picked.
    def v(x: Double, y: Double) =
      Array.tabulate(64)(i => if (i == 0) x.toFloat else if (i == 1) y.toFloat else 0.0f)
    val corpus = Seq(
      (10L, v(0.9, 0.44)), (11L, v(0.9, 0.45)), (12L, v(0.9, 0.43)),
      (20L, v(0.6, -0.8))
    ).toDF("vec_id", "embedding")
    val q = Seq((1L, v(1.0, 0.0))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.q164(q, corpus, pool = 4, k = 3)
      .collect()
    val picked = out.map(_.getAs[Long]("doc_id")).toSet
    assert(picked.contains(20L), s"picked=$picked")
    // rank 1 is still the most relevant doc (a cluster member)
    assert(out.head.getAs[Long]("sel_rank") == 1L &&
      Set(10L, 11L, 12L).contains(out.head.getAs[Long]("doc_id")))
    // pool guard refuses un-collectable pools
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.q164(q, corpus, pool = 5000)
    }
  }
}
