package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

/** q155: fixed-round distributed k-means — planted-cluster recovery,
  * layout invariance (integer-domain argmin: no float assignment
  * lottery), and the empty-cluster carry rule. */
class KMeansSpec extends GraftSpec {
  import spark.implicits._

  /** 3 well-separated planted blobs of 20 vectors each, deterministic
    * offsets (no RNG — reproducibility is the point). Blobs INTERLEAVE
    * across vec_ids (id = j·3 + blob) so the deterministic seed — the
    * k smallest ids — starts one centroid per blob; seeding all k
    * inside one blob is the classic Lloyd's local minimum and not what
    * this test is about. */
  private lazy val planted = {
    val rows = for {
      c <- 0 until 3
      j <- 0 until 20
    } yield {
      val base = Array.tabulate(64)(i => if (i == c * 2) 10.0f else 0.0f)
      base(63) = (j % 5) * 0.01f // small within-cluster jitter
      ((j * 3 + c).toLong, base)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("planted blobs: each blob lands in ONE cluster, blobs in different clusters") {
    val out = KMeans.q155(planted, k = 3, iters = 5).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    val byBlob = (0 until 3).map(c =>
      (0 until 20).map(j => out((j * 3 + c).toLong)).distinct)
    byBlob.foreach(cs => assert(cs.length == 1, s"blob split: $byBlob"))
    assert(byBlob.map(_.head).distinct.length == 3, s"blobs merged: $byBlob")
  }

  test("assignments are layout-invariant (integer argmin, no float lottery)") {
    val a = KMeans.q155(planted, k = 3, iters = 5).collect().map(_.toSeq).toSet
    val b = KMeans.q155(planted.repartition(11), k = 3, iters = 5)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("k larger than the natural cluster count: empty clusters keep their seed") {
    // 2 tight blobs, k=4: at least one centroid ends empty; the run
    // must not throw and every vector still gets a nearest centroid
    val out = KMeans.q155(planted.filter(pmod(col("vec_id"), lit(3)) < 2),
      k = 4, iters = 5).collect()
    assert(out.length == 40)
    assert(out.map(_.getAs[Int]("cluster")).distinct.length >= 2)
  }

  test("q191 purity: aligned labels read 100%, independent labels read 50%") {
    // labels == blob id: every cluster is pure
    val aligned = planted.withColumn("label",
      (col("vec_id") % 3).cast("int"))
    val pa = KMeans.q191(aligned, k = 3, iters = 5).collect()
    assert(pa.length == 3, pa.toSeq)
    pa.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == 20L, r)
      assert(r.getAs[Long]("purity_e8") == 100000000L, r)
      assert(r.getAs[Long]("n_majority") == 20L, r)
    }
    // labels independent of blob (j parity): 10/10 split per cluster,
    // majority ties break on the lower label
    val mixed = planted.withColumn("label",
      ((col("vec_id") / 3) % 2).cast("int"))
    val pm = KMeans.q191(mixed, k = 3, iters = 5).collect()
    pm.foreach { r =>
      assert(r.getAs[Long]("purity_e8") == 50000000L, r)
      assert(r.getAs[Int]("majority_label") == 0, r)
    }
  }

  test("q192 NMI: aligned labels ~1, exactly-independent labels exactly 0") {
    val aligned = planted.withColumn("label",
      (col("vec_id") % 3).cast("int"))
    val ra = KMeans.q192(aligned, k = 3, iters = 5).collect()(0)
    assert(ra.getAs[Long]("n_vecs") == 60L, ra)
    assert(ra.getAs[Double]("nmi") > 0.99, ra)
    // H(C) == H(L) == I for a perfect match (same floor-scaled longs)
    assert(ra.getAs[Long]("hc_e9") == ra.getAs[Long]("hl_e9"), ra)
    // 10/10 per (cluster, label) cell -> every I term is ln(1) = 0
    val mixed = planted.withColumn("label",
      ((col("vec_id") / 3) % 2).cast("int"))
    val rm = KMeans.q192(mixed, k = 3, iters = 5).collect()(0)
    assert(rm.getAs[Long]("i_e9") == 0L, rm)
    assert(rm.getAs[Double]("nmi") == 0.0, rm)
  }

  test("q156 profile re-derives from the q155 assignment") {
    val emb = Tables.embeddings(spark, SF)
    val asg = KMeans.q155(emb).collect()
    val prof = KMeans.q156(emb).collect()
      .map(r => r.getAs[Int]("cluster") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_dist"),
          r.getAs[Long]("max_dist"))).toMap
    asg.groupBy(_.getAs[Int]("cluster")).foreach { case (c, rows) =>
      val ds = rows.map(_.getAs[Long]("dist"))
      val (n, mean, mx) = prof(c)
      assert(n == rows.length)
      assert(mx == ds.max)
      assert(mean == (ds.sum.toDouble / 1.0e8) / ds.length)
    }
  }

  test("real embeddings: full assignment, non-trivial clustering, deterministic") {
    val emb = Tables.embeddings(spark, SF)
    val out = KMeans.q155(emb).collect()
    assert(out.length == emb.count())
    val sizes = out.groupBy(_.getAs[Int]("cluster")).map(_._2.length)
    assert(sizes.size > 1, s"degenerate single cluster: $sizes")
    assert(out.forall(_.getAs[Long]("dist") >= 0L))
  }

  test("q177 SemDeDup: within-blob near-dups drop to the blob min, blobs never cross") {
    // the planted blobs are near-parallel within a blob (cos ≈ 1) and
    // orthogonal across blobs (cos ≈ 0): SemDeDup must keep exactly
    // the min id of each blob and never bill a drop across blobs
    val out = KMeans.q177(planted, k = 3, iters = 5, tau = 0.4).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("status"), Option(r.getAs[java.lang.Long]("dup_of")))).toMap
    assert(out.size == 60)
    val keeps = out.filter(_._2._1 == "keep").keys.toSet
    assert(keeps == Set(0L, 1L, 2L), s"keeps: $keeps") // blob minima (id = j*3 + blob)
    out.foreach { case (id, (status, dupOf)) =>
      if (status == "drop") {
        assert(dupOf.contains(id % 3), s"$id billed across blobs: $dupOf")
      } else assert(dupOf.isEmpty)
    }
    // layout invariance: same verdicts from a different partitioning
    val re = KMeans.q177(planted.repartition(11), k = 3, iters = 5, tau = 0.4)
      .collect().map(_.toSeq).toSet
    assert(re == KMeans.q177(planted, k = 3, iters = 5, tau = 0.4)
      .collect().map(_.toSeq).toSet)
  }
}
