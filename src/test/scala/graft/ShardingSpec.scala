package graft

/** q171 consistent-hash rebalance: the structural guarantees of ring
  * placement vs modulo, on a 1000-key universe. */
class ShardingSpec extends GraftSpec {
  import spark.implicits._

  test("q171: ring moves less than modulo, and only onto the new shards") {
    val docs = (0L until 1000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val out = graft.operators.Sharding.q171(docs, n = 16, m = 20, vnodes = 8)
      .collect().map(r => r.getAs[String]("strategy") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_moved"),
          r.getAs[Long]("moved_to_new"), r.getAs[Double]("moved_frac"))).toMap
    val (mn, mm, mnew, mf) = out("mod")
    val (rn, rm, rnew, rf) = out("ring")
    assert(mn == 1000L && rn == 1000L)
    // modulo reshuffles most keys (16->20: everything whose h%80 puts
    // it elsewhere); the ring moves far fewer
    assert(rf < mf, s"ring=$rf mod=$mf")
    // THE consistent-hashing guarantee: every ring move lands on a
    // brand-new shard (a key only moves when a new vnode cuts in)
    assert(rnew == rm, s"ring moved=$rm to_new=$rnew")
    assert(mnew < mm) // modulo scatters moves over old shards too
    // ring moved fraction is in the (M-N)/M ballpark (loose bounds:
    // 8 vnodes/shard is a coarse ring)
    assert(rf > 0.05 && rf < 0.5, s"ring=$rf")
  }
}
