package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial-duplication probe for the LSH family (SURVEY §5): the
  * organic corpus PLUS a planted clique of byte-identical docs —
  * boilerplate-heavy ingest in miniature. Small = sf0.01 + 500-clique;
  * big = sf0.1 + 5000-clique (10× both components). Without the
  * round-8 exact-dup collapse the big side's banding self-join would
  * generate ~12.5M candidate pairs from the clique alone and verify
  * each; with it the clique is one banding row and candidates stay
  * corpus-shaped. The OUTPUT still contains all C(N,2) true pairs
  * (pair-listing semantics), so wall time includes materializing 12.5M
  * result rows on the big side — the probe prints candidates and
  * output rows separately so the two effects can't be conflated.
  *
  * Not part of the driver contract — run manually per round:
  *   sbt "runMain graft.ProbeAdv"
  */
object ProbeAdv {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val boiler = "subscribe to our newsletter for updates terms of " +
      "service privacy policy all rights reserved contact us about cookies"
    def corpus(sfDir: String, cliqueN: Int): DataFrame = {
      val organic = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val clique = spark.range(cliqueN)
        .select((col("id") + 900000000L).as("doc_id"), lit(boiler).as("text"))
      organic.unionAll(clique)
    }
    def time(f: => DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.min

    val small = corpus("/root/testdata/sf0.01", 500)
    val big = corpus("/root/testdata/sf0.1", 5000)
    for ((label, df) <- Seq("small(sf0.01+500clique)" -> small,
                            "big(sf0.1+5000clique)" -> big)) {
      val (reps, _) = operators.Dedup.exactReps(df)
      val cands = operators.Dedup.minhashCandidates(
        operators.Dedup.shingles(reps), operators.Dedup.MinhashJaccardThreshold)
      println(s"[probeadv] $label docs=${df.count()} reps=${reps.count()} " +
        s"rep_candidates=${cands.count()}")
      spark.catalog.clearCache()
      val t42 = time(operators.Dedup.q42(df))
      val n42 = operators.Dedup.q42(df).count()
      spark.catalog.clearCache()
      println(f"[probeadv] $label q42 wall=$t42%.2fs output_pairs=$n42")
      // q41 family (round 8): prefix-join collapse + sparse cluster edges
      val t41 = time(operators.Dedup.q41(df))
      spark.catalog.clearCache()
      val t64 = time(operators.Dedup.q64(df))
      spark.catalog.clearCache()
      val t84 = time(operators.Dedup.q84(df))
      spark.catalog.clearCache()
      println(f"[probeadv] $label q41 wall=$t41%.2fs q64 wall=$t64%.2fs " +
        f"q84 wall=$t84%.2fs")
    }
    spark.stop()
  }
}
