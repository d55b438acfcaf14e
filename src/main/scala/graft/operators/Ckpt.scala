package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cut seam for ITERATIVE operators (r15 verdict #4, r16
  * generalization). Every fixpoint loop in the engine (near-dup CC,
  * PageRank/HITS/k-hop/label propagation, the q181 reweight walk)
  * must cut lineage per round or round N replays rounds 1..N−1;
  * `localCheckpoint` is the right default at local[32] and the wrong
  * call on a 1000-executor cluster, where blocks live on executors
  * only and ANY executor loss mid-fixpoint fails the job
  * unrecoverably. With `spark.graft.reliableCheckpoint=true` AND an
  * `sc.setCheckpointDir(...)` target, every loop lands its rounds in
  * the reliable store (HDFS/object store) instead — one config, zero
  * operator changes, bit-identical results (spec'd). */
object Ckpt {
  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf
      .getOption("spark.graft.reliableCheckpoint").contains("true") &&
      spark.sparkContext.getCheckpointDir.isDefined
    if (reliable) {
      // persist-before-checkpoint: a bare Dataset.checkpoint computes
      // the plan once for the action and AGAIN for the checkpoint
      // write job — the standard Spark pitfall that would double every
      // fixpoint round's compute on exactly the clusters the seam
      // exists for. The checkpoint job reads the persisted blocks
      // instead; always eager here so the persist can be released
      // immediately (a lazy reliable cut would have to leak it).
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = df.checkpoint(true)
      df.unpersist(false)
      out
    } else df.localCheckpoint(eager)
  }
}
