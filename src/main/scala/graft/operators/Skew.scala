package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §5). AQE's skew-join splitting handles
  * most cases at runtime; explicit salting remains the tool when one
  * join key dominates so heavily that even split shuffle blocks land on
  * one executor (e.g. the null/default key of a 100 TB fact table).
  */
object Skew {

  val SaltCol = "__graft_salt"

  /** Salted equi-join: the big (skewed) side scatters each row into one
    * of `salt` buckets; the small side replicates `salt`× so every
    * bucket can match. Shuffle parallelism on a hot key becomes `salt`
    * tasks instead of one. Result is row-identical to `big.join(small,
    * key)`; small-side cost is salt× replication — keep `salt` ≤ ~32 and
    * the small side dimension-sized. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val bigS = big.withColumn(SaltCol,
      pmod(xxhash64(col(key), spark_partition_id(), monotonically_increasing_id()), lit(salt)))
    val smallS = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(salt - 1L))))
    bigS.join(smallS, Seq(key, SaltCol), joinType).drop(SaltCol)
  }
}
