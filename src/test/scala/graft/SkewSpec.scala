package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends GraftSpec {
  import spark.implicits._

  test("saltedJoin is row-identical to a plain join on a skewed key") {
    // 90% of the big side lands on key 1
    val big = spark.range(10000)
      .select((when(col("id") % 10 === 0, col("id") % 5).otherwise(1)).as("k"),
        col("id").as("payload"))
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("k", "name")
    val plain  = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    val a = plain.orderBy("k", "payload").collect().toSeq
    val b = salted.orderBy("k", "payload").collect().toSeq
    assert(a == b)
  }

  test("saltedJoin scatters the hot key across salt buckets") {
    val big = spark.range(8000).select(lit(1L).as("k"), col("id").as("payload"))
    val salted = big.withColumn(Skew.SaltCol,
      pmod(xxhash64(col("k"), spark_partition_id(), monotonically_increasing_id()), lit(8)))
    val buckets = salted.groupBy(Skew.SaltCol).count().collect().map(_.getLong(1))
    assert(buckets.length == 8)                 // all 8 buckets used
    assert(buckets.max < 8000)                  // no bucket holds everything
  }

  test("saltedJoin preserves left-outer semantics for unmatched keys") {
    val big = Seq((1L, "x"), (99L, "orphan")).toDF("k", "payload")
    val small = Seq((1L, "b")).toDF("k", "name")
    val out = Skew.saltedJoin(big, small, "k", salt = 4, joinType = "left_outer")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("name")))
    assert(out.toSet == Set((1L, "b"), (99L, null)))
  }
}
