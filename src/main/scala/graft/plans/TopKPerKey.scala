package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native per-key top-k operator (SURVEY.md §4, custom-operator path c).
  *
  * `Window(row_number) + filter(rn <= k)` fully SORTS every key
  * partition — O(n log n) per partition and the whole input shuffles.
  * This operator keeps a bounded k-row heap per key and runs in two
  * phases like an aggregation: a partial pass caps every partition's
  * output at k rows per key BEFORE the shuffle (shuffle volume ∝
  * k·keys·partitions, not n), and the final pass merges heaps after an
  * exchange on the key. At 100 TB with k=3 this is the difference
  * between shuffling the fact table and shuffling a few rows per key.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val keysLocal = keys
    val outputLocal = child.output
    child.execute().mapPartitions { it =>
      val ord = new LazilyGeneratedOrdering(orderLocal, outputLocal)
      val keyProj = UnsafeProjection.create(keysLocal, outputLocal)
      // Scala PriorityQueue is a MAX-heap: under `ord` (best sorts
      // first/least) the head is the WORST kept row — the eviction
      // candidate.
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            h += row.copy()
            heaps.put(key.copy(), h)
          case Some(h) =>
            if (h.size < kLocal) h += row.copy()
            else if (ord.compare(row, h.head) < 0) { h.dequeue(); h += row.copy() }
        }
      }
      // emit each key's rows best-first (the final phase preserves this
      // per-key order; global order is the consumer's concern)
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange via distribution) → final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
