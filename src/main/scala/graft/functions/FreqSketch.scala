package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra-Gries state: counter map + total decrement mass. */
private[graft] class MgBuffer(val counts: mutable.HashMap[String, Long],
                              var dec: Long) {
  def this() = this(mutable.HashMap.empty, 0L)
}

/** The sequential Misra-Gries update step, shared by the batch
  * aggregate ([[FreqSketch]]) and the streaming monitor (st23) so both
  * surfaces maintain the IDENTICAL sketch for the same token sequence. */
private[graft] object MisraGries {
  /** Fold one token into the counter map; returns the decrement mass
    * this step added (0, or 1 when the full map forced the classic
    * decrement-all round). */
  def updateOne(counts: mutable.HashMap[String, Long], capacity: Int,
                tok: String): Long =
    counts.get(tok) match {
      case Some(c) => counts.update(tok, c + 1); 0L
      case None if counts.size < capacity => counts.update(tok, 1L); 0L
      case None =>
        // classic MG decrement step: every counter pays 1, zeros drop;
        // amortized O(1) — each decrement consumes a prior increment
        val dead = mutable.ArrayBuffer[String]()
        counts.keysIterator.foreach { k =>
          val nc = counts(k) - 1
          if (nc == 0) dead += k else counts.update(k, nc)
        }
        dead.foreach(counts.remove)
        1L
    }
}

/** fn06: native MISRA-GRIES frequent-items sketch (heavy hitters) as a
  * Catalyst `TypedImperativeAggregate` — the missing member of the
  * sketch family (HLL cardinality = q24, quantiles = q62, Bloom
  * membership = q126, frequent items = this). The exact top-k
  * (q75 vocab) needs a full token→count aggregation — a shuffle the
  * size of the VOCABULARY; this sketch keeps at most `capacity`
  * counters per partial, so the exchange carries capacity-sized
  * sketches no matter how many tokens stream through: the form that
  * answers "which tokens dominate this 100 TB corpus" in one pass
  * with bounded memory.
  *
  * Semantics (Misra-Gries '82): counters are LOWER bounds; after
  * seeing n items, any item with true count > n/(capacity+1) is
  * guaranteed present, and for every reported item
  * `est ≤ true ≤ est + err` where `err` is the sketch's accumulated
  * decrement mass (a data-dependent bound, always ≤ n/(capacity+1)).
  * MERGE follows Agarwal et al. "Mergeable Summaries" (PODS'12): add
  * counters pointwise, then subtract the (capacity+1)-th largest
  * counter and drop non-positive ones — the error bounds ADD, so
  * map-side partials compose into a valid global sketch regardless of
  * partitioning or merge order.
  *
  * Output: array<struct<token, est, err>> sorted by est desc, token
  * asc; `err` repeats the sketch-level decrement mass on every row so
  * a consumer can bound each estimate without a side channel. */
case class FreqSketch(child: Expression, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] with ExpectsInputTypes {

  require(capacity > 0, "FreqSketch capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  // analysis-time contract: a non-string column registered through the
  // SQL surface fails with a clear type error, not a runtime
  // ClassCastException in update()'s UTF8String cast
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_sketch"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))))

  override def createAggregationBuffer(): MgBuffer = new MgBuffer()

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null)
      buf.dec += MisraGries.updateOne(buf.counts, capacity,
        v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    other.counts.foreach { case (k, c) =>
      buf.counts.update(k, buf.counts.getOrElse(k, 0L) + c)
    }
    buf.dec += other.dec
    if (buf.counts.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything
      val m = buf.counts.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      buf.dec += m
      val dead = mutable.ArrayBuffer[String]()
      buf.counts.keysIterator.foreach { k =>
        val nc = buf.counts(k) - m
        if (nc <= 0) dead += k else buf.counts.update(k, nc)
      }
      dead.foreach(buf.counts.remove)
    }
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val rows = buf.counts.toArray
      .sortBy { case (tok, est) => (-est, tok) }
      .map { case (tok, est) =>
        InternalRow(UTF8String.fromString(tok), est, buf.dec)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.dec)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val dec = in.readLong()
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    new MgBuffer(m, dec)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren.head)
}

object FreqSketch {
  /** Column-level entry point (registry-free, the DotProduct pattern):
    * aggregates a string column into the heavy-hitters struct array. */
  def apply(tok: Column, capacity: Int): Column =
    ColumnBridge.column(
      FreqSketch(ColumnBridge.expression(tok), capacity)
        .toAggregateExpression())
}
