package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a grouped aggregate — the
  * GROUP-BY form of the sketch that `ops/Sketches.qHeavyHitters` runs per
  * partition with mapPartitions. As a TypedImperativeAggregate the k
  * counters ride Spark's normal partial/final aggregation (and streaming
  * state), so "frequent tokens per language/domain" needs no per-key
  * token shuffle: each map task maintains one bounded summary per group,
  * and summaries MERGE (Agarwal et al., "Mergeable Summaries", PODS'12:
  * pairwise-add counters, then subtract the (k+1)-th largest and drop
  * non-positives — error stays ≤ N/(k+1)).
  *
  * eval returns the candidate items (sorted array<string>) — a superset
  * of every item with true count > N/(k+1); callers verify with an exact
  * recount, keeping final answers exact (same two-phase recipe as the
  * global operator).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def offer(buf: mutable.HashMap[String, Long], item: String,
      weight: Long): Unit = {
    if (buf.contains(item)) buf(item) += weight
    else if (buf.size < k) buf(item) = weight
    else {
      // classic MG step: decrement every counter, drop zeros
      buf.mapValuesInPlace((_, v) => v - weight)
      buf.filterInPlace((_, v) => v > 0L)
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (item, w) => a(item) = a.getOrElse(item, 0L) + w }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter from everything
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      a.mapValuesInPlace((_, v) => v - cut)
      a.filterInPlace((_, v) => v > 0L)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, v) =>
      val bytes = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "graft_misra_gries"
}

object MisraGriesAgg {
  /** Column form: candidate frequent items (sorted array<string>) among
    * the group's values; a superset of items with count > N/(k+1). */
  def mgCandidates(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(item), k)
        .toAggregateExpression())
}
