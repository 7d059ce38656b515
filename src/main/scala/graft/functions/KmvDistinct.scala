package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate — the third custom-aggregate tier after
  * Aggregator (DecimalSumAgg) and codegen expressions: an arbitrary
  * mutable object buffer with explicit serialize/merge, the same contract
  * Spark's own HLL++ uses.
  *
  * Estimator: with the input pre-hashed to uniform 64-bit values, keep
  * the k smallest (as unsigned); if fewer than k distinct values were
  * seen the count is exact, else n̂ = (k−1) · 2⁶⁴ ⁄ kth-min. Fully
  * deterministic (hash-based, no RNG): same input ⇒ same estimate on any
  * cluster/partitioning, because min-set union is associative and
  * commutative.
  *
  * Scale posture: constant memory (k longs) per group, partial sketches
  * merged at the exchange — COUNT(DISTINCT) without the per-key shuffle.
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](KmvDistinct.UnsignedOrd)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.remove(buf.last())
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      a.add(it.next())
      if (a.size > k) a.remove(a.last())
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // kth smallest unsigned hash as a fraction of the 2^64 space
      val kth = buf.last()
      val frac = (kth.longValue() ^ Long.MinValue).toDouble +
        math.pow(2, 63) // unsigned value of kth
      math.round((k - 1).toDouble * math.pow(2, 64) / frac)
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "graft_kmv_distinct"
}

object KmvDistinct {
  /** Unsigned 64-bit ordering; a named serializable object because the
    * expression (and its buffers) ship inside tasks. */
  private[graft] object UnsignedOrd
      extends java.util.Comparator[java.lang.Long] with Serializable {
    override def compare(a: java.lang.Long, b: java.lang.Long): Int =
      java.lang.Long.compareUnsigned(a, b)
  }

  private[graft] def estimate(buf: java.util.TreeSet[java.lang.Long],
      k: Int): Long =
    if (buf.size < k) buf.size.toLong
    else {
      val kth = buf.last()
      val frac = (kth.longValue() ^ Long.MinValue).toDouble +
        math.pow(2, 63)
      math.round((k - 1).toDouble * math.pow(2, 64) / frac)
    }

  private[functions] def serializeBuf(
      buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  private[graft] def mergeBytes(
      buf: java.util.TreeSet[java.lang.Long], bytes: Array[Byte], k: Int)
      : Unit = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      buf.add(bb.getLong)
      if (buf.size > k) buf.remove(buf.last())
      i += 1
    }
  }

  /** Column form; the input column must already be a 64-bit hash
    * (e.g. xxhash64(col)) so the uniformity assumption holds. */
  def kmvDistinct(hashed: Column, k: Int = 256): Column =
    ColumnBridge.column(
      KmvDistinct(ColumnBridge.expression(hashed), k).toAggregateExpression())

  /** Sketch-valued aggregate: same KMV accumulation but the RESULT is the
    * serialized sketch (binary), not the estimate — the persistable
    * half of the mergeable-sketch pattern. */
  def kmvSketch(hashed: Column, k: Int = 256): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(hashed), k)
        .toAggregateExpression())

  /** Merge aggregate over serialized sketches: combines binary sketch
    * columns (produced by [[kmvSketch]], possibly read back from a
    * warehouse table) into the distinct-count estimate — the query-time
    * half. Union of k-min sets is associative and commutative, so the
    * merged estimate is bit-identical to a direct sketch of the union. */
  def kmvMerge(sketch: Column, k: Int = 256): Column =
    ColumnBridge.column(
      KmvMergeAgg(ColumnBridge.expression(sketch), k)
        .toAggregateExpression())
}

/** [[KmvDistinct]] variant whose output is the serialized sketch itself
  * (BinaryType): pre-aggregate once at ingest, persist the sketch column,
  * and answer later distinct-count questions by merging sketches instead
  * of rescanning — the standard 100 TB warehouse rollup trick (Spark's
  * own HLL++ gained the same split as hll_sketch_agg/hll_union_agg). */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](KmvDistinct.UnsignedOrd)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.remove(buf.last())
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      a.add(it.next())
      if (a.size > k) a.remove(a.last())
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvDistinct.serializeBuf(buf)

  override def serialize(buf: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = KmvDistinct.serializeBuf(buf)

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    KmvDistinct.mergeBytes(buf, bytes, k)
    buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "graft_kmv_sketch"
}

/** Union-merge of serialized KMV sketches → distinct-count estimate.
  * Input rows are BinaryType sketches from [[KmvSketchAgg]]. */
case class KmvMergeAgg(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](KmvDistinct.UnsignedOrd)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null)
      KmvDistinct.mergeBytes(buf, v.asInstanceOf[Array[Byte]], k)
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      a.add(it.next())
      if (a.size > k) a.remove(a.last())
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvDistinct.estimate(buf, k)

  override def serialize(buf: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = KmvDistinct.serializeBuf(buf)

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    KmvDistinct.mergeBytes(buf, bytes, k)
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "graft_kmv_merge"
}
