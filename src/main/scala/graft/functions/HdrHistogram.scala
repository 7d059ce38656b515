package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** HDR-style log-bucketed histogram sketch — the mergeable QUANTILE
  * column completing the sketch-table story next to [[KmvDistinct]]'s
  * distinct counts: pre-aggregate a metric's histogram per
  * (group, ingest shard), persist the sketch column, and answer later
  * p50/p95/p99 questions by ADDING histograms instead of rescanning —
  * the HdrHistogram pattern production latency pipelines use.
  *
  * Bucketing (m = [[HdrHistogram.M]] sub-bucket bits, values are
  * non-negative integers, e.g. money in cents):
  *   - v < 2^m: bucket = v (small values exact);
  *   - else with e = floor(log2 v): bucket = (e−m+1)·2^m + the m bits
  *     after the leading 1 — bucket width 2^(e−m), so the RELATIVE
  *     error of any reported quantile is ≤ 2^−m (< 0.8% at m = 7).
  * A bucket's representative is its integer midpoint (floor). The
  * bucket index is monotone in v, so iterating the sorted buffer is
  * ascending value order.
  *
  * Determinism — the property that picks this sketch over q-digest/KLL:
  * the sketch IS a bucket→count map, counts add under union, so the
  * merged sketch (and its serialized bytes: sorted (bucket, count)
  * pairs) is bit-identical to a direct sketch of the union for ANY
  * partitioning or merge order. q-digest/KLL compress mid-stream, which
  * makes their buffers accumulation-order-dependent and would break
  * this engine's same-input ⇒ same-bytes contract (the reason KMV was
  * chosen over HLL for distinct counts). The trade: bucket count grows
  * with the value RANGE (log₂(max)·2^m worst case, ~2^m·57 entries for
  * full-long range) instead of a hard constant — bounded and small for
  * any real metric domain.
  *
  * Scale posture: constant-ish memory per group, partial histograms
  * merged at the exchange (the TypedImperativeAggregate partial/final
  * split) — exact-shape quantiles without per-group sorts or windows.
  * The integer bucket arithmetic (exponent = length(bin(v)) − 1) is
  * reproducible in ANSI SQL, so unlike HLL the rollup is
  * oracle-checkable end to end. */
object HdrHistogram {

  /** Sub-bucket bits: 2^7 = 128 linear buckets per octave, relative
    * error ≤ 1/128. */
  val M = 7

  private[graft] def bucketOf(v0: Long): Int = {
    val v = if (v0 < 0) 0L else v0 // domain is non-negative metrics
    if (v < (1L << M)) v.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      (((e - M + 1) << M) | ((v >> (e - M)) & ((1L << M) - 1))).toInt
    }
  }

  /** Integer midpoint (floor) of the bucket's value interval. */
  private[graft] def repOf(b: Int): Long =
    if (b < (1 << M)) b.toLong
    else {
      val g = b >> M
      val mant = (b & ((1 << M) - 1)).toLong
      val e = g + M - 1
      val width = 1L << (e - M)
      (1L << e) + mant * width + (width >> 1)
    }

  private[functions] type Buf = java.util.TreeMap[Integer, java.lang.Long]

  private[functions] def newBuf(): Buf = new java.util.TreeMap[Integer, java.lang.Long]()

  private[functions] def add(buf: Buf, bucket: Int, c: Long): Unit = {
    val prev = buf.get(bucket)
    buf.put(bucket, if (prev == null) c else prev + c)
  }

  private[functions] def mergeInto(a: Buf, b: Buf): Buf = {
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(a, e.getKey, e.getValue) }
    a
  }

  private[functions] def serializeBuf(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 12)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); bb.putInt(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  private[functions] def mergeBytes(buf: Buf, bytes: Array[Byte]): Unit = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) { add(buf, bb.getInt, bb.getLong); i += 1 }
  }

  /** Representative values at quantiles ps (rank = ceil(p·N), first
    * bucket whose cumulative count reaches it) — all-integer walk over
    * the sorted buckets. */
  private[functions] def quantileReps(buf: Buf, ps: Seq[Double])
      : Array[Long] = {
    var n = 0L
    val it0 = buf.values().iterator()
    while (it0.hasNext) n += it0.next()
    if (n == 0) return ps.map(_ => 0L).toArray
    val ranks = ps.map(p => math.ceil(p * n).toLong)
    val out = new Array[Long](ps.size)
    var cum = 0L
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val before = cum
      cum += e.getValue
      var i = 0
      while (i < ranks.size) {
        if (ranks(i) > before && ranks(i) <= cum) out(i) = repOf(e.getKey)
        i += 1
      }
    }
    out
  }

  /** Sketch-valued aggregate over a non-negative LongType metric:
    * the persistable half. */
  def hdrSketch(cents: Column): Column =
    ColumnBridge.column(
      HdrSketchAgg(ColumnBridge.expression(cents)).toAggregateExpression())

  /** Merge aggregate over serialized sketches → array of representative
    * values (one per requested quantile): the query-time half. Counts
    * add, so merged quantiles equal direct ones exactly. */
  def hdrMergeQuantiles(sketch: Column, ps: Seq[Double]): Column =
    ColumnBridge.column(
      HdrMergeQuantilesAgg(ColumnBridge.expression(sketch), ps)
        .toAggregateExpression())
}

/** Histogram accumulation whose RESULT is the serialized sketch
  * (BinaryType) — persist per (group, shard), merge later. */
case class HdrSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HdrHistogram.Buf] {
  import HdrHistogram._

  override def createAggregationBuffer(): Buf = newBuf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, bucketOf(v.asInstanceOf[Long]), 1L)
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = mergeInto(a, b)

  override def eval(buf: Buf): Any = serializeBuf(buf)

  override def serialize(buf: Buf): Array[Byte] = serializeBuf(buf)

  override def deserialize(bytes: Array[Byte]): Buf = {
    val buf = newBuf(); mergeBytes(buf, bytes); buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): HdrSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HdrSketchAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "graft_hdr_sketch"
}

/** Sum-merge of serialized HDR sketches → array<bigint> of quantile
  * representatives for the requested ps. */
case class HdrMergeQuantilesAgg(
    child: Expression,
    ps: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HdrHistogram.Buf] {
  import HdrHistogram._

  override def createAggregationBuffer(): Buf = newBuf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) mergeBytes(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = mergeInto(a, b)

  override def eval(buf: Buf): Any =
    new GenericArrayData(quantileReps(buf, ps))

  override def serialize(buf: Buf): Array[Byte] = serializeBuf(buf)

  override def deserialize(bytes: Array[Byte]): Buf = {
    val buf = newBuf(); mergeBytes(buf, bytes); buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): HdrMergeQuantilesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HdrMergeQuantilesAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "graft_hdr_merge_quantiles"
}
