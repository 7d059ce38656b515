package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file Bloom filter for manifest-level point-lookup skipping — the
  * secondary-index tier min/max bounds can't provide: on a
  * high-cardinality column whose values are SCATTERED across files
  * (ingest order, hash residues), every file's [min, max] spans the
  * whole domain and range bounds prune nothing, yet an equality / IN
  * probe can still rule a file out if its Bloom filter lacks the value —
  * the same per-file bloom stats Delta (`delta.bloomFilter`) and
  * Parquet's own column-index blooms provide, recorded here in the
  * manifest line so the decision needs ZERO data-file IO.
  *
  * Determinism: membership bits come from double-hashed XXH64 with fixed
  * literal seeds, and a bitset OR is associative+commutative — the final
  * bloom is identical for any row order, partitioning, or merge
  * schedule, so manifests stay reproducible run-to-run.
  *
  * One-sidedness: a bloom can only PROVE ABSENCE. A hash-collision false
  * positive keeps a file that has no matching rows (wasted scan, never a
  * wrong answer); absence of a recorded bloom keeps the file too. Stats
  * remain an optimization, never a correctness input.
  *
  * Sizing: `bits` per file per column; fpp ≈ (1 − e^(−K·n/m))^K with
  * K=5 hashes — size m ≈ 10× the expected distinct values per file for
  * ~1% fpp. The table property `graft.stats.bloom.bits` carries the
  * choice (default 8192).
  */
object FileBloom {

  /** Number of bit positions probed per value (fixed — recorded blooms
    * and membership checks must always agree). */
  val K = 5

  private val Seed1 = 0x9E3779B97F4A7C15L
  private val Seed2 = 0xC2B2AE3D27D4EB4FL

  private[graft] def hashesOfLong(v: Long): (Long, Long) =
    (XXH64.hashLong(v, Seed1), XXH64.hashLong(v, Seed2))

  private[graft] def hashesOfUtf8(s: UTF8String): (Long, Long) =
    (XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes,
      Seed1),
     XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes,
      Seed2))

  /** Set the K double-hashed bit positions for (h1, h2) in `words`. */
  private[graft] def setBits(words: Array[Long], h1: Long,
      h2: Long): Unit = {
    val m = words.length * 64
    var i = 0
    while (i < K) {
      val pos = (((h1 + i * h2) % m) + m) % m
      words(pos.toInt >> 6) |= 1L << (pos.toInt & 63)
      i += 1
    }
  }

  private def testBits(bloom: Array[Byte], h1: Long, h2: Long): Boolean = {
    val m = bloom.length.toLong * 8
    var i = 0
    while (i < K) {
      val pos = ((((h1 + i * h2) % m) + m) % m).toInt
      if ((bloom(pos >> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Driver-side membership probes — MUST mirror the agg's hashing. */
  def mightContainLong(bloom: Array[Byte], v: Long): Boolean = {
    val (h1, h2) = hashesOfLong(v)
    testBits(bloom, h1, h2)
  }

  def mightContainString(bloom: Array[Byte], v: String): Boolean = {
    val (h1, h2) = hashesOfUtf8(UTF8String.fromString(v))
    testBits(bloom, h1, h2)
  }

  private[graft] def wordsToBytes(words: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](words.length * 8)
    var i = 0
    while (i < words.length) {
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = ((words(i) >>> (8 * j)) & 0xFF).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  private[graft] def bytesToWords(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) {
      var j = 0
      var w = 0L
      while (j < 8) {
        w |= (bytes(i * 8 + j) & 0xFFL) << (8 * j)
        j += 1
      }
      out(i) = w
      i += 1
    }
    out
  }

  /** Column wrapper: `fileBloom(col, bits)` aggregates the group's
    * values into one serialized bloom (BinaryType). */
  def fileBloom(c: Column, bits: Int): Column =
    ColumnBridge.column(
      FileBloomAgg(ColumnBridge.expression(c), bits)
        .toAggregateExpression())
}

/** The per-group bloom-builder aggregate. Buffer = the bitset's 64-bit
  * words; update hashes the value by its type (integral → hashLong,
  * string → hashUnsafeBytes over the UTF-8 bytes); merge is a word-wise
  * OR (associative, commutative — partial blooms combine map-side like
  * any partial aggregate). Nulls are skipped: a NULL never matches an
  * equality probe, so it needs no bit. */
case class FileBloomAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(bits >= 64 && bits % 64 == 0,
    s"bloom bits must be a positive multiple of 64, got $bits")

  // lazy val, not val: the constructor also runs on UNRESOLVED children
  // (analyzer tree rewrites call copy() before resolution), where
  // dataType throws; lazy defers to first update() — post-resolution —
  // and then pays the type dispatch once instead of per input row
  private lazy val isString = child.dataType == StringType

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](bits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val (h1, h2) =
        if (isString) FileBloom.hashesOfUtf8(v.asInstanceOf[UTF8String])
        else FileBloom.hashesOfLong(v match {
          case b: Byte  => b.toLong
          case s: Short => s.toLong
          case i: Int   => i.toLong
          case l: Long  => l
          case other => throw new IllegalArgumentException(
            s"bloom stats support integral and string columns, got $other")
        })
      FileBloom.setBits(buf, h1, h2)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = FileBloom.wordsToBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    FileBloom.wordsToBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    FileBloom.bytesToWords(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): FileBloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FileBloomAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "graft_file_bloom"
}
