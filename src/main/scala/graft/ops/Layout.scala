package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering for write-time
  * data skipping.
  *
  * A linear sort (DataSkippingSpec's tier-2 layout) gives perfect
  * row-group pruning on ONE column and none on any other. Z-ordering
  * interleaves the bits of two columns' bucket ranks into one clustering
  * key, so each written file covers a small rectangle of the
  * (a, b) value space — its parquet min/max stats are narrow in BOTH
  * columns, and a selective filter on EITHER prunes most row groups at
  * the reader. This is the standard lakehouse layout trick for tables
  * with more than one hot filter column (e.g. documents filtered by
  * source on one query and by length band on the next).
  *
  * Everything is pure Column arithmetic (bitwise spread-and-interleave,
  * codegen'd, no UDF); the only extra cost at write time is the 1-row
  * stats broadcast and the range exchange the sorted write needs anyway.
  * At 100 TB the write is one pass, and every subsequent scan with a
  * filter on either dimension reads a fraction of the table.
  */
object Layout {

  /** Spread the low 32 bits of `x` into the even bit positions of a
    * long (bit i → bit 2i) — the classic mask-and-shift morton spread,
    * as five codegen'd bitwise steps. */
  private def spread(x: Column): Column =
    Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8  -> 0x00FF00FF00FF00FFL,
      4  -> 0x0F0F0F0F0F0F0F0FL,
      2  -> 0x3333333333333333L,
      1  -> 0x5555555555555555L
    ).foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** Morton (z-curve) interleave of two non-negative ints < 2^31. */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Equi-width bucket rank of `c` in [0, buckets) given broadcast
    * min/max columns. */
  private def bucketOf(c: Column, lo: Column, hi: Column,
                       buckets: Int): Column =
    when(hi <= lo, lit(0L)).otherwise(
      least(lit(buckets - 1L),
        ((c.cast("double") - lo.cast("double")) * buckets /
          (hi.cast("double") - lo.cast("double") + 1e-9)).cast("long")))

  /** Write `df` as parquet clustered on the z-curve of (`a`, `b`):
    * bucket-rank both columns against their global min/max (one 1-row
    * broadcast), interleave the ranks, range-partition into `files`
    * contiguous z chunks and sort within each — every output file is a
    * near-rectangle of the two-column value space. */
  def zorderWrite(df: DataFrame, a: String, b: String, path: String,
                  files: Int = 16, buckets: Int = 1024): Unit = {
    val stats = df.agg(
      min(col(a)).as("__amin"), max(col(a)).as("__amax"),
      min(col(b)).as("__bmin"), max(col(b)).as("__bmax"))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue(
        bucketOf(col(a), col("__amin"), col("__amax"), buckets),
        bucketOf(col(b), col("__bmin"), col("__bmax"), buckets)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__amin", "__amax", "__bmin", "__bmax")
      .write.mode("overwrite").parquet(path)
  }
}
