package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The z-clustered arrangement of `df` (shared by [[zorderWrite]] and
    * the z-order path of [[compact]]): bucket-rank `a` and `b` against
    * their global min/max (one 1-row broadcast), interleave the ranks,
    * range-partition into `files` contiguous z chunks and sort within
    * each — every output file is a near-rectangle of the two-column
    * value space. */
  private def zArranged(df: DataFrame, a: String, b: String,
                        files: Int, buckets: Int): DataFrame = {
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
  }

  /** Write `df` as parquet clustered on the z-curve of (`a`, `b`). */
  def zorderWrite(df: DataFrame, a: String, b: String, path: String,
                  files: Int = 16, buckets: Int = 1024): Unit =
    zArranged(df, a, b, files, buckets)
      .write.mode("overwrite").parquet(path)

  /** Result of one [[compact]] pass. `filesRewritten` counts input files
    * actually read and re-packed; carried-over files (incremental mode)
    * are not rewritten. */
  case class CompactStats(filesBefore: Int, filesAfter: Int,
                          bytesBefore: Long, bytesAfter: Long,
                          filesRewritten: Int)

  /** Small-file compaction — the OPTIMIZE half of lakehouse table
    * maintenance (the reference's index-after-bulk-load step,
    * ETLCNPJFinalEmpresaEstabelecimentos.py:176-182, is the moral slot:
    * a physical-reorg pass after chunked appends). Chunked appends (S8)
    * leave a table as many files sized by APPEND cadence, not by read
    * efficiency; at 100 TB that means listing millions of files, opening
    * each for a footer, and starving scans of full row groups. This pass
    * rewrites the table into ceil(bytes / targetFileBytes) files:
    *
    *   - default: `coalesce` bin-packing — NO shuffle, pure IO merge
    *     (compaction is an IO job; shuffling 100 TB to merge files would
    *     dwarf the win). Existing intra-file ordering survives per bin.
    *   - `sortBy`: range-partition + in-file sort — one shuffle, buys
    *     min/max row-group + file skipping on the sort key (tier-2
    *     layout of DataSkippingSpec).
    *   - `zorderBy`: the [[zArranged]] two-column clustering — one
    *     shuffle, buys pruning on BOTH columns.
    *
    * Commit protocol: write to a sibling temp dir, then swap via two
    * renames (dir → backup, tmp → dir) and drop the backup — the
    * FS-level equivalent of a table-format's atomic REPLACE commit; on
    * HDFS each rename is atomic, so readers see the old or the new
    * complete table, never a mix. A real lakehouse deployment would run
    * this under a Delta/Iceberg transaction instead; the plan shape
    * (read all → arrange → write few) is identical. */
  /** `onlySmallerThan`: incremental OPTIMIZE — bin-pack ONLY files below
    * the threshold and carry every file at or above it into the new
    * table unchanged (hard link where the FS supports it, metadata-only;
    * copy otherwise). This is how production OPTIMIZE actually runs at
    * 100 TB: after each append burst, the small tail is re-packed while
    * the dominant mass of already-right-sized files is never re-read —
    * rewrite cost tracks the APPEND rate, not the table size.
    * Incompatible with sortBy/zorderBy (a sort over only the small
    * subset would break the global disjointness clustering buys). */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L << 20,
              sortBy: Seq[String] = Nil,
              zorderBy: Option[(String, String)] = None,
              zBuckets: Int = 1024,
              onlySmallerThan: Option[Long] = None): CompactStats = {
    import org.apache.hadoop.fs.Path
    require(onlySmallerThan.isEmpty || (sortBy.isEmpty && zorderBy.isEmpty),
      "incremental compaction cannot re-cluster: sort/z-order need a full rewrite")
    val path = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = path.getFileSystem(conf)
    def dataFiles(p: Path) = fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(path)
    val bytesBefore = before.map(_.getLen).sum
    val (rewrite, carry) = onlySmallerThan match {
      case Some(thr) => before.partition(_.getLen < thr)
      case None      => (before, Seq.empty)
    }
    if (rewrite.size <= 1 && carry.nonEmpty) // nothing worth re-packing
      return CompactStats(before.size, before.size,
        bytesBefore, bytesBefore, 0)
    val rewriteBytes = rewrite.map(_.getLen).sum
    val nOut = math.max(1L,
      (rewriteBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df =
      if (carry.isEmpty) spark.read.parquet(dir)
      else spark.read.parquet(rewrite.map(_.getPath.toString): _*)
    val arranged = zorderBy match {
      case Some((a, b)) => zArranged(df, a, b, nOut, zBuckets)
      case None if sortBy.nonEmpty =>
        df.repartitionByRange(nOut, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      case None => df.coalesce(nOut)
    }
    val tmp = new Path(path.getParent,
      path.getName + ".compact-tmp")
    val bak = new Path(path.getParent,
      path.getName + ".compact-bak")
    fs.delete(tmp, true); fs.delete(bak, true)
    arranged.write.mode("overwrite").parquet(tmp.toString)
    // carry right-sized files into the new table: hard link (metadata-
    // only, same-FS) with a byte copy as the portability fallback; a
    // real lakehouse would express "carry" as the file simply staying
    // referenced by the next table-format snapshot
    carry.foreach { st =>
      val dst = new Path(tmp, st.getPath.getName)
      val linked =
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri),
            java.nio.file.Paths.get(st.getPath.toUri))
          true
        } catch { case scala.util.control.NonFatal(_) => false }
      if (!linked)
        org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs, dst,
          false, conf)
    }
    if (!fs.rename(path, bak))
      throw new java.io.IOException(s"compact: cannot back up $path")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // roll back — the old table is intact
      throw new java.io.IOException(s"compact: cannot publish $tmp")
    }
    fs.delete(bak, true)
    val after = dataFiles(path)
    CompactStats(before.size, after.size,
      bytesBefore, after.map(_.getLen).sum, rewrite.size)
  }
}
