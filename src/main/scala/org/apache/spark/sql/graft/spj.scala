package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A [[FilePartition]] whose files all share ONE partition-key tuple.
  * Subclassing (rather than a fresh InputPartition type) is the point:
  * Spark's own `FilePartitionReaderFactory.createReader` dispatches on
  * the FilePartition type, so the untouched VECTORIZED parquet reader
  * factory consumes these partitions as-is — the storage-partitioned
  * regrouping costs zero columnar-read capability. */
class KeyedFilePartition(index: Int, files: Array[PartitionedFile],
    key: InternalRow) extends FilePartition(index, files)
    with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Storage-partitioned-join (SPJ) veneer over Spark's own parquet Scan:
  * the SAME reader factory, the SAME pushed filters and pruned columns —
  * only the file→task grouping changes, from size-bin-packing to
  * one-task-per-partition-value, each task a [[KeyedFilePartition]]
  * carrying its key — and the scan reports
  * [[KeyGroupedPartitioning]](identity(partCols), nGroups).
  *
  * What that report buys at 100 TB: with
  * `spark.sql.sources.v2.bucketing.enabled`, Spark's
  * V2ScanPartitioningAndOrdering rule lifts the report into the scan
  * relation, EnsureRequirements recognizes two compatibly-keyed sides,
  * and an equi-join on the partition columns plans with NO shuffle on
  * EITHER side (missing partition values on one side are padded with
  * empty partitions under `…pushPartValues.enabled`). A co-partitioned
  * fact⋈fact join — the shuffle that dominates every warehouse-scale
  * plan — becomes a per-partition-value zip. A grouped aggregate on the
  * partition columns likewise satisfies its ClusteredDistribution
  * without an Exchange.
  *
  * The tradeoff this inherits from every SPJ engine (Iceberg's Spark
  * scan does exactly this grouping): task parallelism becomes the
  * partition-value count, and one hot value is one big task — Spark's
  * `…partiallyClusteredDistribution.enabled` exists for that skew.
  * Eligibility is decided by the caller from manifest bounds (every
  * file single-valued, see Layout.spjFileKeys); anything else falls
  * back to the plain scan, so the report is never a guess. */
class KeyedParquetScan(inner: Scan,
    groups: Seq[(InternalRow, Array[PartitionedFile])],
    keyExprs: Array[V2Expression]) extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportStatistics {
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = this
  override def description(): String =
    s"KeyedParquetScan(groups=${groups.size}) ${inner.description()}"
  /** Delegate the inner FileScan's size/row estimate — without this,
    * wrapping would LOSE the statistics report and a small keyed dim
    * could stop auto-broadcasting in joins where SPJ doesn't apply
    * (join key ≠ partition key). */
  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(
          groups.iterator.flatMap(_._2.iterator.map(_.length)).sum)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(keyExprs, groups.size)
  override def planInputPartitions(): Array[InputPartition] =
    groups.zipWithIndex.map { case ((k, fs), i) =>
      new KeyedFilePartition(i, fs, k): InputPartition
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    inner.toBatch.createReaderFactory()
}

object KeyedParquetScan {

  /** Manifest key value → catalyst currency for the column's type.
    * None = a type the manifest bound cannot faithfully represent
    * (caller falls back to the plain scan). */
  private def catalystVal(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (l: Long, LongType)      => Some(l)
    case (l: Long, IntegerType)   => Some(l.toInt)
    case (l: Long, ShortType)     => Some(l.toShort)
    case (l: Long, ByteType)      => Some(l.toByte)
    case (s: String, StringType)  => Some(UTF8String.fromString(s))
    case _                        => None
  }

  /** Wrap `inner` (the already-built vectorized parquet scan over
    * exactly `files`) in a keyed regrouping, if every scanned file has
    * a convertible key. `keyExprs`/`dts`: the reported partitioning
    * expressions and their catalyst key types — identity(col) with the
    * column's own type, or bucket(n, col) with IntegerType bucket ids.
    * Group order is sorted by file path — partition indexes (and
    * therefore plan strings) are deterministic across runs. */
  def wrap(inner: Scan, keyExprs: Array[V2Expression], dts: Seq[DataType],
      files: Seq[String], keyed: Map[String, (Long, Seq[Any])])
      : Option[Scan] = {
    val grouped = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Any], scala.collection.mutable.ArrayBuffer[PartitionedFile]]
    val sorted = files.sorted
    var fi = 0
    while (fi < sorted.size) {
      val f = sorted(fi)
      keyed.get(f) match {
        case Some((size, raw)) =>
          val key = Array.ofDim[Any](raw.size)
          var i = 0
          while (i < raw.size) {
            catalystVal(raw(i), dts(i)) match {
              case Some(cv) => key(i) = cv
              case None     => return None
            }
            i += 1
          }
          grouped.getOrElseUpdate(key.toSeq,
              new scala.collection.mutable.ArrayBuffer[PartitionedFile]) +=
            ColumnBridge.partitionedFile(f, size)
        case None => return None // file unknown to the manifest keying
      }
      fi += 1
    }
    if (grouped.isEmpty) return None
    val gs = grouped.toSeq.map { case (k, pfs) =>
      (new GenericInternalRow(k.toArray): InternalRow, pfs.toArray)
    }
    Some(new KeyedParquetScan(inner, gs, keyExprs))
  }
}
