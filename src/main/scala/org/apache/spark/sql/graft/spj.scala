package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** THE bucket-layout placement arithmetic — the ONE definition every
  * consumer shares: the writer's fanout expression
  * (Layout.bucketPlacementExpr renders the same math as Catalyst
  * codegen), driver-side point-lookup pruning (Layout.strBucketId),
  * the catalog's V2 `bucket` function (GraftBucketFunction), and
  * runtime group filtering (KeyedParquetScan). Three diverging copies
  * of a placement hash is how a layout silently drops rows — so there
  * are no copies. NULL string keys hash to the seed (42), exactly what
  * SQL `xxhash64` evaluates to when its child is null, so the
  * evaluable function and the codegen'd writer expression agree on
  * every input. */
object BucketPlacement {
  def idOfLong(x: Long, n: Int): Int = (((x % n) + n) % n).toInt
  def idOfString(s: UTF8String, n: Int): Int =
    idOfLong(
      if (s == null) 42L
      else org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(s, 42L), n)
}

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
    with SupportsReportPartitioning with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = this
  override def description(): String =
    s"KeyedParquetScan(groups=${groups.size}) ${inner.description()}"

  // --- runtime group filtering (r18 ADVICE: DPP was lost exactly on
  // SPJ-eligible scans). The keyed grouping IS a partition index, so a
  // dynamic-partition-pruning subquery on the key column can drop whole
  // groups before a byte is read — the classic star-join win: a
  // selective dim filter prunes the fact scan to the surviving keys'
  // files at runtime. filter() narrows `live`; planInputPartitions
  // serves the narrowed set (BatchScanExec re-plans partitions after
  // filtering and regroups by HasPartitionKey). Guarded on
  // pushPartValues: without it Spark requires filtered partitions to
  // preserve the ORIGINAL partitioning exactly, so dropping groups
  // would throw — we then keep all groups (pruning is an optimization,
  // never a correctness lever). ---------------------------------------

  @volatile private var live: Seq[(InternalRow, Array[PartitionedFile])] =
    groups

  /** Key positions addressable by a runtime predicate: column name,
    * key-row ordinal, and the raw-literal → key-space mapping (identity
    * for identity transforms; the placement hash for bucket transforms
    * — a DPP literal arrives in COLUMN space, group keys live in
    * bucket-id space). */
  private lazy val keyCols: Seq[(String, Int, Any => Option[Any])] = {
    import org.apache.spark.sql.connector.expressions.{LiteralValue, Transform}
    keyExprs.toSeq.zipWithIndex.flatMap { case (e, i) =>
      e match {
        case t: Transform if t.name == "identity" =>
          t.references().headOption
            .filter(_.fieldNames().length == 1)
            .map(r => (r.fieldNames().head, i, (raw: Any) => Option(raw)))
        case t: Transform if t.name == "bucket" =>
          val n = t.arguments().collectFirst {
            case l: LiteralValue[_] => l.value match {
              case x: java.lang.Number => x.intValue()
            }
          }
          val c = t.references().headOption
            .filter(_.fieldNames().length == 1).map(_.fieldNames().head)
          n.zip(c).map { case (nb, col) =>
            (col, i, (raw: Any) => bucketIdOf(raw, nb)) }
        case _ => None
      }
    }
  }

  /** Column-space value → bucket id via [[BucketPlacement]], keyed on
    * the CATALYST literal type. None = an unplaceable literal (null,
    * unexpected type): the predicate is then ignored, sound. */
  private def bucketIdOf(raw: Any, n: Int): Option[Any] = raw match {
    case s: UTF8String        => Some(BucketPlacement.idOfString(s, n))
    case l: java.lang.Long    => Some(BucketPlacement.idOfLong(l, n))
    case i: java.lang.Integer =>
      Some(BucketPlacement.idOfLong(i.longValue(), n))
    case s: java.lang.Short   =>
      Some(BucketPlacement.idOfLong(s.longValue(), n))
    case b: java.lang.Byte    =>
      Some(BucketPlacement.idOfLong(b.longValue(), n))
    case _                    => None
  }

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (org.apache.spark.sql.internal.SQLConf.get.v2BucketingPushPartValuesEnabled)
      keyCols
        // only columns that SURVIVED column pruning: Spark's
        // PartitionPruning resolves these against the scan OUTPUT and
        // throws on a projected-away key column (a query that joins on
        // a non-partition column while not selecting the partition one)
        .filter(kc =>
          readSchema().fieldNames.exists(_.equalsIgnoreCase(kc._1)))
        .map(kc => org.apache.spark.sql.connector.expressions
          .Expressions.column(kc._1)).toArray
    else Array.empty

  /** One predicate → (key ordinal, allowed key-space values), when it
    * is an equality/IN on a key column with ALL-literal operands.
    * Anything else → None (the group set stays as is). */
  private def parsePredicate(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[(Int, Set[Any])] = {
    import org.apache.spark.sql.connector.expressions.{LiteralValue, NamedReference}
    if (p.name() != "IN" && p.name() != "=") return None
    val kids = p.children()
    if (kids.length < 2) return None
    val colName = kids.head match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        Some(r.fieldNames().head)
      case _ => None
    }
    val lits = kids.drop(1).toSeq.map {
      case l: LiteralValue[_] => Option(l.value)
      case _                  => None
    }
    if (colName.isEmpty || lits.exists(_.isEmpty)) return None
    keyCols.collectFirst {
      case (c, i, toKey) if c.equalsIgnoreCase(colName.get) =>
        val mapped = lits.flatten.flatMap(toKey)
        // every literal must map, or the filter under-approximates the
        // allowed set and would WRONGLY drop groups
        if (mapped.size == lits.size) Some((i, mapped.toSet)) else None
    }.flatten
  }

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions
        .filter.Predicate]): Unit = {
    var cur = live
    predicates.foreach(p => parsePredicate(p).foreach { case (i, allowed) =>
      cur = cur.filter { case (k, _) =>
        allowed.contains(k.asInstanceOf[GenericInternalRow].values(i))
      }
    })
    live = cur
  }
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
    live.zipWithIndex.map { case ((k, fs), i) =>
      new KeyedFilePartition(i, fs, k): InputPartition
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    inner.toBatch.createReaderFactory()
}

/** Statistics veneer over the vectorized parquet scan (r19): same
  * batch, same reader factory, same pushdown — only
  * `estimateStatistics` is enriched with the MANIFEST-derived exact row
  * count and per-column NDV (`Layout.scanStats`: per-file `#rows`
  * groups + merged KMV sketches, recorded at commit time). Spark's
  * `DataSourceV2Relation.transformV2Stats` lifts `columnStats` into
  * catalyst `ColumnStat`s, so with CBO on the planner sees real
  * cardinalities — a grouped subquery on a low-NDV column estimates to
  * its NDV and broadcasts, instead of mis-planning a sort-merge join
  * off the raw scan size. File size still comes from the wrapped scan
  * (byte truth lives with the file index). */
class GraftStatsScan(inner: Scan, rows: Option[Long],
    ndv: Map[String, (Long, Long)]) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = this
  override def description(): String = inner.description()
  override def planInputPartitions(): Array[InputPartition] =
    inner.toBatch.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory =
    inner.toBatch.createReaderFactory()
  override def estimateStatistics(): Statistics = {
    val size = inner match {
      case s: SupportsReportStatistics => s.estimateStatistics().sizeInBytes()
      case _                           => java.util.OptionalLong.empty()
    }
    val cols = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    val out = readSchema().fieldNames
    ndv.foreach { case (c, (n, nulls)) =>
      // only columns that survived pruning: the stats map resolves
      // against the scan OUTPUT. nullCount rides along — catalyst's
      // estimators require BOTH (hasCountStats) before they trust a
      // column at all
      if (out.exists(_.equalsIgnoreCase(c)))
        cols.put(
          org.apache.spark.sql.connector.expressions.Expressions.column(c),
          new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
            override def distinctCount(): java.util.OptionalLong =
              java.util.OptionalLong.of(n)
            override def nullCount(): java.util.OptionalLong =
              java.util.OptionalLong.of(nulls)
          })
    }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = size
      override def numRows(): java.util.OptionalLong =
        rows.fold(java.util.OptionalLong.empty())(
          java.util.OptionalLong.of)
      override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        cols
    }
  }
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
