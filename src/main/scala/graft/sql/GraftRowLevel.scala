package graft.sql

import java.util.OptionalLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Layout

/** Group-based row-level SQL (`MERGE INTO` / `UPDATE` / rewrite-path
  * `DELETE`) for graft-manifest tables — the copy-on-write half Spark's
  * own planner drives once a table implements
  * `SupportsRowLevelOperations`:
  *
  *   1. the ANALYZER rewrites the command into a `ReplaceData` plan that
  *      reads the table through [[GraftRowLevelOperation.newScanBuilder]]
  *      (the COW scan), applies the merge/update logic, and writes every
  *      surviving row of the affected file-groups back through
  *      [[GraftRowLevelOperation.newWriteBuilder]];
  *   2. the OPTIMIZER's RowLevelOperationRuntimeGroupFiltering narrows
  *      "affected" from ALL files to the files that actually hold
  *      matching rows: the operation declares a per-row `_file` metadata
  *      column, Spark builds a runtime `IN` subquery over it (collect
  *      the distinct `_file`s satisfying the command's condition), and
  *      [[GraftCowScan.filter]] prunes the group list — the COW analogue
  *      of [[Layout.mergeInto]]'s input_file_name() semi-join, just
  *      driven by Catalyst instead of by hand;
  *   3. the WRITE stages each task's rows as parquet files into a fresh
  *      txn dir (Spark's own `ParquetFileFormat.prepareWrite` factory,
  *      via the bridge — ReplaceDataExec has no V1 write fallback) and
  *      the COMMIT is one [[Layout.commitRewrite]] CAS: head − scanned
  *      groups + staged files, stats columns re-recorded, serialized
  *      through the same manifest arbiter as every programmatic verb.
  *
  * Scale posture (the 100 TB question): the rewrite cost is bounded by
  * the matched-file footprint + insert volume, never the table — group
  * filtering prunes unmatched files BEFORE any parquet footer opens
  * (the subquery scans only the condition's columns), untouched files
  * carry by manifest line, and the commit is O(manifest). The COW scan
  * itself is row-based (the per-row `_file` append precludes returning
  * ColumnarBatches), a deliberate trade: row-level commands are
  * write-dominated, and the scan feeds a join anyway.
  *
  * Reference anchor: the nightly re-load upsert the reference runs as
  * DROP + bulk re-insert (`ETLCNPJFinalEmpresaEstabelecimentos.py:
  * 167-182`) — here a user writes `MERGE INTO` SQL text instead and
  * pays only for the delta. */
object GraftRowLevel {

  /** The `_file` metadata column: which data file a row lives in — the
    * group identity for copy-on-write planning (Iceberg uses the same
    * name for the same purpose). Reserved for row-level planning; a
    * plain SELECT resolves it but the fast parquet read path does not
    * serve it. */
  object FileColumn extends MetadataColumn {
    override def name: String = "_file"
    override def dataType: DataType = StringType
    override def isNullable: Boolean = false
    override def comment: String =
      "data file holding the row (row-level operation group id)"
  }

  private[sql] val FileColumnName = "_file"
}

/** One SQL command's worth of row-level state: pins the snapshot version
  * (scan list and commit base must agree), hands out scan/write
  * builders, and remembers the MAIN scan so the commit knows which
  * groups were read. The group-filter subquery builds a SECOND scan
  * from this same operation (RowLevelOperationTable delegates every
  * newScanBuilder here) — first-built wins the commit-scan slot, which
  * is correct because Spark builds the main ReplaceData scan during
  * early pushdown and only then runs the group-filtering rule that
  * spawns the subquery's. */
class GraftRowLevelOperation(
    val tablePath: String,
    val pinnedVersion: Int,
    val tableSchema: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** (manifest line, qualified absolute path, bytes) per file-group of
    * the pinned snapshot — absolute path is the `_file` currency. */
  val entries: Seq[(String, String, Long)] =
    Layout.rowLevelEntries(SparkSession.active, tablePath, pinnedVersion)

  /** Live deletion vectors of the pinned snapshot: the COW scan must
    * not read (and the rewrite must not resurrect) position-deleted
    * rows of a merge-on-read table. */
  val dvs: Map[String, Array[Long]] =
    Layout.versionDvs(SparkSession.active, tablePath, pinnedVersion)

  @volatile private var mainScan: GraftCowScan = null
  private[sql] def registerScan(s: GraftCowScan): Unit = synchronized {
    if (mainScan == null) mainScan = s
  }
  private[sql] def commitScan: GraftCowScan = mainScan

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options:
      org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder =
    new GraftCowScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fieldNames.sameElements(tableSchema.fieldNames),
      s"row-level write schema ${info.schema().fieldNames.mkString(",")} " +
        s"does not match table schema " +
        tableSchema.fieldNames.mkString(","))
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftCowBatchWrite(GraftRowLevelOperation.this)
        override def description(): String =
          s"graft-cow-write[$tablePath@v$pinnedVersion]"
      }
    }
  }

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftRowLevel.FileColumnName))

  override def description(): String =
    s"graft-cow[$cmd $tablePath@v$pinnedVersion]"
}

/** Standard v1-filter pushdown + column pruning; `_file` is synthesized
  * by the reader, everything else flows to the parquet machinery. */
class GraftCowScanBuilder(op: GraftRowLevelOperation) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = op.tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Filters over data columns push to parquet (row-group pruning);
    * everything is ALSO kept as residual (returned array) so Spark
    * re-evaluates — the parquet push is best-effort, the double
    * evaluation is the standard file-source contract. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(
      _.references.forall(_ != GraftRowLevel.FileColumnName))
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val scan = new GraftCowScan(op.entries, op.tableSchema, required,
      pushed, s"${op.tablePath}@v${op.pinnedVersion}", op.dvs)
    op.registerScan(scan)
    scan
  }
}

/** The COW scan: one input partition per file-group, rows read by
  * Spark's parquet reader under the table's recorded schema (missing
  * columns null-fill, the format's add-column evolution), with the
  * `_file` group id appended per row when requested. Implements runtime
  * group filtering: Spark's IN-subquery over `_file` prunes the group
  * list before any footer opens. Built from raw pieces (not the
  * operation) because TWO plan shapes need it: the ReplaceData main
  * scan, and the ordinary table read when a plan requests `_file` —
  * which is exactly the group-filter subquery scanning the original
  * relation (see [[org.apache.spark.sql.graft.SnapshotScanBuilder]]). */
class GraftCowScan(entries: Seq[(String, String, Long)],
    tableSchema: StructType, required: StructType,
    pushedFilters: Array[Filter], label: String,
    dvs: Map[String, Array[Long]] = Map.empty) extends Scan with Batch
    with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  /** Survivor groups — starts at the full pinned snapshot, narrowed by
    * [[filter]]; the write's commit swaps exactly this list. */
  @volatile private[sql] var files: Seq[(String, String, Long)] = entries

  private val wantsFile =
    required.fieldNames.contains(GraftRowLevel.FileColumnName)
  /** Data columns in requested order; `_file` (if requested) goes LAST —
    * Spark projects the scan output into the expected order anyway. */
  private val dataRequired = StructType(
    required.filterNot(_.name == GraftRowLevel.FileColumnName))

  override def readSchema(): StructType =
    if (wantsFile)
      StructType(dataRequired.fields :+
        org.apache.spark.sql.types.StructField(
          GraftRowLevel.FileColumnName, StringType, nullable = false))
    else dataRequired

  override def toBatch: Batch = this

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftRowLevel.FileColumnName))

  /** Runtime group filtering: keep only groups whose `_file` value is
    * allowed by every pushed predicate. Unrecognized predicate shapes
    * prune nothing (always safe — filtering is an optimization). */
  override def filter(predicates: Array[Predicate]): Unit = {
    def fileValues(p: Predicate): Option[Set[String]] = {
      val kids = p.children()
      def isFileRef(e: org.apache.spark.sql.connector.expressions.Expression) =
        e match {
          case r: NamedReference =>
            r.fieldNames.sameElements(Array(GraftRowLevel.FileColumnName))
          case _ => false
        }
      p.name() match {
        case "IN" if kids.nonEmpty && isFileRef(kids.head) =>
          Some(kids.tail.collect {
            case l: V2Literal[_] => String.valueOf(l.value) }.toSet)
        case "=" if kids.length == 2 && isFileRef(kids.head) =>
          Some(kids.tail.collect {
            case l: V2Literal[_] => String.valueOf(l.value) }.toSet)
        case _ => None
      }
    }
    val allowed = predicates.flatMap(fileValues(_))
    if (allowed.nonEmpty) {
      val keep = allowed.reduce(_ intersect _)
      files = files.filter { case (_, abs, _) => keep.contains(abs) }
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (_, abs, len) =>
      GraftCowInputPartition(abs, len): InputPartition }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val readFunc = ColumnBridge.parquetReaderFunc(spark,
      tableSchema, dataRequired, pushedFilters.toSeq, Map.empty)
    // dv'd files read WITHOUT pushed parquet filters: the anti-apply
    // skips by row ORDINAL, which only equals the iterator index when
    // the reader returns every row. Correctness is untouched — file-
    // source pushdown is best-effort and Spark re-evaluates every
    // filter above the scan; only the dv'd files (bounded by compaction
    // cadence) pay the unpruned read.
    val plainFunc =
      if (dvs.isEmpty) readFunc
      else ColumnBridge.parquetReaderFunc(spark,
        tableSchema, dataRequired, Nil, Map.empty)
    GraftCowReaderFactory(readFunc, plainFunc, wantsFile, dvs)
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(files.map(_._3).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def description(): String =
    s"graft-cow-scan[$label, groups=${files.size}/${entries.size}]"
}

case class GraftCowInputPartition(path: String, length: Long)
  extends InputPartition

/** Executor-side: parquet-read one file, anti-applying its deletion
  * vector (sorted deleted ordinals — one ascending merge walk, O(1)
  * per row) and appending the constant `_file` column via a reused
  * JoinedRow when the plan asked for it. A partition is always a WHOLE
  * file read in order with no pushed filters when a dv applies, so the
  * iterator index IS the row ordinal the dv recorded. */
case class GraftCowReaderFactory(
    readFunc: org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[InternalRow],
    plainReadFunc:
      org.apache.spark.sql.execution.datasources.PartitionedFile =>
        Iterator[InternalRow],
    wantsFile: Boolean,
    dvs: Map[String, Array[Long]] = Map.empty)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftCowInputPartition]
    val pf = ColumnBridge.partitionedFile(gp.path, gp.length)
    val base = dvs.get(gp.path) match {
      case None => readFunc(pf)
      case Some(deleted) =>
        val rows = plainReadFunc(pf)
        // lookahead lives in hasNext (the standard filter-iterator
        // shape): the underlying reader may REUSE its row buffer, so
        // the next pull must not happen until the consumer is done
        // with the previously returned row
        new Iterator[InternalRow] {
          private var ord = -1L
          private var di = 0
          private var pending: InternalRow = null
          override def hasNext: Boolean = {
            while (pending == null && rows.hasNext) {
              val r = rows.next(); ord += 1
              while (di < deleted.length && deleted(di) < ord) di += 1
              if (di >= deleted.length || deleted(di) != ord) pending = r
            }
            pending != null
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException("empty reader")
            val r = pending; pending = null; r
          }
        }
    }
    val it =
      if (!wantsFile) base
      else {
        val fileRow = new GenericInternalRow(
          Array[Any](UTF8String.fromString(gp.path)))
        val joined = new JoinedRow
        base.map(r => joined(r, fileRow))
      }
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { row = it.next(); true } else false
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** The V2 batch write behind ReplaceData: tasks stage parquet files into
  * one fresh txn dir (invisible until a manifest lists them), the driver
  * commit is a single REPLACE CAS swapping the scanned groups for the
  * staged files. Abort deletes the txn dir — staged-but-uncommitted
  * files are also vacuum's normal prey, the same crash story as every
  * other verb. */
class GraftCowBatchWrite(op: GraftRowLevelOperation) extends BatchWrite {

  private val txnRel = "data/txn-" + java.util.UUID.randomUUID().toString
  private val writeSchema =
    ColumnBridge.nullableSchema(op.tableSchema)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val (factory, conf) = ColumnBridge.parquetWriterFactory(
      SparkSession.active, writeSchema, Map.empty)
    GraftCowWriterFactory(op.tablePath, txnRel, factory, conf, writeSchema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.toSeq.collect {
      case m: GraftCowCommitMessage if m.relPath != null =>
        (m.relPath, m.bytes)
    }
    val scan = op.commitScan
    require(scan != null,
      "row-level write committed without a configured scan")
    val affected = scan.files.map(_._1).toSet
    Layout.commitRewrite(SparkSession.active, op.tablePath,
      op.pinnedVersion, affected, staged,
      s"${op.command().toString.toLowerCase}Sql")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val dir = new Path(op.tablePath, txnRel)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try fs.delete(dir, true) catch { case _: java.io.IOException => () }
  }
}

case class GraftCowCommitMessage(relPath: String, bytes: Long, rows: Long)
  extends WriterCommitMessage

/** Per-task parquet writer: lazily opened (an empty partition stages no
  * file), named by (partition, task attempt) so a speculative retry
  * never collides — the commit coordinator picks exactly one attempt's
  * message, and losers' files stay unreferenced until vacuum. */
case class GraftCowWriterFactory(tablePath: String, txnRel: String,
    factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: org.apache.spark.util.SerializableConfiguration,
    schema: StructType) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {

    private var writer:
      org.apache.spark.sql.execution.datasources.OutputWriter = null
    private var rows = 0L

    override def write(row: InternalRow): Unit = {
      if (writer == null)
        writer = ColumnBridge.newOutputWriter(factory, conf,
          s"$tablePath/$txnRel", f"part-$partitionId%05d-$taskId",
          schema, partitionId, taskId)
      writer.write(row)
      rows += 1
    }

    override def commit(): WriterCommitMessage =
      if (writer == null) GraftCowCommitMessage(null, 0L, 0L)
      else {
        writer.close()
        val p = new Path(writer.path())
        val len = p.getFileSystem(
          new org.apache.hadoop.conf.Configuration(conf.value))
          .getFileStatus(p).getLen
        GraftCowCommitMessage(s"$txnRel/${p.getName}", len, rows)
      }

    override def abort(): Unit =
      if (writer != null) {
        try writer.close() catch { case _: Throwable => () }
        val p = new Path(writer.path())
        try p.getFileSystem(
          new org.apache.hadoop.conf.Configuration(conf.value))
          .delete(p, false)
        catch { case _: java.io.IOException => () }
      }

    override def close(): Unit = ()
  }
}
