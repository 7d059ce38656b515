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
  * On a `graft.rowlevel.mode = 'mor'` table the SAME commands take the
  * DELTA rewrite instead ([[GraftDeltaOperation]], `SupportsDelta`):
  * the scan additionally serves the `_pos` row ordinal, the writer
  * receives per-row delete/update/insert verbs keyed by the
  * (_file, _pos) row id, deletes land as position-delete sidecar
  * entries, updates as delete + re-insert — and NO pre-existing data
  * file is rewritten, so a point UPDATE costs its matched rows, not
  * its matched files' bytes (see the classes at the bottom of this
  * file).
  *
  * Reference anchor: the nightly re-load upsert the reference runs as
  * DROP + bulk re-insert (`ETLCNPJFinalEmpresaEstabelecimentos.py:
  * 167-182`) — here a user writes `MERGE INTO` SQL text instead and
  * pays only for the delta. */
object GraftRowLevel {

  /** Refuse a row-level operation over a snapshot carrying equality
    * deletes (r19): the COW/delta scans mask by ordinal, so a rewrite
    * through them would resurrect key-masked rows. */
  private[sql] def requireNoEqs(tablePath: String, v: Int): Unit = {
    val spark = SparkSession.active
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!Layout.versionHasEqs(fs, root, v),
      s"$tablePath@v$v carries live equality deletes — materialize " +
        "them first (CALL system.compact(only_dv => true)) before " +
        "UPDATE/MERGE, or keep mutating through upsertByKeys")
  }

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

  /** `_pos` (0-based row ordinal within its data file) — with `_file`
    * it forms the ROW ID of the delta-based (merge-on-read) row-level
    * path: a position-delete sidecar entry is exactly one
    * (grpOf(_file), _pos) pair. Served by the row-based scan counting
    * ordinals over an unfiltered read (pushdown would desynchronize
    * the count), dv-deleted rows excluded but still counted. */
  object PosColumn extends MetadataColumn {
    override def name: String = "_pos"
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def isNullable: Boolean = false
    override def comment: String =
      "row ordinal within its data file (merge-on-read row id)"
  }

  private[sql] val FileColumnName = "_file"
  private[sql] val PosColumnName = "_pos"
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

  // equality deletes mask by KEY, which the ordinal-keyed COW scan
  // cannot apply — a rewrite reading through it would resurrect
  // eq-deleted rows. Refuse with the way out named (r19).
  GraftRowLevel.requireNoEqs(tablePath, pinnedVersion)

  @volatile private var mainScan: GraftCowScan = null
  private[sql] def registerScan(s: GraftCowScan): Unit = synchronized {
    if (mainScan == null) mainScan = s
  }
  private[sql] def commitScan: GraftCowScan = mainScan

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options:
      org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder = {
    Layout.ensureFieldIdRead(SparkSession.active, tableSchema)
    new GraftCowScanBuilder(this)
  }

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

/** Standard v1-filter pushdown + column pruning; `_file`/`_pos` are
  * synthesized by the reader, everything else flows to the parquet
  * machinery. Shared by the COW and the delta (merge-on-read) row-level
  * operations — `register` lets the COW op capture its commit scan. */
class GraftCowScanBuilder(entries: Seq[(String, String, Long)],
    tableSchema: StructType, dvs: Map[String, Array[Long]],
    label: String, register: GraftCowScan => Unit) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  def this(op: GraftRowLevelOperation) = this(op.entries, op.tableSchema,
    op.dvs, s"${op.tablePath}@v${op.pinnedVersion}", op.registerScan)

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Filters over data columns push to parquet (row-group pruning);
    * everything is ALSO kept as residual (returned array) so Spark
    * re-evaluates — the parquet push is best-effort, the double
    * evaluation is the standard file-source contract. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(_.references.forall(r =>
      r != GraftRowLevel.FileColumnName && r != GraftRowLevel.PosColumnName))
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val scan = new GraftCowScan(entries, tableSchema, required,
      pushed, label, dvs)
    register(scan)
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
  private val wantsPos =
    required.fieldNames.contains(GraftRowLevel.PosColumnName)
  /** Data columns in requested order; `_file`/`_pos` (if requested) go
    * LAST in that order — Spark projects the scan output into the
    * expected order anyway. */
  private val dataRequired = StructType(
    required.filterNot(f => f.name == GraftRowLevel.FileColumnName ||
      f.name == GraftRowLevel.PosColumnName))

  override def readSchema(): StructType = {
    var fields = dataRequired.fields
    if (wantsFile) fields = fields :+
      org.apache.spark.sql.types.StructField(
        GraftRowLevel.FileColumnName, StringType, nullable = false)
    if (wantsPos) fields = fields :+
      org.apache.spark.sql.types.StructField(
        GraftRowLevel.PosColumnName,
        org.apache.spark.sql.types.LongType, nullable = false)
    StructType(fields)
  }

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
    // dv'd files — and EVERY file when `_pos` is requested — read
    // WITHOUT pushed parquet filters: both the anti-apply and the
    // synthesized ordinal identify rows by position, which only equals
    // the iterator index when the reader returns every row.
    // Correctness is untouched — file-source pushdown is best-effort
    // and Spark re-evaluates every filter above the scan; only the
    // dv'd files (bounded by compaction cadence) and row-id scans pay
    // the unpruned read.
    val plainFunc =
      if (dvs.isEmpty && !wantsPos) readFunc
      else ColumnBridge.parquetReaderFunc(spark,
        tableSchema, dataRequired, Nil, Map.empty)
    GraftCowReaderFactory(readFunc, plainFunc, wantsFile, wantsPos, dvs)
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
    wantsPos: Boolean,
    dvs: Map[String, Array[Long]] = Map.empty)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftCowInputPartition]
    val pf = ColumnBridge.partitionedFile(gp.path, gp.length)
    val deleted = dvs.getOrElse(gp.path, Array.empty[Long])
    val it: Iterator[InternalRow] =
      if (!wantsPos && deleted.isEmpty) {
        val base = readFunc(pf)
        if (!wantsFile) base
        else {
          val fileRow = new GenericInternalRow(
            Array[Any](UTF8String.fromString(gp.path)))
          val joined = new JoinedRow
          base.map(r => joined(r, fileRow))
        }
      } else {
        // position-identified path: plain (unfiltered) read so the
        // iterator index IS the row ordinal; dv'd ordinals skipped but
        // still counted; `_file`/`_pos` appended via a reused meta row.
        // Lookahead lives in hasNext (the standard filter-iterator
        // shape): the underlying reader may REUSE its row buffer, so
        // the next pull must not happen until the consumer is done
        // with the previously returned row.
        val rows = plainReadFunc(pf)
        val nMeta = (if (wantsFile) 1 else 0) + (if (wantsPos) 1 else 0)
        val metaRow = new GenericInternalRow(math.max(nMeta, 1))
        if (wantsFile) metaRow.update(0, UTF8String.fromString(gp.path))
        val posSlot = if (wantsFile) 1 else 0
        val joined = new JoinedRow
        new Iterator[InternalRow] {
          private var ord = -1L
          private var di = 0
          private var pending: InternalRow = null
          private var pendingOrd = -1L
          override def hasNext: Boolean = {
            while (pending == null && rows.hasNext) {
              val r = rows.next(); ord += 1
              while (di < deleted.length && deleted(di) < ord) di += 1
              if (di >= deleted.length || deleted(di) != ord) {
                pending = r; pendingOrd = ord
              }
            }
            pending != null
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException("empty reader")
            val r = pending; pending = null
            if (nMeta == 0) r
            else {
              if (wantsPos) metaRow.setLong(posSlot, pendingOrd)
              joined(r, metaRow)
            }
          }
        }
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

// ---------------------------------------------------------------------
// Delta-based (merge-on-read) row-level SQL — `SupportsDelta`. On a
// `graft.rowlevel.mode = 'mor'` table, UPDATE / MERGE INTO / rewrite-path
// DELETE no longer rewrite matched file-groups: Spark's delta rewrite
// hands the writer per-row (operation, row id) verbs, deletes become
// position-delete sidecar entries keyed by the (_file, _pos) row id the
// scan synthesizes, updates become delete + re-insert, inserts append —
// ONE commit annotates the affected manifest lines with dv pointers and
// adds the new data files. Write cost ∝ matched + inserted ROWS; no
// pre-existing data file opens for write (the same bargain the
// programmatic deleteWhereMor/mergeInto MOR paths struck, now for SQL
// text).
// ---------------------------------------------------------------------

/** The merge-on-read twin of [[GraftRowLevelOperation]]: same pinned
  * snapshot, same shared COW scan (which serves the `_pos` ordinal and
  * anti-applies existing dvs, so a re-UPDATE of a survivor row is keyed
  * on TRUE file ordinals), but writes ride [[GraftDeltaBatchWrite]]. */
class GraftDeltaOperation(
    val tablePath: String,
    val pinnedVersion: Int,
    val tableSchema: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation
    with SupportsDelta {

  val entries: Seq[(String, String, Long)] =
    Layout.rowLevelEntries(SparkSession.active, tablePath, pinnedVersion)
  val dvs: Map[String, Array[Long]] =
    Layout.versionDvs(SparkSession.active, tablePath, pinnedVersion)

  // same eq guard as the COW operation: the shared scan masks by
  // ordinal only (r19)
  GraftRowLevel.requireNoEqs(tablePath, pinnedVersion)

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options:
      org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder = {
    Layout.ensureFieldIdRead(SparkSession.active, tableSchema)
    new GraftCowScanBuilder(entries, tableSchema, dvs,
      s"$tablePath@v$pinnedVersion(mor)", _ => ())
  }

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftRowLevel.FileColumnName),
    Expressions.column(GraftRowLevel.PosColumnName))

  /** `_file` rides along for runtime group filtering (the IN-subquery
    * over matched files still prunes the scan's group list). */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftRowLevel.FileColumnName))

  override def newWriteBuilder(info: LogicalWriteInfo)
      : DeltaWriteBuilder = new DeltaWriteBuilder {
    override def build(): DeltaWrite = new DeltaWrite {
      override def toBatch: DeltaBatchWrite =
        new GraftDeltaBatchWrite(GraftDeltaOperation.this)
      override def description(): String =
        s"graft-delta-write[$tablePath@v$pinnedVersion]"
    }
  }

  override def description(): String =
    s"graft-delta[$cmd $tablePath@v$pinnedVersion]"
}

/** Tasks stage insert/update rows as parquet AND position deletes as
  * (grp, pos) sidecar parquet into one fresh txn dir; the driver commit
  * is a single REPLACE CAS via [[Layout.commitDelta]]. */
class GraftDeltaBatchWrite(op: GraftDeltaOperation)
    extends DeltaBatchWrite {

  private val txnRel = "data/txn-" + java.util.UUID.randomUUID().toString
  private val writeSchema = ColumnBridge.nullableSchema(op.tableSchema)
  private[sql] val dvSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("grp", StringType,
      nullable = false),
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.LongType, nullable = false)))

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DeltaWriterFactory = {
    val spark = SparkSession.active
    // each factory carries ITS schema inside its hadoop conf
    // (ParquetWriteSupport reads the schema from the conf, not the
    // OutputWriter argument) — the two writers must not share one
    val (dataFactory, dataConf) =
      ColumnBridge.parquetWriterFactory(spark, writeSchema, Map.empty)
    val (dvFactory, dvConf) =
      ColumnBridge.parquetWriterFactory(spark, dvSchema, Map.empty)
    GraftDeltaWriterFactory(op.tablePath, txnRel, dataFactory, dvFactory,
      dataConf, dvConf, writeSchema, dvSchema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.toSeq.collect { case m: GraftDeltaCommitMessage => m }
    val dataStaged = ms.collect {
      case m if m.dataRel != null => (m.dataRel, m.dataBytes) }
    val grpToSidecars = ms.flatMap(m =>
        m.grps.map(g => g -> m.dvRel)).groupBy(_._1)
      .map { case (g, rs) => g -> rs.map(_._2).distinct.sorted.toSeq }
    // an UPDATE/MERGE that matched zero rows and inserted none has
    // nothing to commit — committing would mint a manifest version
    // identical to the head (version churn + a misleading DESCRIBE
    // HISTORY line per no-op statement; r17 ADVICE)
    if (grpToSidecars.isEmpty && dataStaged.isEmpty) return
    Layout.commitDelta(SparkSession.active, op.tablePath,
      op.pinnedVersion, grpToSidecars, dataStaged,
      s"${op.command().toString.toLowerCase}DeltaSql")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val dir = new Path(op.tablePath, txnRel)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try fs.delete(dir, true) catch { case _: java.io.IOException => () }
  }
}

case class GraftDeltaCommitMessage(dataRel: String, dataBytes: Long,
    dvRel: String, grps: Array[String]) extends WriterCommitMessage

/** Per-task delta writer: lazily opens a parquet data writer for
  * inserts and a (grp, pos) sidecar writer for deletes; update =
  * delete + insert. Names carry (partition, task attempt) so
  * speculative retries never collide — the commit coordinator picks one
  * attempt's message, losers stay unreferenced until vacuum. */
case class GraftDeltaWriterFactory(tablePath: String, txnRel: String,
    dataFactory:
      org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    dvFactory:
      org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: org.apache.spark.util.SerializableConfiguration,
    dvConf: org.apache.spark.util.SerializableConfiguration,
    schema: StructType, dvSchema: StructType)
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DeltaWriter[InternalRow] = new DeltaWriter[InternalRow] {

    private var dataWriter:
      org.apache.spark.sql.execution.datasources.OutputWriter = null
    private var dvWriter:
      org.apache.spark.sql.execution.datasources.OutputWriter = null
    private val grps = scala.collection.mutable.TreeSet.empty[String]
    private val dvRow = new GenericInternalRow(2)

    override def insert(row: InternalRow): Unit = {
      if (dataWriter == null)
        dataWriter = ColumnBridge.newOutputWriter(dataFactory, conf,
          s"$tablePath/$txnRel", f"part-$partitionId%05d-$taskId",
          schema, partitionId, taskId)
      dataWriter.write(row)
    }

    override def delete(meta: InternalRow, id: InternalRow): Unit = {
      // row id = (_file qualified path, _pos ordinal), rowId() order
      val grp = Layout.grpOfPath(id.getUTF8String(0).toString)
      if (dvWriter == null)
        dvWriter = ColumnBridge.newOutputWriter(dvFactory, dvConf,
          s"$tablePath/$txnRel", f"dv-$partitionId%05d-$taskId",
          dvSchema, partitionId, taskId)
      dvRow.update(0, UTF8String.fromString(grp))
      dvRow.setLong(1, id.getLong(1))
      dvWriter.write(dvRow)
      grps += grp
    }

    override def update(meta: InternalRow, id: InternalRow,
        row: InternalRow): Unit = {
      delete(meta, id); insert(row)
    }

    override def commit(): WriterCommitMessage = {
      def closeAndRel(
          w: org.apache.spark.sql.execution.datasources.OutputWriter)
          : (String, Long) =
        if (w == null) (null, 0L)
        else {
          w.close()
          val p = new Path(w.path())
          val len = p.getFileSystem(
            new org.apache.hadoop.conf.Configuration(conf.value))
            .getFileStatus(p).getLen
          (s"$txnRel/${p.getName}", len)
        }
      val (dataRel, dataBytes) = closeAndRel(dataWriter)
      val (dvRel, _) = closeAndRel(dvWriter)
      GraftDeltaCommitMessage(dataRel, dataBytes, dvRel,
        grps.toArray)
    }

    override def abort(): Unit =
      Seq(dataWriter, dvWriter).filter(_ != null).foreach { w =>
        try w.close() catch { case _: Throwable => () }
        val p = new Path(w.path())
        try p.getFileSystem(
          new org.apache.hadoop.conf.Configuration(conf.value))
          .delete(p, false)
        catch { case _: java.io.IOException => () }
      }

    override def close(): Unit = ()
  }
}

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
