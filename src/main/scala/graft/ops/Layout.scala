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
    * (read all → arrange → write few) is identical.
    *
    * NOT for manifest tables: the rename-swap moves files out from
    * under a reader pinned to an existing snapshot version — on a table
    * managed by [[commitSnapshot]]/[[readSnapshot]], use
    * [[compactSnapshot]] (OPTIMIZE as a REPLACE commit; old files stay
    * put until [[expireSnapshots]]) instead. This directory form is for
    * plain, listing-read parquet directories only. */
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

  // ---------------------------------------------------------------------
  // Manifest-based snapshot commits — the table-format core (the idea
  // under Iceberg/Delta) on plain parquet + the Hadoop FileSystem API.
  //
  // A table is a directory whose READERS NEVER LIST IT: the authoritative
  // state is the newest manifests/v<N>.manifest, a text file of
  // root-relative data-file paths (relative so the table is relocatable).
  // A write transaction (1) stages its parquet files under a uuid'd
  // data/txn-* directory — invisible, since no manifest references them —
  // then (2) publishes manifest v<N+1> = v<N>'s list + the new files via
  // create-temp-then-rename. Rename-if-absent is the commit point and
  // doubles as optimistic concurrency: two racing writers both try
  // v<N+1>, the loser's rename fails (destination exists), and it retries
  // against the new head. Crash between (1) and (2) leaves orphan files
  // that no reader ever sees (compaction can sweep them by age).
  //
  // Why this is the 100 TB design: object stores make directory listing
  // slow, expensive and (historically) eventually-consistent, while
  // manifest-read + direct-file-open is O(1) round trips; snapshot reads
  // pin a version so long queries see a frozen table while commits land;
  // and the commit cost is one small-file rename regardless of data
  // volume. SnapshotIsolationSpec pins version pinning + orphan
  // invisibility; the q_manifest_snapshot oracle (shared with
  // q_table_roundtrip) re-proves snapshot read ≡ plain table read.
  //
  // COMMIT-SAFETY PRECONDITION: the CAS is only a CAS where rename is an
  // atomic fail-if-destination-exists operation — true on HDFS and on
  // local filesystems (Hadoop 3.4 rename onto an existing destination
  // returns false and preserves the winner), FALSE on raw object stores
  // (S3A rename is a non-atomic copy+delete with no fail-if-exists
  // guarantee; two racing writers could both "win" v<N+1> and one
  // commit's files would silently vanish from history). This is the same
  // caveat every Hadoop-committed table format carries: on S3, Delta
  // requires a LogStore with a conditional-put/locking service and
  // Iceberg requires a catalog (Hive/Glue/REST) to arbitrate the commit.
  // Deploying THIS protocol against an object store likewise needs an
  // external commit arbiter (a DynamoDB-style lock or a conditional-put
  // manifest write); the manifest-read/direct-open READ path needs no
  // such help and is where the object-store win actually lives.
  // ---------------------------------------------------------------------

  import org.apache.hadoop.fs.{FileSystem, Path}

  private val ManifestRe = """v(\d+)\.manifest""".r

  /** Newest committed version of `table`, 0 if none. */
  def currentVersion(fs: FileSystem, table: Path): Int = {
    val mdir = new Path(table, "manifests")
    if (!fs.exists(mdir)) 0
    else fs.listStatus(mdir).flatMap(st => st.getPath.getName match {
      case ManifestRe(n) => Some(n.toInt)
      case _             => None
    }).foldLeft(0)(math.max)
  }

  private def manifestFiles(fs: FileSystem, table: Path, v: Int)
      : Seq[String] = {
    val in = fs.open(new Path(table, s"manifests/v$v.manifest"))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The one manifest CAS loop, shared by every commit verb (APPEND,
    * REPLACE/compact, DELETE, rollback): `listFor(head)` computes the
    * new version's file list against the head CURRENT AT EACH ATTEMPT —
    * so a loser of the rename race automatically rebases its intent
    * (append: head + added; replace: head − swapped + added) onto
    * whatever landed first. rename-if-absent IS the commit point: the
    * loser sees the destination taken, discards its temp, retries. */
  private def casCommit(fs: FileSystem, root: Path, op: String,
                        listFor: Int => Seq[String]): Int = {
    val mdir = new Path(root, "manifests")
    fs.mkdirs(mdir)
    var attempts = 0
    while (attempts < 10) {
      val head = currentVersion(fs, root)
      val all = listFor(head)
      val tmp = new Path(mdir,
        s".v${head + 1}.tmp-" + java.util.UUID.randomUUID().toString)
      val out = fs.create(tmp, /* overwrite = */ false)
      try out.write(all.mkString("\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (fs.rename(tmp, new Path(mdir, s"v${head + 1}.manifest")))
        return head + 1
      fs.delete(tmp, false)
      attempts += 1
    }
    throw new java.io.IOException(
      s"$op: lost the manifest race 10 times on $root")
  }

  /** Stage `df` into a fresh uuid'd data/txn-* dir and return its
    * root-relative file paths — invisible until a manifest lists them. */
  private def stageTxn(spark: SparkSession, fs: FileSystem, root: Path,
                       df: DataFrame): Seq[String] = {
    val txn = new Path(root,
      "data/txn-" + java.util.UUID.randomUUID().toString)
    df.write.mode("overwrite").parquet(txn.toString)
    fs.listStatus(txn).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => s"data/${txn.getName}/${st.getPath.getName}")
  }

  /** Atomically commit `df` as an APPEND transaction; returns the new
    * version. Retries the manifest CAS a bounded number of times. */
  def commitSnapshot(spark: SparkSession, table: String,
                     df: DataFrame): Int = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val added = stageTxn(spark, fs, root, df)
    casCommit(fs, root, "commitSnapshot", head =>
      (if (head == 0) Seq.empty else manifestFiles(fs, root, head)) ++
        added)
  }

  /** Read `table` as of `version` (default: newest) — manifest-listed
    * files only, never a directory listing. */
  def readSnapshot(spark: SparkSession, table: String,
                   version: Option[Int] = None): DataFrame = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = version.getOrElse(currentVersion(fs, root))
    require(v > 0, s"readSnapshot: no committed version in $table")
    val files = manifestFiles(fs, root, v)
      .map(rel => new Path(root, rel).toString)
    spark.read.parquet(files: _*)
  }

  /** Roll the table back to `version` by RE-COMMITTING its file list as
    * the new head — history is never rewritten (the bad snapshots stay
    * readable for forensics until expired), readers pinned to any
    * version are unaffected, and the operation is the same O(1)
    * manifest CAS as a normal commit. This is the production "undo the
    * bad backfill" lever: data files are immutable, so undo is just
    * pointing the head at yesterday's list. */
  def rollbackTo(spark: SparkSession, table: String, version: Int): Int = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the target is re-read INSIDE the CAS loop (listFor runs per
    // attempt): a concurrent expireSnapshots may delete the target
    // manifest (and then its now-unreferenced files) between attempts —
    // reading it fresh at each attempt means a rollback can never
    // re-commit a file list the vacuum has already decided is garbage on
    // the basis of a stale pre-sweep read. (A sweep that lands BETWEEN
    // this read and the rename is still narrowed by expireSnapshots' own
    // head re-check — see the note there.)
    casCommit(fs, root, "rollbackTo", _ =>
      manifestFiles(fs, root, version)) // throws if expired
  }

  /** OPTIMIZE as a REPLACE commit on a manifest table — the unification
    * of [[compact]]'s re-packing with the snapshot protocol (r11 verdict
    * task 1): the directory rename-swap [[compact]] publishes with would
    * yank files out from under any reader pinned to an existing version,
    * defeating the isolation guarantee the manifest layer exists for.
    * Here instead: (1) read the files of the CURRENT snapshot, (2)
    * re-pack them into ~`targetFileBytes` bins (optionally
    * range-sort-clustered) staged in a new data/txn-* dir, (3) CAS a
    * manifest whose list swaps the compacted inputs for the new files.
    * Old files are NEVER touched — pinned readers keep reading them
    * until [[expireSnapshots]] reclaims; an APPEND that lands
    * mid-compaction is rebased over (the CAS retry recomputes
    * head − inputs + outputs, so the interleaved append's files
    * survive). Cost model matches [[compact]]: one read-arrange-write
    * pass over the re-packed bytes plus one O(1) manifest rename,
    * regardless of table size. Returns (newVersion, stats). */
  def compactSnapshot(spark: SparkSession, table: String,
                      targetFileBytes: Long = 128L << 20,
                      sortBy: Seq[String] = Nil): (Int, CompactStats) = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = currentVersion(fs, root)
    require(v0 > 0, s"compactSnapshot: no committed version in $table")
    val inputs = manifestFiles(fs, root, v0)
    val bytesBefore = inputs
      .map(rel => fs.getFileStatus(new Path(root, rel)).getLen).sum
    val nOut = math.max(1L,
      (bytesBefore + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(
      inputs.map(rel => new Path(root, rel).toString): _*)
    val arranged =
      if (sortBy.nonEmpty)
        df.repartitionByRange(nOut, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      else df.coalesce(nOut)
    val added = stageTxn(spark, fs, root, arranged)
    val inputSet = inputs.toSet
    val v = casCommit(fs, root, "compactSnapshot", head =>
      manifestFiles(fs, root, head).filterNot(inputSet) ++ added)
    val bytesAfter = added
      .map(rel => fs.getFileStatus(new Path(root, rel)).getLen).sum
    (v, CompactStats(inputs.size, added.size,
      bytesBefore, bytesAfter, inputs.size))
  }

  /** URI-scheme/slash-insensitive normal form for matching
    * input_file_name() output against manifest-derived paths. */
  private def fsPathOf(p: String): String =
    new Path(p).toUri.getPath

  /** Copy-on-write row-level DELETE — the next most-used lifecycle verb
    * after append/compact (GDPR erasure, late-fact correction): rewrite
    * ONLY the files that contain matching rows, REPLACE-commit the swap.
    * Mechanics: (1) one pruned scan over the head snapshot finds the
    * affected files via input_file_name() (the predicate pushes into the
    * parquet scan, so row-group stats skip most files before any row is
    * read); (2) only those files are re-read and rewritten with the
    * predicate negated into a new txn dir; (3) the CAS commits
    * head − affected + rewritten. Untouched files keep their manifest
    * entries and are never opened for write — at 100 TB a selective
    * delete costs the affected files, not the table. The delete applies
    * to rows visible in the snapshot read at entry; an append racing
    * past the CAS is rebased over with all its rows intact (standard
    * copy-on-write semantics — a format-level conflict check would
    * abort instead; documented trade-off). Returns
    * (newVersion, filesRewritten, filesUntouched). */
  def deleteWhere(spark: SparkSession, table: String,
                  predicate: Column): (Int, Int, Int) = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = currentVersion(fs, root)
    require(v0 > 0, s"deleteWhere: no committed version in $table")
    val files = manifestFiles(fs, root, v0)
    val abs = files.map(rel => rel -> new Path(root, rel).toString)
    val affectedAbs = spark.read.parquet(abs.map(_._2): _*)
      .where(predicate)
      .select(input_file_name().as("f")).distinct()
      .collect().map(r => fsPathOf(r.getString(0))).toSet
    // qualify through the FS before normalizing: a relative table root
    // ("target/…") would otherwise never string-match the absolute URIs
    // input_file_name() reports
    val (affected, untouched) = abs.partition { case (_, a) =>
      affectedAbs.contains(fsPathOf(fs.makeQualified(new Path(a)).toString))
    }
    if (affected.isEmpty) return (v0, 0, untouched.size)
    // SQL DELETE semantics: remove rows where the predicate is TRUE —
    // rows where it evaluates NULL are KEPT (a bare !predicate would
    // drop them, silently deleting every row with a null in a predicate
    // column)
    val kept = spark.read.parquet(affected.map(_._2): _*)
      .where(!coalesce(predicate, lit(false)))
    val added = stageTxn(spark, fs, root, kept)
    val affectedSet = affected.map(_._1).toSet
    val v = casCommit(fs, root, "deleteWhere", head =>
      manifestFiles(fs, root, head).filterNot(affectedSet) ++ added)
    (v, affected.size, untouched.size)
  }

  /** Snapshot GC (VACUUM): drop manifests older than the newest
    * `keepLast`, then delete every data file + empty txn directory no
    * retained manifest references — this is what finally reclaims
    * crashed-transaction orphans and files only historical snapshots
    * used. Deletion order is the safe one: manifests first (so a
    * concurrent reader can no longer pin a doomed version), files
    * second; unreferenced txn dirs younger than `orphanOlderThanMs` are
    * spared — they may be a live commit between staging and publish
    * (pass 0 to force, tests only). Returns (#manifests, #files)
    * removed. */
  def expireSnapshots(spark: SparkSession, table: String,
                      keepLast: Int = 2,
                      orphanOlderThanMs: Long = 30L * 60 * 1000)
      : (Int, Int) = {
    require(keepLast >= 1, "must retain at least the head snapshot")
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val head = currentVersion(fs, root)
    val cutoff = head - keepLast + 1
    val expired = (1 until cutoff)
      .filter(v => fs.exists(new Path(root, s"manifests/v$v.manifest")))
    val retainedFiles = (math.max(1, cutoff) to head)
      .filter(v => fs.exists(new Path(root, s"manifests/v$v.manifest")))
      .flatMap(v => manifestFiles(fs, root, v)).toSet
    expired.foreach(v =>
      fs.delete(new Path(root, s"manifests/v$v.manifest"), false))
    // Re-check the head before the DESTRUCTIVE half: retainedFiles was
    // computed against the head read above, and a concurrent rollbackTo
    // could re-commit an expired version's file list as a NEW head after
    // that read — sweeping on the stale set would then delete files the
    // new head references. If the head moved, abort the file sweep (the
    // manifests already dropped stay dropped — removing history metadata
    // is safe; removing data files referenced by an unseen head is not)
    // and let the next scheduled sweep recompute. rollbackTo's symmetric
    // guard (re-reading its target manifest inside the CAS loop) makes a
    // rollback to an already-expired version fail fast instead of
    // resurrecting a swept file list. The two guards NARROW the race to
    // the window between this check and the sweep finishing; a rollback
    // CAS landing inside that window can still reference doomed files,
    // so — as with every snapshot-expiring table format — rollback and
    // vacuum remain operations to schedule apart, not to race.
    if (currentVersion(fs, root) != head) return (expired.size, 0)
    // a transaction's files enter one manifest together, so a txn dir is
    // either fully retained or fully garbage — sweep whole directories
    // (this also clears _SUCCESS markers and crashed-txn leftovers)
    val dataDir = new Path(root, "data")
    var removed = 0
    if (fs.exists(dataDir)) fs.listStatus(dataDir).foreach { txn =>
      if (txn.isDirectory) {
        val parquets = fs.listStatus(txn.getPath).filter(st =>
          st.isFile && st.getPath.getName.endsWith(".parquet"))
        val retained = parquets.exists(st => retainedFiles.contains(
          s"data/${txn.getPath.getName}/${st.getPath.getName}"))
        // age guard: an unreferenced dir younger than the threshold may
        // be a LIVE transaction between staging and manifest publish —
        // leave it for the next sweep (same mtime>0 object-store caveat
        // as Sketches.qSketchRollup's leaf sweep)
        val old = txn.getModificationTime > 0 &&
          txn.getModificationTime <
            System.currentTimeMillis() - orphanOlderThanMs
        if (!retained && (old || orphanOlderThanMs == 0)) {
          removed += parquets.length
          fs.delete(txn.getPath, true)
        }
      }
    }
    (expired.size, removed)
  }

  /** Two committed append transactions + one deliberately crashed one
    * (files staged, no manifest), read back at the newest snapshot. The
    * oracle — shared with q_table_roundtrip's plain directory read —
    * proves the manifest protocol loses nothing (both halves present)
    * and leaks nothing (the orphan's duplicate rows would double every
    * count if manifest-less files were visible). */
  def qManifestSnapshot(s: SparkSession, d: String): DataFrame = {
    import graft.Tables._
    val table = s"${Sources.ioDir(s, d)}/orders_snapshot"
    val root = new Path(table)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(root, true) // deterministic re-run: fresh table history
    val o = orders(s, d)
    commitSnapshot(s, table, o.where(pmod(col("o_orderkey"), lit(2)) === 0))
    commitSnapshot(s, table, o.where(pmod(col("o_orderkey"), lit(2)) === 1))
    // crashed transaction: staged files, manifest never published
    o.limit(1000).write.mode("overwrite")
      .parquet(new Path(root, "data/txn-crashed").toString)
    readSnapshot(s, table)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** OPTIMIZE-under-isolation, end to end: append the table as two
    * deliberately fragmented transactions (10 small files each — the S8
    * append cadence), REPLACE-commit a [[compactSnapshot]] sorted on the
    * key, read the head. The oracle — shared with q_table_roundtrip and
    * q_manifest_snapshot — proves the re-pack swaps file LAYOUT without
    * touching content; SnapshotIsolationSpec pins the isolation side (a
    * reader pinned to the pre-compact version still reads its files). */
  def qCompactSnapshot(s: SparkSession, d: String): DataFrame = {
    import graft.Tables._
    val table = s"${Sources.ioDir(s, d)}/orders_optimize"
    val root = new Path(table)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(root, true) // deterministic re-run: fresh table history
    val o = orders(s, d)
    commitSnapshot(s, table,
      o.where(pmod(col("o_orderkey"), lit(2)) === 0).repartition(10))
    commitSnapshot(s, table,
      o.where(pmod(col("o_orderkey"), lit(2)) === 1).repartition(10))
    compactSnapshot(s, table, sortBy = Seq("o_orderkey"))
    readSnapshot(s, table)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** Copy-on-write DELETE, end to end: two append transactions split the
    * table by orderkey parity, then [[deleteWhere]] removes one
    * status-slice of the ODD half — so the even transaction's files
    * contain no matching row and must survive untouched (pinned by
    * SnapshotIsolationSpec), while the odd files are rewritten minus the
    * slice. The oracle recomputes the post-delete aggregate from source
    * with the negated predicate: hash-equality proves the rewrite
    * removed exactly the predicate's rows and nothing else. */
  def qSnapshotDelete(s: SparkSession, d: String): DataFrame = {
    import graft.Tables._
    val table = s"${Sources.ioDir(s, d)}/orders_cow_delete"
    val root = new Path(table)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(root, true) // deterministic re-run: fresh table history
    val o = orders(s, d)
    commitSnapshot(s, table, o.where(pmod(col("o_orderkey"), lit(2)) === 0))
    commitSnapshot(s, table, o.where(pmod(col("o_orderkey"), lit(2)) === 1))
    deleteWhere(s, table,
      pmod(col("o_orderkey"), lit(2)) === 1 && col("o_orderstatus") === "F")
    readSnapshot(s, table)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy("o_orderstatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_manifest_snapshot" -> qManifestSnapshot _,
    "q_compact_snapshot"  -> qCompactSnapshot _,
    "q_snapshot_delete"   -> qSnapshotDelete _,
  )

  val oracleSql: Map[String, String] = Map(
    // SHARED with q_table_roundtrip (same output shape, same semantics):
    // the DuckDB gate thereby proves snapshot read ≡ plain table read
    "q_manifest_snapshot" -> Sources.oracleSql("q_table_roundtrip"),
    // also shared: compaction must swap layout, never content
    "q_compact_snapshot"  -> Sources.oracleSql("q_table_roundtrip"),
    // post-delete state recomputed from source with the negated predicate
    "q_snapshot_delete" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE NOT (o_orderkey % 2 = 1 AND o_orderstatus = 'F')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
