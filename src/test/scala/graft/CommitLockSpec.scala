package graft

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** An object-store stand-in: local files under a NON-`file` scheme, so
  * [[ops.Layout.publishNoReplace]] takes the rename branch — and
  * RawLocalFileSystem's rename is POSIX rename(2), which silently
  * REPLACES an existing destination. That is exactly the copy+delete
  * overwrite semantics of S3A rename, reproduced deterministically on
  * local disk. */
class ObjstFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("objst:///")
  override def getScheme: String = "objst"

  /** Conditional create must be ATOMIC, like an object store's
    * If-None-Match PUT (the primitive the lockfile arbiter leans on).
    * RawLocalFileSystem's no-overwrite create is a non-atomic
    * exists-check-then-open — a java-level artifact, not a property of
    * either POSIX (O_CREAT|O_EXCL is atomic) or S3 conditional writes —
    * so reproduce the store semantics with a CREATE_NEW open. */
  private def atomicCreate(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    val file = pathToFile(f)
    val parent = file.getParentFile
    if (parent != null) parent.mkdirs()
    val ch = java.nio.channels.FileChannel.open(file.toPath,
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    new org.apache.hadoop.fs.FSDataOutputStream(
      java.nio.channels.Channels.newOutputStream(ch), null)
  }

  // both concrete overloads RawLocalFileSystem exposes — FileSystem's
  // convenience create(path, overwrite) chains into the non-permission
  // one, so overriding only the permission variant misses that path
  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    else atomicCreate(f)

  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize,
        progress)
    else atomicCreate(f)
}

/** Pins the `graft.commit.lockfile` arbiter (Layout.acquireCommitLock):
  * (1) the residual window it exists to close — on an overwriting-rename
  * store, a second publish to an occupied destination "succeeds" and
  * silently replaces the first writer's manifest; (2) with the lock on,
  * racing commits through the real verbs serialize and no update is
  * lost; (3) crashed-holder locks break by staleness; (4) live locks
  * block acquisition until release; (5) acquisition fails loudly on
  * timeout rather than spinning forever. */
class CommitLockSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hconf = spark.sparkContext.hadoopConfiguration

  // fresh FS instance per lookup so per-test conf (lock on/off, stale,
  // timeout) is honored instead of the first-get cached instance
  private def enableObjst(): Unit = {
    hconf.set("fs.objst.impl", classOf[ObjstFileSystem].getName)
    hconf.set("fs.objst.impl.disable.cache", "true")
  }

  private def freshTable(name: String): String = {
    enableObjst()
    val local = new java.io.File(s"target/graft_io/spec/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(local)
    "objst:" + local.getAbsolutePath
  }

  private def readManifest(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("overwriting rename opens the residual window the lock closes") {
    val table = freshTable("lock_window")
    val root = new Path(table)
    val fs = root.getFileSystem(hconf)
    val mdir = new Path(root, "manifests")
    fs.mkdirs(mdir)
    def stage(name: String, body: String): Path = {
      val p = new Path(mdir, name)
      val out = fs.create(p, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      p
    }
    val dst = new Path(mdir, "v1.manifest")
    // writer A publishes v1 and verifies its own bytes — it believes
    // (correctly, for now) that it committed
    assert(ops.Layout.publishNoReplace(fs, stage(".tmpA", "#commit\tA"), dst))
    assert(readManifest(fs, dst) == "#commit\tA")
    // writer B, racing from the same head, publishes the same version:
    // on an overwriting-rename store this ALSO returns true and A's
    // manifest is silently replaced — the lost-update window. (On
    // `file:` the link(2) arbiter returns false here; on HDFS the
    // rename refuses. This store has neither primitive.)
    assert(ops.Layout.publishNoReplace(fs, stage(".tmpB", "#commit\tB"), dst),
      "expected the overwriting store to accept the second publish — " +
        "if this fails the stand-in no longer reproduces object-store " +
        "rename semantics and the spec needs a new one")
    assert(readManifest(fs, dst) == "#commit\tB",
      "writer A's committed manifest should have been silently replaced")
  }

  test("lockfile serializes racing commits on the overwriting store") {
    val table = freshTable("lock_race")
    hconf.set("graft.commit.lockfile", "true")
    try {
      import spark.implicits._
      val writers = 4
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (0 until writers).map { i =>
        new Thread(() => {
          try {
            val df = Seq((i.toLong, s"writer$i")).toDF("id", "tag")
            ops.Layout.commitSnapshot(spark, table, df)
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"commit failed: ${errs.peek()}")
      val root = new Path(table)
      val fs = root.getFileSystem(hconf)
      // every commit landed its own version — nothing overwrote anything
      assert(ops.Layout.currentVersion(fs, root) == writers)
      assert(ops.Layout.readSnapshot(spark, table).count() == writers,
        "a racing commit was lost despite the lockfile arbiter")
      // the lock never outlives a commit
      assert(!fs.exists(new Path(root, "manifests/_commit.lock")))
    } finally hconf.unset("graft.commit.lockfile")
  }

  test("mixed append+compact race under the lock loses nothing") {
    val table = freshTable("lock_mixed")
    hconf.set("graft.commit.lockfile", "true")
    try {
      import spark.implicits._
      // seed two small files so the compactor has inputs
      ops.Layout.commitSnapshot(spark, table,
        Seq((100L, "seed0")).toDF("id", "tag"))
      ops.Layout.commitSnapshot(spark, table,
        Seq((101L, "seed1")).toDF("id", "tag"))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val appenders = (0 until 3).map { i =>
        new Thread(() => {
          try ops.Layout.commitSnapshot(spark, table,
            Seq((i.toLong, s"app$i")).toDF("id", "tag"))
          catch { case t: Throwable => errs.add(t) }
        })
      }
      val compactor = new Thread(() => {
        // appends never swap the compactor's input lines out, so the
        // REPLACE rebases across them — a conflict abort here would be
        // a bug, not an acceptable outcome
        try ops.Layout.compactSnapshot(spark, table)
        catch { case t: Throwable => errs.add(t) }
      })
      (appenders :+ compactor).foreach(_.start())
      (appenders :+ compactor).foreach(_.join())
      assert(errs.isEmpty, s"racing verb failed: ${errs.peek()}")
      val rows = ops.Layout.readSnapshot(spark, table)
        .orderBy("id").collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(0L, 1L, 2L, 100L, 101L),
        s"lost rows across the append+compact race: $rows")
      val root = new Path(table)
      val fs = root.getFileSystem(hconf)
      assert(ops.Layout.currentVersion(fs, root) == 6,
        "2 seeds + 3 appends + 1 compact = 6 versions")
      assert(!fs.exists(new Path(root, "manifests/_commit.lock")))
    } finally hconf.unset("graft.commit.lockfile")
  }

  test("a crashed writer's stale lock is broken, not waited out") {
    val table = freshTable("lock_stale")
    hconf.set("graft.commit.lockfile", "true")
    hconf.set("graft.commit.lockfile.stale.ms", "100")
    try {
      import spark.implicits._
      val root = new Path(table)
      val fs = root.getFileSystem(hconf)
      val mdir = new Path(root, "manifests")
      fs.mkdirs(mdir)
      val lock = new Path(mdir, "_commit.lock")
      val out = fs.create(lock, false)
      try out.write("crashed-writer".getBytes("UTF-8")) finally out.close()
      fs.setTimes(lock, System.currentTimeMillis() - 600000L, -1)
      val df = Seq((1L, "x")).toDF("id", "tag")
      assert(ops.Layout.commitSnapshot(spark, table, df) == 1,
        "the stale lock should have been broken and the commit made")
    } finally {
      hconf.unset("graft.commit.lockfile")
      hconf.unset("graft.commit.lockfile.stale.ms")
    }
  }

  test("a live lock blocks acquisition until its holder releases") {
    val table = freshTable("lock_live")
    hconf.set("graft.commit.lockfile", "true")
    try {
      import spark.implicits._
      val root = new Path(table)
      val fs = root.getFileSystem(hconf)
      val mdir = new Path(root, "manifests")
      fs.mkdirs(mdir)
      val lock = new Path(mdir, "_commit.lock")
      val out = fs.create(lock, false)
      try out.write("live-holder".getBytes("UTF-8")) finally out.close()
      val releaser = new Thread(() => {
        Thread.sleep(400); fs.delete(lock, false)
      })
      releaser.start()
      val t0 = System.nanoTime()
      val df = Seq((1L, "x")).toDF("id", "tag")
      assert(ops.Layout.commitSnapshot(spark, table, df) == 1)
      releaser.join()
      assert((System.nanoTime() - t0) / 1e6 >= 300,
        "the commit should have waited for the live lock's release")
    } finally hconf.unset("graft.commit.lockfile")
  }

  test("a refreshed lock identity resets the stale clock — fresh locks are never broken") {
    // The r15 advice race: waiter A observes holder X stale; waiter B
    // breaks X and create-acquires a FRESH lock; A's delayed delete then
    // removed B's live lock — two holders. The fix keys breaking on lock
    // IDENTITY (the UUID in the file) aged on the waiter's own clock:
    // swapping in a new identity mid-wait must restart the stale timer,
    // and a backdated mtime (the old trigger) must be ignored entirely.
    val table = freshTable("lock_identity")
    hconf.set("graft.commit.lockfile", "true")
    try {
      val root = new Path(table)
      val fs = root.getFileSystem(hconf)
      val mdir = new Path(root, "manifests")
      fs.mkdirs(mdir)
      val lock = new Path(mdir, "_commit.lock")
      def writeLock(uuid: String): Unit = {
        val out = fs.create(lock, true)
        try out.write(uuid.getBytes("UTF-8")) finally out.close()
        // backdate far past stale.ms: the OLD mtime-keyed breaker would
        // delete this instantly; the identity watcher must not care
        fs.setTimes(lock, System.currentTimeMillis() - 600000L, -1)
      }
      // Phase 1 — mtime is no longer a break trigger: a lock whose
      // mtime says "ancient" but whose identity hasn't been WATCHED for
      // stale.ms cannot be broken; with timeout < stale the acquisition
      // must time out (the old code succeeded in ~25 ms here).
      hconf.set("graft.commit.lockfile.stale.ms", "5000")
      hconf.set("graft.commit.lockfile.timeout.ms", "300")
      writeLock("holder-A")
      val e = intercept[java.io.IOException] {
        ops.Layout.acquireCommitLock(fs, mdir)
      }
      assert(e.getMessage.contains("timed out"),
        s"expected a timeout, got: ${e.getMessage}")
      // Phase 2 — swapping in a NEW identity mid-wait restarts the stale
      // clock: A would age out at ~500 ms, but B replaces it at ~150 ms,
      // so acquisition can only succeed after B ages (~150+500 ms). The
      // old code would have acquired immediately off A's ancient mtime.
      hconf.set("graft.commit.lockfile.stale.ms", "500")
      hconf.set("graft.commit.lockfile.timeout.ms", "5000")
      writeLock("holder-A")
      val t0 = System.nanoTime()
      @volatile var swapMs = -1.0
      val swapper = new Thread(() => {
        Thread.sleep(150)
        writeLock("holder-B")
        swapMs = (System.nanoTime() - t0) / 1e6
      })
      swapper.start()
      val acquired = ops.Layout.acquireCommitLock(fs, mdir)
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      swapper.join()
      assert(acquired.lock == lock)
      assert(elapsedMs >= 500,
        f"a never-watched identity was broken after only $elapsedMs%.0f " +
          "ms — breaking is keyed on something other than watched age")
      // when the swap landed mid-wait (the normal schedule), the fresh
      // identity must have been aged from ITS arrival, not A's
      if (swapMs > 0 && swapMs < elapsedMs)
        assert(elapsedMs >= swapMs + 400,
          f"B arrived at $swapMs%.0f ms but the lock broke at " +
            f"$elapsedMs%.0f ms — the swap did not restart the clock")
      acquired.close()
      assert(!fs.exists(lock),
        "close() must release a still-owned lock")
    } finally {
      hconf.unset("graft.commit.lockfile")
      hconf.unset("graft.commit.lockfile.stale.ms")
      hconf.unset("graft.commit.lockfile.timeout.ms")
    }
  }

  test("acquisition times out loudly when a fresh lock never releases") {
    val table = freshTable("lock_timeout")
    hconf.set("graft.commit.lockfile", "true")
    hconf.set("graft.commit.lockfile.timeout.ms", "300")
    try {
      import spark.implicits._
      val root = new Path(table)
      val fs = root.getFileSystem(hconf)
      val mdir = new Path(root, "manifests")
      fs.mkdirs(mdir)
      val out = fs.create(new Path(mdir, "_commit.lock"), false)
      try out.write("immortal".getBytes("UTF-8")) finally out.close()
      val df = Seq((1L, "x")).toDF("id", "tag")
      val e = intercept[java.io.IOException] {
        ops.Layout.commitSnapshot(spark, table, df)
      }
      assert(e.getMessage.contains("commit-lock acquisition timed out"))
    } finally {
      hconf.unset("graft.commit.lockfile")
      hconf.unset("graft.commit.lockfile.timeout.ms")
    }
  }

  test("lease renewal keeps a LIVE holder unbroken past stale.ms") {
    // r16 advice: the in-lock span of a constrained commit can exceed
    // stale.ms, and an unrenewed identity would be aged out and broken
    // while the holder is still live. With the lease renewer, a waiter
    // watching the lock must NEVER see one identity sit unchanged for
    // stale.ms — so with timeout > stale it still times out rather than
    // breaking the live holder.
    val table = freshTable("lock_lease")
    hconf.set("graft.commit.lockfile", "true")
    hconf.set("graft.commit.lockfile.stale.ms", "400")
    hconf.set("graft.commit.lockfile.timeout.ms", "1200")
    try {
      val root = new Path(table)
      val fs = root.getFileSystem(hconf)
      val mdir = new Path(root, "manifests")
      fs.mkdirs(mdir)
      val lease = ops.Layout.acquireCommitLock(fs, mdir)
      try {
        // the waiter watches for 1200 ms — 3× stale.ms. Pre-lease it
        // would break the holder at ~400 ms and acquire; now every
        // ~133 ms renewal restarts its clock and it must time out.
        val e = intercept[java.io.IOException] {
          ops.Layout.acquireCommitLock(fs, mdir)
        }
        assert(e.getMessage.contains("timed out"),
          s"waiter broke a live, renewing holder: ${e.getMessage}")
      } finally lease.close()
      assert(!fs.exists(new Path(mdir, "_commit.lock")),
        "close() must release the renewed lock")
    } finally {
      hconf.unset("graft.commit.lockfile")
      hconf.unset("graft.commit.lockfile.stale.ms")
      hconf.unset("graft.commit.lockfile.timeout.ms")
    }
  }

  test("release and renewal are identity-conditional after a break") {
    // If a stalled holder WAS broken and a new holder's lock is in
    // place, the old lease's close() must not delete it, and its
    // renewer must not overwrite it.
    val table = freshTable("lock_lease_cond")
    hconf.set("graft.commit.lockfile", "true")
    // stale.ms default (60 s) → renewal every 20 s: no renewal fires
    // during this test, we exercise only the close() path
    try {
      val root = new Path(table)
      val fs = root.getFileSystem(hconf)
      val mdir = new Path(root, "manifests")
      fs.mkdirs(mdir)
      val lock = new Path(mdir, "_commit.lock")
      val lease = ops.Layout.acquireCommitLock(fs, mdir)
      // simulate: a waiter deemed us stalled, broke the lock, and a new
      // holder acquired — the file now carries a foreign identity
      val out = fs.create(lock, true)
      try out.write("new-holder".getBytes("UTF-8")) finally out.close()
      lease.close()
      val in = fs.open(lock)
      val left = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      assert(left == "new-holder",
        "close() deleted or clobbered another holder's live lock")
    } finally hconf.unset("graft.commit.lockfile")
  }
}
