package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Zero-copy shallow clone (r18): `CALL system.clone(src, dst)` commits
  * dst's v1 whose lines reference src's files by absolute path — no
  * data movement. Pins: clone ≡ source at clone time; divergence both
  * ways (appends and COW deletes on the clone never touch the source);
  * stats groups carry (the clone prunes); the clone's vacuum never
  * sweeps source files; refusals (existing target, dv-carrying src). */
class CloneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val wh = "target/graft_io/spec/clone_catalog"
  private def cat = sql.GraftSql.catalogFor(spark, wh)

  private def count(t: String): Long =
    spark.sql(s"SELECT COUNT(*) FROM $t").head.getLong(0)

  test("clone ≡ source, then diverges independently both ways") {
    val c = cat
    val src = s"$c.default.cl_src"
    val dst = s"$c.default.cl_dst"
    spark.sql(s"DROP TABLE IF EXISTS $src")
    spark.sql(s"DROP TABLE IF EXISTS $dst")
    spark.sql(s"""CREATE TABLE $src (k BIGINT, v DOUBLE)
                |TBLPROPERTIES ('graft.stats.columns' = 'k')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $src SELECT id, id * 1.0 FROM range(0, 100)")
    val v = spark.sql(
      s"CALL $c.system.clone('default.cl_src', 'default.cl_dst')")
      .head.getInt(0)
    assert(v == 1, s"clone commits the target's v1, got $v")
    assert(count(dst) == 100, "clone must read the source's files")
    assert(spark.sql(s"SELECT CAST(SUM(v) AS BIGINT) FROM $dst")
      .head.getLong(0) ==
      spark.sql(s"SELECT CAST(SUM(v) AS BIGINT) FROM $src")
      .head.getLong(0))
    // clone-side append: local files, source untouched
    spark.sql(s"INSERT INTO $dst SELECT id, 0.0 FROM range(100, 150)")
    assert(count(dst) == 150 && count(src) == 100)
    // clone-side COW delete: rewrites absolute source lines into local
    // files — the source's data must stay byte-identical
    spark.sql(s"DELETE FROM $dst WHERE k < 10")
    assert(count(dst) == 140 && count(src) == 100)
    // stats groups carried: a bounds predicate prunes on the clone
    val dstDir = s"$wh/default/cl_dst"
    val (kept, total) = ops.Layout.fileSelection(spark, dstDir,
      Seq(ops.Layout.SkipRange("k", 120L, 125L)))
    assert(total > 1 && kept.size < total,
      s"clone must prune via carried bounds ($kept of $total)")
  }

  test("the clone's vacuum never sweeps source files") {
    val c = cat
    val src = s"$c.default.cl_gc_src"
    val dst = s"$c.default.cl_gc_dst"
    spark.sql(s"DROP TABLE IF EXISTS $src")
    spark.sql(s"DROP TABLE IF EXISTS $dst")
    spark.sql(s"CREATE TABLE $src (k BIGINT)")
    spark.sql(s"INSERT INTO $src SELECT id FROM range(0, 50)")
    spark.sql(s"CALL $c.system.clone('default.cl_gc_src', 'default.cl_gc_dst')")
    spark.sql(s"INSERT INTO $dst SELECT id FROM range(50, 60)")
    spark.sql(s"INSERT INTO $dst SELECT id FROM range(60, 70)")
    // aggressive sweep on the CLONE: only its own data dir is in scope
    ops.Layout.expireSnapshots(spark, s"$wh/default/cl_gc_dst",
      keepLast = 1, orphanOlderThanMs = 0)
    assert(count(dst) == 70, "clone intact after its own vacuum")
    assert(count(src) == 50, "source intact after the clone's vacuum")
  }

  test("clone of a constraint-carrying source runs zero jobs (O(manifest))") {
    // r18 ADVICE (medium): the commit gate saw the adopted lines as
    // "new" (prior head 0) and re-proved the source's CHECK constraints
    // by re-reading the entire table — the zero-copy clone was O(data).
    // The adopted snapshot was already gated at source-commit time, so
    // the clone commits ungated; the proof is job-count zero.
    val c = cat
    val src = s"$c.default.cl_gated_src"
    val dst = s"$c.default.cl_gated_dst"
    spark.sql(s"DROP TABLE IF EXISTS $src")
    spark.sql(s"DROP TABLE IF EXISTS $dst")
    spark.sql(s"""CREATE TABLE $src (k BIGINT, v DOUBLE)
                |TBLPROPERTIES ('graft.constraint.pos' = 'v >= 0')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $src SELECT id, id * 1.0 FROM range(500)")
    val sc = spark.sparkContext
    import java.util.concurrent.atomic.AtomicInteger
    val cloned = new AtomicInteger
    val drained = new AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (g == "clone-gate-check") cloned.incrementAndGet()
        if (g == "clone-gate-drain") drained.incrementAndGet()
      }
    }
    sc.addSparkListener(l)
    try {
      sc.setJobGroup("clone-gate-check", "clone must schedule no jobs")
      try spark.sql(s"CALL $c.system.clone('default.cl_gated_src', " +
        "'default.cl_gated_dst')")
      finally sc.clearJobGroup()
      // ordered listener bus: once the drain job's event arrives, any
      // job the clone scheduled would have too (the statusTracker read
      // alone races the async bus)
      sc.setJobGroup("clone-gate-drain", "bus drain marker")
      try sc.parallelize(1 to 1, 1).count()
      finally sc.clearJobGroup()
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      while (drained.get == 0 && System.nanoTime < deadline)
        Thread.sleep(20)
      assert(drained.get > 0, "listener bus never delivered the drain")
      assert(cloned.get == 0,
        s"clone scheduled ${cloned.get} job(s) — it re-read the source")
    } finally sc.removeSparkListener(l)
    // the clone still carries the constraint and enforces it on ITS
    // own future writes
    assert(count(dst) == 500)
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $dst VALUES (9999, -1.0)")
    }
    assert(e.getMessage.contains("pos"), e.getMessage)
    assert(count(dst) == 500)
  }

  test("refusals: existing target, dv-carrying source") {
    val c = cat
    val src = s"$c.default.cl_r_src"
    spark.sql(s"DROP TABLE IF EXISTS $src")
    spark.sql(s"DROP TABLE IF EXISTS $c.default.cl_r_dst")
    spark.sql(s"""CREATE TABLE $src (k BIGINT)
                |TBLPROPERTIES ('graft.rowlevel.mode' = 'mor')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $src SELECT id FROM range(0, 20)")
    spark.sql(s"CALL $c.system.clone('default.cl_r_src', 'default.cl_r_dst')")
    val e1 = intercept[Exception] {
      spark.sql(s"CALL $c.system.clone('default.cl_r_src', 'default.cl_r_dst')")
    }
    assert(e1.getMessage.contains("already has committed versions"),
      e1.getMessage)
    spark.sql(s"DELETE FROM $src WHERE k = 3") // MOR: leaves a dv
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $c.system.clone('default.cl_r_src', 'default.cl_r_dst2')")
    }
    assert(e2.getMessage.contains("deletion vectors"), e2.getMessage)
  }
}
