package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins metadata-only layout evolution ([[ops.Layout.evolveLayout]] /
  * `CALL system.evolve_layout`, r20) — the zero-rewrite answer to
  * relayout's strict replace: the props swap is one commit, stale
  * placements can never key or prune under the new spec, mixed-state
  * snapshots degrade to the UNKEYED scan (sound, never wrong), and one
  * ordinary compaction restores SPJ keying. The q_evolve_layout oracle
  * proves state preservation; this spec pins the plan-level semantics
  * the aggregate can't see. */
class LayoutEvolveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import ops.Layout._

  private def physLines(table: String): Seq[String] =
    ops.Layout.manifestLinesOf(spark, table,
      ops.Layout.currentVersion(
        new Path(table).getFileSystem(
          spark.sparkContext.hadoopConfiguration), new Path(table)))

  test("evolve bucket(4) -> bucket(8): zero rewrite, sound mixed state, " +
      "compaction restores keying") {
    import spark.implicits._
    val table = "target/graft_io/spec/evolve_bucket"
    dropTable(spark, table)
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = (0L until 400L).map(i => (i, i * 1.0)).toDF("id", "v")
    commitSnapshot(spark, table, rows.where(col("id") < 200),
      props = Map(BucketByProp -> "id", BucketCountProp -> "4"))
    // keyed under bucket(4) before evolution
    assert(spjFileKeys(spark, table, currentVersion(fs, root))
      .exists(_._1 == SpjBucket("id", 4)))
    val before = physLines(table)
    val mtimes = before.map { l =>
      val p = l.takeWhile(c => c != '\t' && c != '@')
      p -> fs.getFileStatus(new Path(root, p)).getModificationTime
    }.toMap

    val vEv = evolveLayout(spark, table, bucketBy = Some("id"),
      bucketCount = Some(8))
    // metadata-only: same lines, no data file touched
    assert(physLines(table).toSet == before.toSet,
      "evolveLayout must not add, drop, or rewrite any manifest line")
    mtimes.foreach { case (p, m) =>
      assert(fs.getFileStatus(new Path(root, p))
        .getModificationTime == m, s"evolveLayout rewrote $p")
    }
    assert(tableProps(spark, table).get(BucketCountProp).contains("8"))
    // mixed spec does NOT key — the old files lack the bucket(8) group
    assert(spjFileKeys(spark, table, vEv).isEmpty,
      "a mixed-spec snapshot must degrade to the unkeyed scan")

    // ingest continues under the NEW spec: new files carry bucket(8)
    // groups, old ones keep bucket(4)
    commitSnapshot(spark, table, rows.where(col("id") >= 200))
    val lines = physLines(table)
    assert(lines.exists(_.contains("#bucket:4:id")) &&
      lines.exists(_.contains("#bucket:8:id")),
      s"expected both specs' groups in the mixed manifest")
    // reads stay exact through the mixed state, pruned or not
    assert(readSnapshot(spark, table).count() == 400)
    assert(readSnapshotWhere(spark, table,
      Seq(SkipRange("id", 42, 42))).count() == 1)
    assert(readSnapshotWhere(spark, table,
      Seq(SkipRange("id", 300, 300))).count() == 1)

    // ordinary maintenance re-places everything: keying returns
    compactSnapshot(spark, table)
    val head = currentVersion(fs, root)
    assert(spjFileKeys(spark, table, head)
      .exists(_._1 == SpjBucket("id", 8)),
      "post-compaction the snapshot must key under the evolved spec")
    assert(!physLines(table).exists(_.contains("#bucket:4:id")),
      "compaction must retire the old spec's groups")
    assert(readSnapshot(spark, table).count() == 400)
  }

  test("evolve identity -> bucket and bucket -> flat; guards hold") {
    import spark.implicits._
    val table = "target/graft_io/spec/evolve_ident"
    dropTable(spark, table)
    val rows = (0L until 100L).map(i => (i % 5, i, i * 1.0))
      .toDF("part", "id", "v")
    commitSnapshot(spark, table, rows,
      props = Map(PartitionedByProp -> "part",
        StatsColumnsProp -> "part,id"))
    // identity -> bucket: declared layout flips, reads exact
    evolveLayout(spark, table, bucketBy = Some("id"),
      bucketCount = Some(4))
    val props = tableProps(spark, table)
    assert(props.get(BucketByProp).contains("id") &&
      !props.contains(PartitionedByProp))
    assert(readSnapshot(spark, table).count() == 100)
    // bucket -> flat: empty arguments drop the layout props
    evolveLayout(spark, table)
    val flat = tableProps(spark, table)
    assert(!flat.contains(BucketByProp) && !flat.contains(BucketCountProp))
    assert(readSnapshot(spark, table).count() == 100)
    // guards: unknown column; ALTER TBLPROPERTIES stays refused (the
    // r18 immutability — evolve/relayout are the two deliberate doors)
    val e = intercept[IllegalArgumentException] {
      evolveLayout(spark, table, bucketBy = Some("nope"),
        bucketCount = Some(4))
    }
    assert(e.getMessage.contains("unknown column"), e.getMessage)
    val e2 = intercept[Exception] {
      setTableProps(spark, table, Map(BucketByProp -> "id"), Nil)
    }
    assert(e2.getMessage.toLowerCase.contains("relayout"), e2.getMessage)
  }
}
