package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the manifest snapshot protocol ([[ops.Layout.commitSnapshot]] /
  * [[ops.Layout.readSnapshot]]) beyond the q_manifest_snapshot oracle:
  * version pinning (a reader at v1 is untouched by a later commit),
  * orphan invisibility (staged files without a manifest never surface),
  * and the CAS commit point (temp manifests never linger). */
class SnapshotIsolationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("snapshot reads pin a version; orphans stay invisible") {
    import ops.Layout._
    val table = "target/graft_io/spec/nation_snapshot"
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)

    val n = Tables.nation(spark, sf)
    val half1 = n.where(col("n_nationkey") < 12)
    val half2 = n.where(col("n_nationkey") >= 12)
    val v1 = commitSnapshot(spark, table, half1)
    assert(v1 == 1)

    // reader pinned BEFORE the second commit
    val c1 = readSnapshot(spark, table, Some(v1)).count()
    val v2 = commitSnapshot(spark, table, half2)
    assert(v2 == 2)
    // the pinned version still answers with the frozen table
    assert(readSnapshot(spark, table, Some(v1)).count() == c1)
    assert(readSnapshot(spark, table).count() == n.count())

    // a crashed transaction stages files but never publishes a manifest:
    // invisible at every version, including the newest
    half1.write.mode("overwrite")
      .parquet(new Path(root, "data/txn-crashed").toString)
    assert(readSnapshot(spark, table).count() == n.count(),
      "orphan files leaked into the snapshot read")

    // the CAS commit leaves no temp manifests behind
    val stray = fs.listStatus(new Path(root, "manifests"))
      .map(_.getPath.getName).filterNot(_.matches("""v\d+\.manifest"""))
    assert(stray.isEmpty, s"stray manifest files: ${stray.mkString(",")}")

    // rollback re-commits v1's list as v3: head answers like v1, and the
    // "bad" v2 stays readable for forensics until expired
    val v3 = rollbackTo(spark, table, v1)
    assert(v3 == 3)
    assert(readSnapshot(spark, table).count() == c1)
    assert(readSnapshot(spark, table, Some(v2)).count() == n.count())

    // VACUUM keeping the last 2 snapshots (v2, v3): v1's manifest goes,
    // but its FILES survive because v3 still references them; the
    // crashed txn's orphans are finally reclaimed (age guard forced off)
    val (ms, fsRemoved) = expireSnapshots(spark, table, keepLast = 2,
      orphanOlderThanMs = 0)
    assert(ms == 1, s"expected 1 expired manifest, got $ms")
    assert(fsRemoved > 0, "crashed-txn orphans were not reclaimed")
    assert(readSnapshot(spark, table).count() == c1)
    assert(readSnapshot(spark, table, Some(v2)).count() == n.count(),
      "a retained snapshot lost files to the sweep")
  }

  test("racing commits both land through the rename CAS, nothing lost") {
    import ops.Layout._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val table = "target/graft_io/spec/region_snapshot_race"
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    val r = Tables.region(spark, sf)
    // two writers commit disjoint halves CONCURRENTLY: the loser of the
    // v1 rename must retry as v2 on the re-read head — serialized
    // append-only history, no lost update, regardless of who wins
    val fa = Future(commitSnapshot(spark, table,
      r.where(col("r_regionkey") < 2)))
    val fb = Future(commitSnapshot(spark, table,
      r.where(col("r_regionkey") >= 2)))
    val versions = Seq(Await.result(fa, 120.seconds),
      Await.result(fb, 120.seconds)).sorted
    assert(versions == Seq(1, 2),
      s"expected serialized versions 1,2 — got $versions")
    assert(readSnapshot(spark, table).count() == r.count(),
      "a racing commit's rows were lost")
  }
}
