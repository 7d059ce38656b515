package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the row-level SQL surface ([[graft.sql.GraftRowLevel]]):
  * `MERGE INTO` / `UPDATE` / subquery-`DELETE` on graft-manifest tables
  * through Spark's group-based rewrite — semantics against hand-computed
  * expectations, copy-on-write GROUP PRUNING (untouched files must carry
  * by manifest line, never rewrite), and snapshot history staying
  * readable behind the rewrite. */
class GraftRowLevelSpec extends AnyFunSuite {

  private val wh = "target/graft_io/spec/rowlevel_wh"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.graftrl", "graft.sql.GraftCatalog")
    s.conf.set("spark.sql.catalog.graftrl.warehouse", wh)
    val p = new Path(wh)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    s
  }

  private def tablePath(name: String) = s"$wh/default/$name"

  /** CREATE + three single-file INSERT commits with disjoint key ranges
    * — three file-groups whose fate under each command is decidable. */
  private def makeTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graftrl.default.$name")
    spark.sql(s"""CREATE TABLE graftrl.default.$name
                 |  (k BIGINT, v STRING, amt DOUBLE)""".stripMargin)
    Seq((0, 100), (100, 200), (200, 300)).foreach { case (lo, hi) =>
      spark.sql(
        s"""INSERT INTO graftrl.default.$name
           |SELECT /*+ REPARTITION(1) */ id AS k,
           |  concat('v', id) AS v, CAST(id AS DOUBLE) AS amt
           |FROM range($lo, $hi)""".stripMargin)
    }
  }

  private def snapFiles(name: String): Seq[String] =
    ops.Layout.snapshotLayout(spark, tablePath(name), None)._1

  private def rowsOf(name: String): Map[Long, (String, Double)] =
    spark.sql(s"SELECT k, v, amt FROM graftrl.default.$name")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap

  /** Same three-group table, but merge-on-read: row-level SQL must take
    * the DELTA path (position deletes + appends, zero file rewrites). */
  private def makeMorTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graftrl.default.$name")
    spark.sql(s"""CREATE TABLE graftrl.default.$name
                 |  (k BIGINT, v STRING, amt DOUBLE)
                 |TBLPROPERTIES ('graft.rowlevel.mode' = 'mor')"""
      .stripMargin)
    Seq((0, 100), (100, 200), (200, 300)).foreach { case (lo, hi) =>
      spark.sql(
        s"""INSERT INTO graftrl.default.$name
           |SELECT /*+ REPARTITION(1) */ id AS k,
           |  concat('v', id) AS v, CAST(id AS DOUBLE) AS amt
           |FROM range($lo, $hi)""".stripMargin)
    }
  }

  test("MOR MERGE/UPDATE/DELETE: delta path, zero data-file rewrites, exact state") {
    val t = "mor_delta"
    makeMorTable(t)
    val before = snapFiles(t).toSet
    // MERGE: update k in [50,60), delete k in [150,160), insert 1000-1004
    spark.sql(
      s"""MERGE INTO graftrl.default.$t AS t
         |USING (SELECT id AS k, concat('u', id) AS v,
         |         CAST(id * 10 AS DOUBLE) AS amt
         |       FROM range(50, 60)
         |       UNION ALL
         |       SELECT id, 'x', 0.0 FROM range(150, 160)
         |       UNION ALL
         |       SELECT id, concat('n', id), CAST(id AS DOUBLE)
         |       FROM range(1000, 1005)) AS s
         |ON t.k = s.k
         |WHEN MATCHED AND s.v = 'x' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
         |WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)
         |""".stripMargin)
    val after = snapFiles(t).toSet
    assert(before.subsetOf(after),
      "MOR MERGE rewrote or dropped a pre-merge data file")
    assert(after.size > before.size, "no appended merge output")
    val m = rowsOf(t)
    assert(m.size == 300 - 10 + 5)
    assert(m(55L) == ("u55", 550.0), s"update missed: ${m(55L)}")
    assert(!m.contains(155L), "delete missed")
    assert(m(1002L) == ("n1002", 1002.0), "insert missed")
    assert(m(42L) == ("v42", 42.0), "untouched row changed")
    // UPDATE over a dv'd file: ordinals must be TRUE file ordinals, so a
    // second update of already-updated rows (and of never-touched rows
    // in the same file) hits exactly the intended rows
    spark.sql(
      s"""UPDATE graftrl.default.$t SET amt = amt + 1
         |WHERE k >= 52 AND k <= 54 OR k = 70""".stripMargin)
    assert(snapFiles(t).toSet.intersect(before) == before,
      "MOR UPDATE rewrote a data file")
    val m2 = rowsOf(t)
    assert(m2(53L) == ("u53", 531.0) && m2(70L) == ("v70", 71.0),
      s"${m2(53L)} / ${m2(70L)}")
    assert(m2(55L) == ("u55", 550.0) && m2.size == m.size)
    // DELETE with an untranslatable predicate rides the row-level path
    spark.sql(s"DELETE FROM graftrl.default.$t WHERE k % 100 = 99")
    val m3 = rowsOf(t)
    assert(!m3.contains(99L) && !m3.contains(199L) && !m3.contains(299L))
    assert(m3.size == m2.size - 3)
    assert(snapFiles(t).toSet.intersect(before) == before,
      "MOR DELETE rewrote a data file")
    // compaction materializes everything; state identical
    ops.Layout.compactSnapshot(spark, tablePath(t), sortBy = Seq("k"))
    assert(rowsOf(t) == m3, "post-compaction state drifted")
  }

  test("MERGE INTO: update + delete + insert clauses, hand-checked") {
    makeTable("m1")
    spark.sql(
      """SELECT id AS k, concat('u', id) AS v, CAST(-1 AS DOUBLE) AS amt,
        |  id >= 90 AS del
        |FROM range(50, 100)
        |UNION ALL
        |SELECT id, concat('n', id), CAST(0 AS DOUBLE), false
        |FROM range(1000, 1005)""".stripMargin)
      .createOrReplaceTempView("m1_src")
    spark.sql(
      """MERGE INTO graftrl.default.m1 AS t USING m1_src AS s
        |ON t.k = s.k
        |WHEN MATCHED AND s.del THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
        |WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)
        |""".stripMargin)
    val got = rowsOf("m1")
    assert(got.size == 300 - 10 + 5) // 90..99 deleted, 5 inserted
    assert(!got.contains(95L))
    assert(got(55L) == ("u55", -1.0))      // updated
    assert(got(42L) == ("v42", 42.0))      // carried in the same file
    assert(got(250L) == ("v250", 250.0))   // untouched group
    assert(got(1002L) == ("n1002", 0.0))   // inserted
  }

  test("MERGE rewrites ONLY the matched file-group; others carry by line") {
    makeTable("m2")
    val before = snapFiles("m2")
    // all source keys live in the first data group (k < 100)
    spark.sql(
      """SELECT id AS k, 'upd' AS v, CAST(7 AS DOUBLE) AS amt
        |FROM range(10, 20)""".stripMargin)
      .createOrReplaceTempView("m2_src")
    spark.sql(
      """MERGE INTO graftrl.default.m2 AS t USING m2_src AS s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
        |WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)
        |""".stripMargin)
    val after = snapFiles("m2")
    val carried = before.toSet.intersect(after.toSet)
    // runtime group filtering pins the rewrite to the one matched file:
    // the 100-199 and 200-299 files (and the empty CREATE file) must
    // survive VERBATIM — a full-table rewrite here is the r14 "surface
    // without the scale property" failure mode, and this assertion is
    // what makes it impossible to ship
    assert(carried.size >= before.size - 1,
      s"expected at most one rewritten group; before=$before after=$after")
    assert(rowsOf("m2")(15L) == ("upd", 7.0))
    assert(rowsOf("m2").size == 300)
  }

  test("UPDATE SQL rewrites copy-on-write with group pruning") {
    makeTable("u1")
    val before = snapFiles("u1")
    spark.sql(
      """UPDATE graftrl.default.u1
        |SET v = concat(v, '!'), amt = amt * 2
        |WHERE k BETWEEN 110 AND 120""".stripMargin)
    val after = snapFiles("u1")
    assert(before.toSet.intersect(after.toSet).size >= before.size - 1)
    val got = rowsOf("u1")
    assert(got(115L) == ("v115!", 230.0))
    assert(got(109L) == ("v109", 109.0))
    assert(got(205L) == ("v205", 205.0))
    assert(got.size == 300)
  }

  test("DELETE with a subquery takes the row-level rewrite path") {
    makeTable("d1")
    // IN-subquery is not v1-Filter-translatable, so SupportsDelete
    // refuses and Spark falls to the SupportsRowLevelOperations rewrite
    spark.sql(
      """DELETE FROM graftrl.default.d1
        |WHERE k IN (SELECT id FROM range(250, 260))""".stripMargin)
    val got = rowsOf("d1")
    assert(got.size == 290)
    assert(!got.contains(255L))
    assert(got.contains(249L) && got.contains(260L))
  }

  test("history stays pinned behind a MERGE; Scala and SQL reads agree") {
    makeTable("h1")
    val vBefore = spark.sql(
      "SELECT max(k) FROM graftrl.default.h1").head.getLong(0)
    spark.sql("SELECT 5 AS k, 'x' AS v, CAST(9 AS DOUBLE) AS amt")
      .createOrReplaceTempView("h1_src")
    spark.sql(
      """MERGE INTO graftrl.default.h1 AS t USING h1_src AS s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
        |WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)
        |""".stripMargin)
    // v4 = the pre-merge head (v1 create + 3 inserts)
    val old = spark.sql(
      "SELECT v FROM graftrl.default.h1 VERSION AS OF 4 WHERE k = 5")
      .head.getString(0)
    assert(old == "v5" && vBefore == 299L)
    // the Scala snapshot API reads the same post-merge truth
    val viaApi = ops.Layout.readSnapshot(spark, tablePath("h1"))
      .where("k = 5").head.getString(1)
    assert(viaApi == "x")
  }

  test("MERGE-time schema evolution: a source-only column auto-ADDs " +
      "under the opt-in property; refused without it") {
    val t = "merge_evolve"
    spark.sql(s"DROP TABLE IF EXISTS graftrl.default.$t")
    spark.sql(s"""CREATE TABLE graftrl.default.$t (k BIGINT, v STRING)
                 |TBLPROPERTIES ('graft.merge.schema_evolution' = 'true')"""
      .stripMargin)
    spark.sql(s"""INSERT INTO graftrl.default.$t
                 |SELECT id AS k, concat('v', id) AS v FROM range(0, 10)"""
      .stripMargin)
    // both consents required: the table property (capability) AND the
    // statement-level WITH SCHEMA EVOLUTION syntax
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graftrl.default.$t AS t
         |USING (SELECT id AS k, concat('u', id) AS v,
         |       id * 10 AS extra FROM range(5, 15)) AS s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.sql(
      s"SELECT k, v, extra FROM graftrl.default.$t").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(rows.size == 15)
    // pre-evolution rows null-fill the new column
    (0L until 5L).foreach(k =>
      assert(rows(k) == (s"v$k", None), s"k=$k: ${rows(k)}"))
    // matched rows updated, new column populated
    (5L until 10L).foreach(k =>
      assert(rows(k) == (s"u$k", Some(k * 10)), s"k=$k: ${rows(k)}"))
    // inserted rows carry the new column
    (10L until 15L).foreach(k =>
      assert(rows(k) == (s"u$k", Some(k * 10)), s"k=$k: ${rows(k)}"))

    // without the property (no AUTOMATIC_SCHEMA_EVOLUTION capability)
    // the same statement never grows the schema — star assignments
    // resolve only the target's columns, the source-only column is
    // ignored, and an explicit reference to it refuses
    val t2 = "merge_noevolve"
    makeTable(t2)
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graftrl.default.$t2 AS t
         |USING (SELECT id AS k, concat('u', id) AS v,
         |       CAST(id AS DOUBLE) AS amt, id * 10 AS extra
         |       FROM range(5, 15)) AS s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT * FROM graftrl.default.$t2").columns.toSeq
      == Seq("k", "v", "amt"),
      "schema grew on a table without the opt-in property")
    val ex = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graftrl.default.$t2 AS t
           |USING (SELECT id AS k, id * 10 AS extra FROM range(0, 5)) AS s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET extra = s.extra"""
          .stripMargin)
    }
    assert(ex.getMessage != null)
  }
}
