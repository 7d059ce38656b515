package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.SnapshotScanBuilder
import org.scalatest.funsuite.AnyFunSuite

/** Pins manifest-level file skipping on the SQL read path: a table
  * created with `TBLPROPERTIES ('graft.stats.columns' = ...)` records
  * per-file bounds on every SQL INSERT, and `SELECT ... WHERE` conjuncts
  * that translate to bounds predicates drop whole files from the DSv2
  * scan before any parquet footer opens — the Scala
  * `readSnapshotWhere` decision, made for SQL text
  * (SnapshotScanBuilder.skipOf + Layout.prunedFilePaths). */
class GraftSkippingSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val wh = "target/graft_io/spec/skip_sql_catalog"
  private def cat = sql.GraftSql.catalogFor(spark, wh)

  /** 4 disjoint-range inserts: batch i holds k in [i*100, i*100+9]. */
  private def buildTable(name: String): String = {
    val c = cat
    spark.sql(s"DROP TABLE IF EXISTS $c.default.$name")
    spark.sql(s"""CREATE TABLE $c.default.$name (k BIGINT, tag STRING)
                |TBLPROPERTIES ('graft.stats.columns' = 'k,tag')""".stripMargin)
    (0 until 4).foreach { i =>
      val rows = (0 until 10)
        .map(j => s"(${i * 100 + j}, 'b$i')").mkString(", ")
      spark.sql(s"INSERT INTO $c.default.$name VALUES $rows")
    }
    name
  }

  private def pruned(q: String): (Long, Option[(Int, Int)]) = {
    SnapshotScanBuilder.lastPrune = None
    val n = spark.sql(q).collect().length.toLong
    (n, SnapshotScanBuilder.lastPrune)
  }

  test("range WHERE prunes files by manifest bounds, results exact") {
    val c = cat
    val t = buildTable("skip_range")
    val (n, prune) = pruned(
      s"SELECT k FROM $c.default.$t WHERE k >= 100 AND k <= 109")
    assert(n == 10, "pruning must not change results")
    assert(prune.isDefined, "a bounds-translatable WHERE must attempt pruning")
    val (kept, total) = prune.get
    assert(total >= 5, s"expected >=5 files (4 inserts + empty create), got $total")
    assert(kept < total,
      s"range query should prune non-matching files ($kept/$total)")
  }

  test("IN-list WHERE prunes like the flagship's filters") {
    val c = cat
    val t = buildTable("skip_in")
    val (n, prune) = pruned(
      s"SELECT k FROM $c.default.$t WHERE k IN (305, 306, 2000)")
    assert(n == 2)
    val (kept, total) = prune.get
    assert(kept < total, s"IN query should prune ($kept/$total)")
  }

  test("string equality prunes on lexicographic bounds") {
    val c = cat
    val t = buildTable("skip_str")
    val (n, prune) = pruned(
      s"SELECT k FROM $c.default.$t WHERE tag = 'b2'")
    assert(n == 10)
    val (kept, total) = prune.get
    assert(kept < total, s"tag equality should prune ($kept/$total)")
  }

  test("unprunable predicates forgo pruning and stay correct") {
    val c = cat
    val t = buildTable("skip_none")
    // k % 1000 = 105 keeps arithmetic on the attribute (k + 0 got
    // constant-folded to bare k and pruned — the optimizer runs first):
    // no Skip translates, the scan reads everything, the answer is
    // still right
    val (n, prune) = pruned(
      s"SELECT k FROM $c.default.$t WHERE k % 1000 = 105")
    assert(n == 1)
    assert(prune.isEmpty,
      "no bounds-translatable conjunct means no prune attempt")
  }

  test("stats property survives compaction and keeps pruning after") {
    val c = cat
    val t = buildTable("skip_compact")
    spark.sql(s"CALL $c.system.compact('default.$t', 2048)")
    // property still recorded (SHOW TBLPROPERTIES reads the manifest)
    val props = spark.sql(s"SHOW TBLPROPERTIES $c.default.$t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.stats.columns").contains("k,tag"))
    // compaction re-records bounds (statsColumnsOf carries them), so a
    // post-compact insert + range read still prunes
    spark.sql(s"INSERT INTO $c.default.$t VALUES (9999, 'b9')")
    val (n, prune) = pruned(
      s"SELECT k FROM $c.default.$t WHERE k >= 9000")
    assert(n == 1)
    val (kept, total) = prune.get
    assert(kept < total, s"post-compact read should prune ($kept/$total)")
  }

  test("ALTER TABLE SET TBLPROPERTIES turns stats on for an existing table") {
    val c = cat
    val t = "skip_alter"
    spark.sql(s"DROP TABLE IF EXISTS $c.default.$t")
    spark.sql(s"CREATE TABLE $c.default.$t (k BIGINT, tag STRING)")
    spark.sql(s"INSERT INTO $c.default.$t VALUES (1, 'old'), (2, 'old')")
    // no property yet: a range read keeps every file (no bounds recorded)
    val (n0, p0) = pruned(s"SELECT k FROM $c.default.$t WHERE k >= 1000")
    assert(n0 == 0)
    assert(p0.exists { case (kept, total) => kept == total },
      s"without bounds nothing can prune, got $p0")
    spark.sql(s"""ALTER TABLE $c.default.$t
                 |SET TBLPROPERTIES ('graft.stats.columns' = 'k')"""
      .stripMargin)
    // post-ALTER inserts record bounds; pre-ALTER files keep none and
    // always survive — pruning ramps in with new data
    spark.sql(s"INSERT INTO $c.default.$t VALUES (1000, 'new')")
    spark.sql(s"INSERT INTO $c.default.$t VALUES (2000, 'new')")
    val (n1, p1) = pruned(s"SELECT k FROM $c.default.$t WHERE k >= 1500")
    assert(n1 == 1)
    val (kept, total) = p1.get
    assert(kept < total,
      s"the out-of-range post-ALTER file should prune ($kept/$total)")
    // UNSET removes the property (future inserts stop recording)
    spark.sql(s"""ALTER TABLE $c.default.$t
                 |UNSET TBLPROPERTIES ('graft.stats.columns')""".stripMargin)
    val props = spark.sql(s"SHOW TBLPROPERTIES $c.default.$t").collect()
      .map(_.getString(0)).toSet
    assert(!props.contains("graft.stats.columns"))
    // RENAME on a table WITHOUT graft.column.mapping='id' stays
    // refused, with the workaround named (mapped-table renames are
    // supported since r18 — see GraftCatalogSpec)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.default.$t RENAME COLUMN tag TO label")
    }
    assert(e.getMessage.contains("column.mapping"))
    // and the ALTER validates stats columns against the recorded schema
    val e2 = intercept[Exception] {
      spark.sql(s"""ALTER TABLE $c.default.$t
                   |SET TBLPROPERTIES ('graft.stats.columns' = 'nope')"""
        .stripMargin)
    }
    assert(e2.getMessage.contains("unknown column"))
  }

  test("DDL-declared sort_by clustering prunes from the first INSERT") {
    val c = cat
    val t = "skip_cluster_ddl"
    spark.sql(s"DROP TABLE IF EXISTS $c.default.$t")
    spark.sql(s"""CREATE TABLE $c.default.$t (k BIGINT, tag STRING)
                |TBLPROPERTIES ('graft.stats.columns' = 'k',
                |               'graft.cluster.sort_by' = 'k')"""
      .stripMargin)
    // ONE value-scattered insert: without the declared clustering every
    // written file would span the whole range and a range WHERE could
    // prune nothing; sort_by range-clusters the batch at write time so
    // files are value-contiguous and prune from birth — no CALL compact
    val rows = (0 until 400).map(j => s"($j, 'x')").mkString(", ")
    spark.sql(s"INSERT INTO $c.default.$t VALUES $rows")
    val (n, prune) = pruned(s"SELECT k FROM $c.default.$t WHERE k < 100")
    assert(n == 100)
    val (kept, total) = prune.get
    assert(total >= 3, s"clustered insert should write several files, " +
      s"got $total")
    assert(kept < total,
      s"DDL-clustered first insert should prune ($kept/$total)")
    // the property is an ordinary carried prop: it survives compaction
    // and keeps clustering later writers
    spark.sql(s"CALL $c.system.compact('default.$t', 2048)")
    val props = spark.sql(s"SHOW TBLPROPERTIES $c.default.$t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.cluster.sort_by").contains("k"))
    // validation: unknown column or sort+zorder together fail the DDL
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE $c.default.bad_cluster (k BIGINT)
                  |TBLPROPERTIES ('graft.cluster.sort_by' = 'nope')"""
        .stripMargin)
    }
    // ...and ALTER can't sneak the zorder twin onto a sort_by table:
    // the mutual exclusion is validated on the MERGED props, not the
    // delta (a delta-only check passed this and committed both)
    intercept[Exception] {
      spark.sql(s"""ALTER TABLE $c.default.$t
                  |SET TBLPROPERTIES ('graft.cluster.zorder_by' = 'k,tag')"""
        .stripMargin)
    }
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE $c.default.bad_cluster2 (k BIGINT, v BIGINT)
                  |TBLPROPERTIES ('graft.cluster.sort_by' = 'k',
                  |               'graft.cluster.zorder_by' = 'k,v')"""
        .stripMargin)
    }
  }

  test("DDL-declared zorder_by clusters both columns' bounds") {
    val c = cat
    val t = "skip_zorder_ddl"
    spark.sql(s"DROP TABLE IF EXISTS $c.default.$t")
    spark.sql(s"""CREATE TABLE $c.default.$t (k BIGINT, v BIGINT)
                |TBLPROPERTIES ('graft.stats.columns' = 'k,v',
                |               'graft.cluster.zorder_by' = 'k,v')"""
      .stripMargin)
    // anti-correlated scatter: a k-sort would leave v scattered and
    // vice versa; the z-arrangement keeps BOTH columns' per-file ranges
    // narrow, so each column prunes independently
    spark.range(0, 400).selectExpr("id AS k", "(399 - id) AS v")
      .createOrReplaceTempView("zsrc")
    spark.sql(s"INSERT INTO $c.default.$t SELECT k, v FROM zsrc")
    val (nk, pk) = pruned(s"SELECT k FROM $c.default.$t WHERE k < 50")
    assert(nk == 50)
    assert(pk.exists { case (kept, total) => kept < total },
      s"z-clustered insert should prune on k, got $pk")
    val (nv, pv) = pruned(s"SELECT v FROM $c.default.$t WHERE v < 50")
    assert(nv == 50)
    assert(pv.exists { case (kept, total) => kept < total },
      s"z-clustered insert should prune on v too, got $pv")
  }

  test("PARTITIONED BY table: a partition-predicate SELECT prunes files (r16 task 2)") {
    val c = cat
    spark.sql(s"DROP TABLE IF EXISTS $c.default.skip_part")
    spark.sql(
      s"""CREATE TABLE $c.default.skip_part (id BIGINT, day BIGINT)
         |PARTITIONED BY (day)""".stripMargin)
    // ONE bulk insert spanning 8 days: the partition clause's implied
    // clustering must split it into day-disjoint files all by itself —
    // no per-partition insert discipline required of the user
    spark.sql(
      s"""INSERT INTO $c.default.skip_part
         |SELECT id, id % 8 AS day FROM range(0, 4000)""".stripMargin)
    val (n, prune) = pruned(
      s"SELECT id FROM $c.default.skip_part WHERE day = 3")
    assert(n == 500, "partition predicate changed the answer")
    assert(prune.isDefined, "partition predicate must attempt pruning")
    val (kept, total) = prune.get
    assert(total >= 3 && kept < total,
      s"partition predicate pruned nothing ($kept/$total)")
  }

  test("bloom property prunes scattered keys that bounds cannot") {
    val c = cat
    val t = "skip_bloom"
    spark.sql(s"DROP TABLE IF EXISTS $c.default.$t")
    // NO stats.columns: any pruning observed here is the bloom's alone
    spark.sql(s"""CREATE TABLE $c.default.$t (k BIGINT, tag STRING)
                |TBLPROPERTIES ('graft.stats.bloom' = 'k')""".stripMargin)
    // scattered inserts: batch i holds keys ≡ i (mod 4), so every
    // file's [min, max] spans ~the whole domain — range bounds would
    // keep everything; only per-file membership can prune
    (0 until 4).foreach { i =>
      val rows = (0 until 10)
        .map(j => s"(${j * 4 + i}, 'b$i')").mkString(", ")
      spark.sql(s"INSERT INTO $c.default.$t VALUES $rows")
    }
    // probe a key in class 2: the other three classes' files must drop
    val (n, prune) = pruned(s"SELECT k FROM $c.default.$t WHERE k = 22")
    assert(n == 1)
    val (kept, total) = prune.get
    assert(total >= 5, s"expected 4 data files + create, got $total")
    assert(kept < total, s"bloom should prune absent classes ($kept/$total)")
    // IN across two classes: both holders survive, probe stays exact
    val (n2, prune2) = pruned(
      s"SELECT k FROM $c.default.$t WHERE k IN (22, 13)")
    assert(n2 == 2, "bloom pruning must never lose a matching row")
    assert(prune2.exists { case (kp, tt) => kp < tt })
    // a key present nowhere: every DATA file's bloom proves absence —
    // only the CREATE commit's empty (stat-less, bloom-less) file may
    // survive, because a file without a bloom always does
    val (n3, prune3) = pruned(
      s"SELECT k FROM $c.default.$t WHERE k = 1000001")
    assert(n3 == 0)
    assert(prune3.exists { case (kp, _) => kp <= 1 },
      s"an absent key should prune every data file, got $prune3")
    // the property validates at DDL: unknown column / bad type / bad bits
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE $c.default.bad_bloom (k BIGINT)
                  |TBLPROPERTIES ('graft.stats.bloom' = 'nope')"""
        .stripMargin)
    }
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE $c.default.bad_bloom2 (k DOUBLE)
                  |TBLPROPERTIES ('graft.stats.bloom' = 'k')""".stripMargin)
    }
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE $c.default.bad_bloom3 (k BIGINT)
                  |TBLPROPERTIES ('graft.stats.bloom' = 'k',
                  |               'graft.stats.bloom.bits' = '100')"""
        .stripMargin)
    }
    // a column referenced by the bloom property cannot be dropped out
    // from under it — UNSET first, says the error
    val eDrop = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.default.$t DROP COLUMN k")
    }
    assert(eDrop.getMessage.contains("UNSET"), eDrop.getMessage)
    // blooms survive compaction (withStats re-records them from props)
    spark.sql(s"CALL $c.system.compact('default.$t', 400)")
    val (n4, prune4) = pruned(s"SELECT k FROM $c.default.$t WHERE k = 1000001")
    assert(n4 == 0)
    // the repack folded the empty file away and re-recorded blooms on
    // every surviving file, so the absent key now prunes EVERYTHING
    assert(prune4.exists { case (kp, _) => kp == 0 },
      s"post-compact files lost their blooms, got $prune4")
  }

  test("string bloom prunes on tag equality without string bounds") {
    val c = cat
    val t = "skip_bloom_str"
    spark.sql(s"DROP TABLE IF EXISTS $c.default.$t")
    spark.sql(s"""CREATE TABLE $c.default.$t (k BIGINT, tag STRING)
                |TBLPROPERTIES ('graft.stats.bloom' = 'tag')""".stripMargin)
    // interleave tag prefixes so lexicographic bounds overlap heavily
    (0 until 3).foreach { i =>
      val rows = (0 until 8)
        .map(j => s"(${i * 8 + j}, 'u${j}_g$i')").mkString(", ")
      spark.sql(s"INSERT INTO $c.default.$t VALUES $rows")
    }
    val (n, prune) = pruned(
      s"SELECT k FROM $c.default.$t WHERE tag = 'u3_g1'")
    assert(n == 1)
    assert(prune.exists { case (kp, tt) => kp < tt },
      s"string bloom should prune non-holding files, got $prune")
  }

  test("CTAS with the stats property records bounds on its own write") {
    val c = cat
    spark.sql(s"DROP TABLE IF EXISTS $c.default.skip_ctas")
    spark.range(0, 40).selectExpr("id AS k", "concat('t', id) AS tag")
      .createOrReplaceTempView("skip_ctas_src")
    spark.sql(s"""CREATE TABLE $c.default.skip_ctas
                 |TBLPROPERTIES ('graft.stats.columns' = 'k')
                 |AS SELECT * FROM skip_ctas_src""".stripMargin)
    // a second, range-disjoint insert makes pruning observable
    spark.sql(s"INSERT INTO $c.default.skip_ctas VALUES (5000, 'far')")
    val (n, prune) = pruned(
      s"SELECT k FROM $c.default.skip_ctas WHERE k >= 4000")
    assert(n == 1)
    val (kept, total) = prune.get
    assert(kept < total,
      s"CTAS write should have recorded bounds ($kept/$total)")
  }

  test("a fully-pruned read (zero surviving files) returns empty, not error") {
    val c = cat
    val t = buildTable("skip_all")
    // compact away the boundless empty CREATE file so every remaining
    // file carries bounds — then an out-of-range predicate prunes ALL
    spark.sql(s"CALL $c.system.compact('default.$t')")
    val (n, prune) = pruned(
      s"SELECT k FROM $c.default.$t WHERE k >= 1000000")
    assert(n == 0, "fully-pruned read must answer empty")
    val (kept, total) = prune.get
    assert(kept == 0 && total >= 1,
      s"expected a zero-file scan ($kept/$total)")
  }

  test("time-traveled reads prune against the pinned version's bounds") {
    val c = cat
    val t = buildTable("skip_tt") // v1 create + v2..v5 inserts
    // at v3 only batches 0 and 1 exist; a batch-1-range query over the
    // PINNED snapshot must prune batch 0's files using v3's manifest,
    // not the head's
    val (n, prune) = pruned(
      s"""SELECT k FROM $c.default.$t VERSION AS OF 3
         |WHERE k >= 100 AND k <= 109""".stripMargin)
    assert(n == 10)
    val (kept, total) = prune.get
    assert(kept < total, s"pinned-version prune should engage ($kept/$total)")
    // and batch 3's range does not exist yet at v3
    val (n2, _) = pruned(
      s"""SELECT k FROM $c.default.$t VERSION AS OF 3
         |WHERE k >= 300""".stripMargin)
    assert(n2 == 0)
  }

  test("DDL refuses a stats property naming an unknown column") {
    val c = cat
    spark.sql(s"DROP TABLE IF EXISTS $c.default.skip_bad")
    val e = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $c.default.skip_bad (k BIGINT)
                   |TBLPROPERTIES ('graft.stats.columns' = 'nope')"""
        .stripMargin)
    }
    assert(e.getMessage.contains("unknown column"))
  }
}
