package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SQL front door ([[graft.sql.GraftCatalog]]): the manifest
  * table lifecycle driven entirely by `spark.sql` text — CREATE /
  * INSERT INTO / INSERT OVERWRITE / CTAS / DROP, exact `VERSION AS OF`
  * and `TIMESTAMP AS OF` time travel through the catalog, schema
  * enforcement from the CREATE-time record, and the plan shape (filter
  * pushdown into the parquet scan over manifest-listed files). */
class GraftCatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse",
        "target/graft_io/spec/sql_catalog_wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val wh = new Path("target/graft_io/spec/sql_catalog_wh")
    wh.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wh, true)
    s
  }

  private val sf = "/root/testdata/sf0.001"

  test("CREATE + INSERT INTO + SELECT round-trips through SQL text") {
    val n = Tables.nation(spark, sf)
    n.createOrReplaceTempView("nation_src")
    spark.sql("DROP TABLE IF EXISTS graft.default.nation_sql")
    spark.sql("""CREATE TABLE graft.default.nation_sql
                |  (n_nationkey BIGINT, n_name STRING,
                |   n_regionkey BIGINT)""".stripMargin)
    // a created-but-empty table is a real v1 with the declared schema
    assert(spark.sql("SELECT * FROM graft.default.nation_sql").count() == 0)
    spark.sql("""INSERT INTO graft.default.nation_sql
                |SELECT n_nationkey, n_name, n_regionkey
                |FROM nation_src WHERE n_nationkey < 10""".stripMargin)
    spark.sql("""INSERT INTO graft.default.nation_sql
                |SELECT n_nationkey, n_name, n_regionkey
                |FROM nation_src WHERE n_nationkey >= 10""".stripMargin)
    assert(spark.sql("SELECT * FROM graft.default.nation_sql").count()
      == n.count())
    // SQL writers and programmatic readers share one table: the Scala
    // snapshot API sees exactly what SQL committed
    val viaApi = ops.Layout.readSnapshot(spark,
      "target/graft_io/spec/sql_catalog_wh/default/nation_sql")
    assert(viaApi.count() == n.count())
  }

  test("VERSION AS OF and TIMESTAMP AS OF pin exact snapshots") {
    // history built by the previous test: v1 empty, v2 = keys<10, v3 = rest
    assert(spark.sql(
      "SELECT * FROM graft.default.nation_sql VERSION AS OF 1").count() == 0)
    assert(spark.sql(
      "SELECT * FROM graft.default.nation_sql VERSION AS OF 2").count() == 10)
    val head = spark.sql("SELECT * FROM graft.default.nation_sql").count()
    assert(spark.sql(
      "SELECT * FROM graft.default.nation_sql VERSION AS OF 3").count() == head)
    // a future timestamp resolves to the head version
    assert(spark.sql(
      """SELECT * FROM graft.default.nation_sql
        |TIMESTAMP AS OF '2999-01-01'""".stripMargin).count() == head)
    // writing through a time-travel handle is refused
    val e = intercept[Exception] {
      spark.sql("""INSERT INTO (SELECT * FROM graft.default.nation_sql
                  |VERSION AS OF 2) VALUES (1, 'x', 1)""".stripMargin)
    }
    assert(e != null)
  }

  test("filters push into the parquet scan over manifest-listed files") {
    val plan = spark.sql(
      """SELECT n_name FROM graft.default.nation_sql
        |WHERE n_nationkey = 7""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("n_nationkey"),
      s"no pushdown in catalog scan plan:\n$plan")
    assert(plan.contains("ReadSchema") &&
      !plan.contains("n_regionkey"),
      "column pruning lost: n_regionkey read for a 2-column query")
  }

  test("INSERT OVERWRITE replaces the whole table as one REPLACE commit") {
    spark.sql("""INSERT OVERWRITE graft.default.nation_sql
                |SELECT n_nationkey, n_name, n_regionkey
                |FROM nation_src WHERE n_nationkey < 5""".stripMargin)
    assert(spark.sql("SELECT * FROM graft.default.nation_sql").count() == 5)
    // pinned history is still readable after the overwrite
    assert(spark.sql(
      "SELECT * FROM graft.default.nation_sql VERSION AS OF 2").count() == 10)
  }

  test("CTAS creates and fills in one statement; DROP removes the table") {
    spark.sql("DROP TABLE IF EXISTS graft.default.region_ctas")
    spark.sql("""CREATE TABLE graft.default.region_ctas AS
                |SELECT r_regionkey, r_name FROM region_src""".stripMargin)
    assert(spark.sql("SELECT * FROM graft.default.region_ctas").count()
      == Tables.region(spark, sf).count())
    spark.sql("DROP TABLE graft.default.region_ctas")
    assert(!spark.catalog.tableExists("graft.default.region_ctas"))
  }

  test("an INSERT that contradicts the CREATE-time schema is refused") {
    val e = intercept[Exception] {
      spark.sql("""INSERT INTO graft.default.nation_sql
                  |SELECT n_name, n_nationkey, n_regionkey
                  |FROM nation_src""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("cannot") ||
      e.getMessage.toLowerCase.contains("cast") ||
      e.getMessage.toLowerCase.contains("incompatible"),
      s"wrong failure: ${e.getMessage}")
  }

  test("DELETE FROM rewrites copy-on-write; history stays pinned; no-WHERE truncates") {
    val n = Tables.nation(spark, sf)
    n.createOrReplaceTempView("nation_src")
    spark.sql("DROP TABLE IF EXISTS graft.default.nation_del")
    spark.sql("""CREATE TABLE graft.default.nation_del AS
                |SELECT n_nationkey, n_name, n_regionkey
                |FROM nation_src""".stripMargin)
    val before = spark.sql("SELECT * FROM graft.default.nation_del").count()
    assert(before == n.count())
    spark.sql(
      "DELETE FROM graft.default.nation_del WHERE n_nationkey < 10")
    assert(spark.sql("SELECT * FROM graft.default.nation_del").count()
      == before - 10)
    // SQL NULL semantics on the predicate ride the verb's coalesce
    spark.sql(
      "DELETE FROM graft.default.nation_del WHERE n_name LIKE 'A%'")
    val expect = n.where(col("n_nationkey") >= 10 &&
      !col("n_name").startsWith("A")).count()
    assert(spark.sql("SELECT * FROM graft.default.nation_del").count()
      == expect)
    // the pre-delete snapshot is still pinned (CTAS = v1 empty + v2 fill)
    assert(spark.sql(
      "SELECT * FROM graft.default.nation_del VERSION AS OF 2").count()
      == before)
    // DELETE with no WHERE = truncate, as a REPLACE commit
    spark.sql("DELETE FROM graft.default.nation_del")
    assert(spark.sql("SELECT * FROM graft.default.nation_del").count() == 0)
    assert(spark.sql(
      "SELECT * FROM graft.default.nation_del VERSION AS OF 2").count()
      == before,
      "truncate must not destroy pinned history")
  }

  test("the q_manifest_sql key answers identically to the direct aggregate") {
    val got = graft.sql.GraftSql.qManifestSql(spark, sf).collect()
    val want = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(Tables.dec2(col("o_totalprice"))).cast("double")
          .as("sum_price"))
      .orderBy("o_orderstatus").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("ALTER TABLE ADD COLUMN: schema-only commit, old files null-fill") {
    spark.sql("DROP TABLE IF EXISTS graft.default.evo_sql")
    spark.sql("CREATE TABLE graft.default.evo_sql (k BIGINT, tag STRING)")
    spark.sql("INSERT INTO graft.default.evo_sql VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graft.default.evo_sql ADD COLUMN bal DECIMAL(18,2)")
    // the evolved schema is visible immediately; pre-evolution rows
    // null-fill WITHOUT any rewrite
    val afterAlter = spark.sql("SELECT * FROM graft.default.evo_sql")
    assert(afterAlter.columns.toSeq == Seq("k", "tag", "bal"))
    assert(afterAlter.where(col("bal").isNull).count() == 2)
    spark.sql(
      "INSERT INTO graft.default.evo_sql VALUES (3, 'c', CAST(7.50 AS DECIMAL(18,2)))")
    val rows = spark.sql(
      "SELECT k, bal FROM graft.default.evo_sql ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), Option(r.get(1)).isDefined)).toSeq
      == Seq((1L, false), (2L, false), (3L, true)))
    // time travel still sees the PRE-evolution schema at old versions
    assert(spark.sql(
      "SELECT * FROM graft.default.evo_sql VERSION AS OF 2")
      .columns.toSeq == Seq("k", "tag"))
    // duplicate add refuses; renames stay refused
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.evo_sql ADD COLUMN bal STRING")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.evo_sql RENAME COLUMN bal TO b2")
    }
    // DROP COLUMN: schema-only lazy drop — the head read projects the
    // column away, old versions still carry it (time travel unharmed)
    spark.sql("ALTER TABLE graft.default.evo_sql DROP COLUMN tag")
    val afterDrop = spark.sql("SELECT * FROM graft.default.evo_sql")
    assert(afterDrop.columns.toSeq == Seq("k", "bal"))
    assert(afterDrop.count() == 3)
    assert(spark.sql(
      "SELECT * FROM graft.default.evo_sql VERSION AS OF 4")
      .columns.contains("tag"),
      "pre-drop versions must keep the dropped column readable")
    // an insert after the drop writes the narrow schema
    spark.sql(
      "INSERT INTO graft.default.evo_sql VALUES (4, CAST(1.25 AS DECIMAL(18,2)))")
    assert(spark.sql("SELECT * FROM graft.default.evo_sql").count() == 4)
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.evo_sql DROP COLUMN ghost")
    }
  }

  test("CREATE-time TBLPROPERTIES persist; empty value can't brick a table") {
    spark.sql("DROP TABLE IF EXISTS graft.default.props_sql")
    spark.sql("""CREATE TABLE graft.default.props_sql (k BIGINT)
                |TBLPROPERTIES ('team' = 'data-eng', 'note' = '')"""
      .stripMargin)
    def props() = spark.sql("SHOW TBLPROPERTIES graft.default.props_sql")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // r15 advice 1: CREATE used to silently drop every non-stats
    // property while ALTER recorded them — they must round-trip now
    assert(props().get("team").contains("data-eng"))
    // r15 advice 2 (high): an EMPTY property value wrote a manifest
    // header line whose trailing field the tab-split dropped, and every
    // later read threw "bad prop header" — the table was write-bricked
    // by one legal DDL. Now it round-trips, and the table keeps working.
    assert(props().get("note").contains(""))
    spark.sql(
      "ALTER TABLE graft.default.props_sql SET TBLPROPERTIES ('x' = '')")
    assert(props().get("x").contains(""))
    spark.sql("INSERT INTO graft.default.props_sql VALUES (1)")
    assert(spark.sql("SELECT * FROM graft.default.props_sql").count() == 1)
  }

  test("ALTER refuses the CREATE-time layout properties, names the way out") {
    // r18 verdict: setTableProps guarded only graft.column.mapping, so
    // legal DDL could flip graft.bucket.count on a populated table and
    // silently mis-key SPJ joins. All three layout props now get the
    // same immutable treatment, with the rewrite path in the message.
    spark.sql("DROP TABLE IF EXISTS graft.default.layout_sql")
    spark.sql("""CREATE TABLE graft.default.layout_sql (k BIGINT, g STRING)
                |PARTITIONED BY (g)""".stripMargin)
    spark.sql("INSERT INTO graft.default.layout_sql " +
      "SELECT id, CAST(id % 3 AS STRING) FROM range(30)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.layout_sql " +
        "SET TBLPROPERTIES ('graft.partitioned.by' = 'k')")
    }
    assert(e.getMessage.contains("graft.partitioned.by") &&
        e.getMessage.contains("CREATE-time immutable"), e.getMessage)
    // UNSET is refused too — erasing the layout is as unsound as
    // rewriting it — and harmless props still pass through unharmed
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.layout_sql " +
        "UNSET TBLPROPERTIES ('graft.partitioned.by')")
    }
    spark.sql("ALTER TABLE graft.default.layout_sql " +
      "SET TBLPROPERTIES ('team' = 'curation')")
    assert(spark.sql("SELECT COUNT(*) FROM graft.default.layout_sql")
      .head.getLong(0) == 30)
  }

  test("REPLACE WHERE swaps exactly the predicate's rows, idempotently") {
    spark.sql("DROP TABLE IF EXISTS graft.default.rw_sql")
    spark.sql("CREATE TABLE graft.default.rw_sql (k BIGINT, v BIGINT)")
    spark.range(0, 40).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("rw_src")
    spark.sql("INSERT INTO graft.default.rw_sql SELECT * FROM rw_src")
    def backfill(): Unit = spark.sql(
      """INSERT INTO graft.default.rw_sql REPLACE WHERE k >= 30
        |SELECT k, v * 100 AS v FROM rw_src WHERE k >= 30""".stripMargin)
    backfill()
    def state(): Seq[(Long, Long)] =
      spark.sql("SELECT k, v FROM graft.default.rw_sql ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val once = state()
    assert(once.size == 40)
    assert(once.filter(_._1 >= 30).forall { case (k, v) => v == k * 100 })
    assert(once.filter(_._1 < 30).forall { case (k, v) => v == k })
    // the backfill verb's defining property: re-running CONVERGES —
    // no duplicate rows, no double application
    backfill()
    assert(state() == once, "REPLACE WHERE re-run must be a no-op state")
    // rows outside the claimed predicate refuse BEFORE any commit
    val e = intercept[Exception] {
      spark.sql(
        """INSERT INTO graft.default.rw_sql REPLACE WHERE k >= 30
          |SELECT k, v FROM rw_src WHERE k >= 20""".stripMargin)
    }
    assert(e.getMessage.contains("do NOT satisfy") ||
      Option(e.getCause).exists(_.getMessage.contains("do NOT satisfy")),
      s"expected the out-of-predicate refusal, got: ${e.getMessage}")
    assert(state() == once, "a refused REPLACE WHERE must change nothing")
    // plain INSERT OVERWRITE still truncate-replaces the whole table
    spark.sql(
      "INSERT OVERWRITE graft.default.rw_sql SELECT * FROM rw_src WHERE k < 5")
    assert(spark.sql("SELECT * FROM graft.default.rw_sql").count() == 5)
  }

  test("CHECK constraints gate every write; ALTER proves existing data first") {
    def refused(body: => Any): String = {
      val e = intercept[Exception](body)
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).find(m => m != null &&
          (m.contains("CHECK constraint") || m.contains("constraint")))
        .getOrElse(fail(s"no constraint message in: ${e.getMessage}"))
    }
    spark.sql("DROP TABLE IF EXISTS graft.default.ck_sql")
    spark.sql("""CREATE TABLE graft.default.ck_sql (k BIGINT, v BIGINT)
                |TBLPROPERTIES ('graft.constraint.pos' = 'v >= 0')"""
      .stripMargin)
    spark.sql("INSERT INTO graft.default.ck_sql VALUES (1, 5), (2, 0)")
    def count() =
      spark.sql("SELECT * FROM graft.default.ck_sql").count()
    assert(count() == 2)
    // a violating batch refuses, names the constraint, commits nothing
    assert(refused(spark.sql(
      "INSERT INTO graft.default.ck_sql VALUES (3, 7), (4, -1)"))
      .contains("'pos'"))
    assert(count() == 2, "a refused batch must commit nothing")
    // NULL does not PROVE the row valid → violation
    refused(spark.sql(
      "INSERT INTO graft.default.ck_sql VALUES (5, NULL)"))
    assert(count() == 2)
    // ALTER-time addition proves EXISTING data: (2, 0) violates v >= 1
    refused(spark.sql(
      """ALTER TABLE graft.default.ck_sql
        |SET TBLPROPERTIES ('graft.constraint.big' = 'v >= 1')"""
        .stripMargin))
    // a satisfiable addition lands and gates future writes
    spark.sql(
      """ALTER TABLE graft.default.ck_sql
        |SET TBLPROPERTIES ('graft.constraint.keyed' = 'k > 0')"""
        .stripMargin)
    refused(spark.sql("INSERT INTO graft.default.ck_sql VALUES (0, 9)"))
    // UNSET removes the gate
    spark.sql(
      """ALTER TABLE graft.default.ck_sql
        |UNSET TBLPROPERTIES ('graft.constraint.pos')""".stripMargin)
    spark.sql("INSERT INTO graft.default.ck_sql VALUES (6, -7)")
    assert(count() == 3)
    // DDL validation: unresolvable expressions fail the statement
    intercept[Exception] {
      spark.sql("""CREATE TABLE graft.default.bad_ck (k BIGINT)
                  |TBLPROPERTIES ('graft.constraint.x' = 'nope > 0')"""
        .stripMargin)
    }
    // a column referenced by a live constraint cannot be dropped
    val eDrop = intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.ck_sql DROP COLUMN k")
    }
    assert(eDrop.getMessage.contains("UNSET"), eDrop.getMessage)
  }

  override def withFixture(test: NoArgTest) = {
    // region_src is used by the CTAS test; register lazily once
    if (spark.catalog.tableExists("region_src") == false)
      Tables.region(spark, sf).createOrReplaceTempView("region_src")
    super.withFixture(test)
  }

  test("PARTITIONED BY maps onto clustering + skipping; transforms beyond identity refuse") {
    spark.sql("DROP TABLE IF EXISTS graft.default.part_sql")
    spark.sql(
      """CREATE TABLE graft.default.part_sql
        |  (id BIGINT, day BIGINT, v DOUBLE)
        |PARTITIONED BY (day)""".stripMargin)
    // the clause became clustering + stats + the marker — visible props
    val props = spark.sql("SHOW TBLPROPERTIES graft.default.part_sql")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.partitioned.by").contains("day"))
    assert(props.get("graft.cluster.sort_by").contains("day"))
    assert(props.get("graft.stats.columns").exists(_.contains("day")))
    spark.sql(
      """INSERT INTO graft.default.part_sql
        |SELECT id, id % 8 AS day, id * 0.5 FROM range(0, 4000)"""
        .stripMargin)
    // partition-predicate query: correct answer AND file pruning (the
    // insert range-clustered by day, so day files are disjoint)
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM graft.default.part_sql WHERE day = 3")
      .head.getLong(0) == 500)
    val dir = "target/graft_io/spec/sql_catalog_wh/default/part_sql"
    val (kept, total) = ops.Layout.fileSelection(spark, dir,
      Seq(ops.Layout.SkipRange("day", 3L, 3L)))
    assert(total > 1 && kept.size < total,
      s"partition predicate pruned nothing ($kept of $total)")
    // DESCRIBE surfaces the declared partitioning
    val desc = spark.sql("DESCRIBE TABLE graft.default.part_sql")
      .collect().map(_.getString(0))
    assert(desc.contains("# Partition Information") ||
      desc.contains("day"), desc.mkString(","))
    // bucket(N, col) is a supported layout since r18 — it records the
    // bucket props (SpjSpec pins the write invariant + shuffle-free
    // join); temporal transforms still refuse with the alternative named
    spark.sql("DROP TABLE IF EXISTS graft.default.part_bkt")
    spark.sql(
      """CREATE TABLE graft.default.part_bkt (id BIGINT, day BIGINT)
        |PARTITIONED BY (bucket(8, id))""".stripMargin)
    val bprops = spark.sql("SHOW TBLPROPERTIES graft.default.part_bkt")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bprops.get("graft.bucket.by").contains("id"))
    assert(bprops.get("graft.bucket.count").contains("8"))
    spark.sql("DROP TABLE graft.default.part_bkt")
    val e = intercept[Exception] {
      spark.sql(
        """CREATE TABLE graft.default.part_bad (id BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (days(ts))""".stripMargin)
    }
    assert(e.getMessage.contains("identity"), e.getMessage)
    // mixing bucket and identity refuses (two independent groupings
    // cannot both be the file layout)
    val eMix = intercept[Exception] {
      spark.sql(
        """CREATE TABLE graft.default.part_bad3 (id BIGINT, day BIGINT)
          |PARTITIONED BY (day, bucket(8, id))""".stripMargin)
    }
    assert(eMix.getMessage.contains("not a mix"), eMix.getMessage)
    // PARTITIONED BY + explicit clustering props conflict loudly
    val e2 = intercept[Exception] {
      spark.sql(
        """CREATE TABLE graft.default.part_bad2 (id BIGINT, day BIGINT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES ('graft.cluster.sort_by' = 'id')""".stripMargin)
    }
    assert(e2.getMessage.contains("mutually exclusive"), e2.getMessage)
  }

  test("RENAME COLUMN on an id-mapped table: schema-only commit, old " +
      "files read by field id; refused without the mapping") {
    val t = "graft.default.ren_sql"
    val dir = "target/graft_io/spec/sql_catalog_wh/default/ren_sql"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, val DOUBLE)
                 |TBLPROPERTIES ('graft.column.mapping' = 'id')"""
      .stripMargin)
    spark.sql(s"""INSERT INTO $t
                 |SELECT id AS k, CAST(id AS DOUBLE) AS val
                 |FROM range(0, 10)""".stripMargin)
    val preRename = ops.Layout.history(spark, dir).map(_._1).max
    spark.sql(s"ALTER TABLE $t RENAME COLUMN val TO amount")
    // gen-1 files (written under 'val') read by FIELD ID under 'amount'
    val r1 = spark.sql(s"SELECT CAST(SUM(amount) AS BIGINT) AS s, " +
      s"COUNT(amount) AS n FROM $t").collect().head
    assert(r1.getLong(0) == 45 && r1.getLong(1) == 10,
      "pre-rename files must read under the new name (field-id match), " +
        s"got ${r1}")
    // post-rename insert under the new name; both generations answer
    spark.sql(s"""INSERT INTO $t
                 |SELECT id AS k, CAST(id AS DOUBLE) AS amount
                 |FROM range(10, 20)""".stripMargin)
    assert(spark.sql(s"SELECT CAST(SUM(amount) AS BIGINT) FROM $t")
      .collect().head.getLong(0) == 190)
    // filter pushdown on the renamed column still answers exactly
    assert(spark.sql(s"SELECT COUNT(*) FROM $t WHERE amount >= 15")
      .collect().head.getLong(0) == 5)
    // time travel: the pre-rename version keeps the OLD name
    val old = spark.sql(s"SELECT * FROM $t VERSION AS OF $preRename")
    assert(old.columns.toSeq == Seq("k", "val"),
      s"pre-rename version must read under 'val': ${old.columns.toSeq}")
    assert(old.count() == 10)
    // programmatic read core agrees with the SQL surface
    val core = ops.Layout.readSnapshot(spark, dir)
    assert(core.columns.toSeq == Seq("k", "amount"))
    assert(core.agg(sum("amount")).collect().head.getDouble(0) == 190.0)

    // a NON-mapped table refuses with the workaround named
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.nation_sql " +
        "RENAME COLUMN n_name TO nm")
    }
    assert(ex.getMessage.contains("column.mapping"),
      s"wrong refusal: ${ex.getMessage}")
    // the mapping property is CREATE-time immutable
    val ex2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.nation_sql " +
        "SET TBLPROPERTIES ('graft.column.mapping' = 'id')")
    }
    assert(ex2.getMessage.contains("immutable"),
      s"wrong refusal: ${ex2.getMessage}")
  }

  test("id-mapped REPLACE mints fresh field ids for new columns") {
    // a full-table REPLACE records the FRAME's schema (replaceSchemaFor
    // restamps: carried names keep their ids, new fields get max+1) —
    // the staging stamp must mint the same fresh ids instead of
    // refusing like an append does
    val dir = "target/graft_io/spec/replace_mapped"
    ops.Layout.dropTable(spark, dir)
    import spark.implicits._
    ops.Layout.commitSnapshot(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      props = Map("graft.column.mapping" -> "id"))
    ops.Layout.replaceSnapshot(spark, dir,
      Seq((7L, "z", 9.5)).toDF("k", "s", "x"))
    val out = ops.Layout.readSnapshot(spark, dir)
    assert(out.columns.toSeq == Seq("k", "s", "x"))
    assert(out.count() == 1 && out.head.getDouble(2) == 9.5)
    // appends keep the refusal: id minting outside DDL races a rename
    val e = intercept[Exception] {
      ops.Layout.commitSnapshot(spark, dir,
        Seq((8L, "q", 1.0, true)).toDF("k", "s", "x", "extra"))
    }
    assert(e.getMessage.contains("ADD COLUMN"), e.getMessage)
  }

  test("ALTER COLUMN TYPE widens in place; narrowing refuses with the named error") {
    spark.sql("DROP TABLE IF EXISTS graft.default.widen_sql")
    spark.sql(
      "CREATE TABLE graft.default.widen_sql (k INT, v BIGINT)")
    spark.sql(
      "INSERT INTO graft.default.widen_sql VALUES (1, 10), (2, 20)")
    spark.sql(
      "ALTER TABLE graft.default.widen_sql ALTER COLUMN k TYPE BIGINT")
    // the old INT files scan-promote under the widened schema
    assert(spark.sql("SELECT * FROM graft.default.widen_sql").schema("k")
      .dataType == org.apache.spark.sql.types.LongType)
    spark.sql(
      "INSERT INTO graft.default.widen_sql VALUES (9999999999, 30)")
    assert(spark.sql(
      "SELECT CAST(SUM(k) AS BIGINT) AS s FROM graft.default.widen_sql")
      .head.getLong(0) == 3L + 9999999999L)
    // narrowing refuses and commits nothing — Spark's analyzer blocks
    // it first (NOT_SUPPORTED_CHANGE_COLUMN, Cast.canUpCast); the
    // catalog's own guard backstops the programmatic path with the
    // named error
    val e = intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft.default.widen_sql ALTER COLUMN v TYPE INT")
    }
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e.getMessage.contains("not a widening"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      ops.Layout.updateColumnType(spark,
        "target/graft_io/spec/sql_catalog_wh/default/widen_sql",
        "v", org.apache.spark.sql.types.IntegerType)
    }
    assert(e2.getMessage.contains("not a widening"), e2.getMessage)
    assert(spark.sql("SELECT * FROM graft.default.widen_sql").schema("v")
      .dataType == org.apache.spark.sql.types.LongType)
  }

  test("merge-on-read through SQL: DELETE annotates, every read applies dvs, UPDATE never resurrects") {
    val dir = "target/graft_io/spec/sql_catalog_wh/default/mor_sql"
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql("DROP TABLE IF EXISTS graft.default.mor_sql")
    spark.sql(
      """CREATE TABLE graft.default.mor_sql (k BIGINT, v BIGINT)
        |TBLPROPERTIES ('graft.rowlevel.mode' = 'mor',
        |               'graft.stats.columns' = 'k')""".stripMargin)
    spark.sql(
      """INSERT INTO graft.default.mor_sql
        |SELECT id, id * 10 FROM range(1, 101)""".stripMargin)
    val v0 = ops.Layout.currentVersion(fs, root)
    def paths(v: Int) = ops.Layout.versionFilePaths(fs, root, v).toSet
    val dataBefore = paths(v0)

    spark.sql("DELETE FROM graft.default.mor_sql WHERE k <= 20")
    val v1 = ops.Layout.currentVersion(fs, root)
    assert(paths(v1) == dataBefore,
      "SQL DELETE on a MOR table rewrote data files")
    // aggregates can NOT answer from parquet footers on a dv table —
    // a pushed-down COUNT(*) would count the 20 deleted rows
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.default.mor_sql")
      .head.getLong(0) == 80)
    assert(spark.sql("SELECT SUM(v) AS s FROM graft.default.mor_sql")
      .head.getLong(0) == (21L to 100L).map(_ * 10).sum)
    // WHERE reads (manifest skipping path) apply dvs too
    assert(spark.sql(
      "SELECT k FROM graft.default.mor_sql WHERE k <= 25 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == (21L to 25L))
    // row-level UPDATE on the MOR table takes the DELTA path: matched
    // rows position-delete + re-insert, dv-deleted rows never resurrect,
    // and the pre-update data files stay byte-for-byte in the manifest
    spark.sql(
      "UPDATE graft.default.mor_sql SET v = v + 1 WHERE k BETWEEN 1 AND 30")
    assert(paths(ops.Layout.currentVersion(fs, root))
        .intersect(dataBefore) == dataBefore,
      "MOR UPDATE rewrote pre-update data files (expected the delta path)")
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.default.mor_sql")
      .head.getLong(0) == 80, "UPDATE resurrected dv-deleted rows")
    assert(spark.sql(
      "SELECT v FROM graft.default.mor_sql WHERE k = 25").head.getLong(0)
      == 251)
    // time travel: the pre-delete version still answers in full
    assert(spark.sql(
      s"SELECT * FROM graft.default.mor_sql VERSION AS OF $v0").count()
      == 100)
    // OPTIMIZE materializes the remaining vectors; answers unchanged
    spark.sql("CALL graft.system.compact('default.mor_sql')")
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.default.mor_sql")
      .head.getLong(0) == 80)
    assert(spark.sql(
      "SELECT v FROM graft.default.mor_sql WHERE k = 25").head.getLong(0)
      == 251)
  }
}
