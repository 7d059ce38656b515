package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins (r18): a graft table `PARTITIONED BY`
  * stages single-partition-value files (Layout.stageTxn fanout), the
  * manifest records min==max bounds per file, and the DSv2 scan
  * regroups the vectorized parquet read one-task-per-value reporting
  * KeyGroupedPartitioning (KeyedParquetScan) — so a join of two
  * co-partitioned tables on the partition column plans with NO shuffle
  * on either side. Pins:
  *   - the write invariant (every staged file single-valued, keys
  *     recoverable via Layout.spjFileKeys),
  *   - the shuffle-free join plan AND its result correctness vs the
  *     conf-off shuffle plan,
  *   - the shuffle-free grouped aggregate on the partition column,
  *   - graceful fallbacks: conf off, pruned-away partition column,
  *     WHERE-pruned subsets, non-groupable (double) partition type. */
class SpjSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val wh = "target/graft_io/spec/spj_catalog"
  private def cat = sql.GraftSql.catalogFor(spark, wh)

  /** Run `f` with v2 bucketing (the SPJ gate) set to `on`. */
  private def withSpj[T](on: Boolean)(f: => T): T = {
    val k = "spark.sql.sources.v2.bucketing.enabled"
    val pv = "spark.sql.sources.v2.bucketing.pushPartValues.enabled"
    val prev = (spark.conf.getOption(k), spark.conf.getOption(pv))
    spark.conf.set(k, on.toString)
    spark.conf.set(pv, "true")
    try f
    finally {
      prev._1.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      prev._2.fold(spark.conf.unset(pv))(spark.conf.set(pv, _))
    }
  }

  /** The FINAL physical plan (through AQE), after executing `df`. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
  }

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collectWithSubqueries { case e: ShuffleExchangeExec => e }

  private def mkTables(): (String, String) = {
    val c = cat
    val fact = s"$c.default.spj_fact"
    val dim = s"$c.default.spj_dim"
    spark.sql(s"DROP TABLE IF EXISTS $fact")
    spark.sql(s"DROP TABLE IF EXISTS $dim")
    spark.sql(s"""CREATE TABLE $fact
                |  (day BIGINT, uid BIGINT, v DOUBLE)
                |PARTITIONED BY (day)""".stripMargin)
    spark.sql(s"""CREATE TABLE $dim (day BIGINT, w DOUBLE)
                |PARTITIONED BY (day)""".stripMargin)
    // two fact inserts with different day domains (7 vs 5 days) so the
    // table holds SEVERAL files per day value and the sides' value sets
    // differ (exercises pushPartValues padding: dim has days 0..6 only)
    spark.sql(s"""INSERT INTO $fact
                |SELECT id % 7 AS day, id AS uid, id * 0.5 AS v
                |FROM range(0, 200)""".stripMargin)
    spark.sql(s"""INSERT INTO $fact
                |SELECT id % 5 AS day, id AS uid, id * 0.25 AS v
                |FROM range(200, 300)""".stripMargin)
    spark.sql(s"""INSERT INTO $dim
                |SELECT id AS day, id * 10.0 AS w FROM range(0, 7)"""
      .stripMargin)
    (fact, dim)
  }

  test("partitioned writes stage single-value files with manifest keys") {
    val (_, _) = mkTables()
    val dir = s"$wh/default/spj_fact"
    val head = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      ops.Layout.currentVersion(fs, root)
    }
    val keys = ops.Layout.spjFileKeys(spark, dir, head)
    assert(keys.isDefined,
      "every staged file of a PARTITIONED BY table must be single-valued")
    val (shape, byFile) = keys.get
    assert(shape == ops.Layout.SpjIdentity(Seq("day")))
    assert(byFile.nonEmpty)
    val values = byFile.values.map(_._2.head.asInstanceOf[Long]).toSet
    assert(values == (0L until 7L).toSet,
      s"expected day keys 0..6, got $values")
    // more files than values: both inserts fanned out per day
    assert(byFile.size > values.size,
      "two inserts must stage at least two files for overlapping days")
  }

  test("co-partitioned join plans with zero shuffles, results exact") {
    val (fact, dim) = mkTables()
    val q =
      s"""SELECT f.day, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(f.v * d.w) AS DOUBLE) AS s
         |FROM $fact f JOIN $dim d ON f.day = d.day
         |GROUP BY f.day ORDER BY f.day""".stripMargin
    val expected = withSpj(on = false) {
      spark.sql(q).collect().map(_.toString).toSeq
    }
    withSpj(on = true) {
      val bcOff = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.getOption(bcOff)
      spark.conf.set(bcOff, "-1") // pin the SPJ path, not a broadcast
      try {
        val df = spark.sql(q)
        val plan = finalPlan(df)
        val sh = shuffles(plan)
        assert(sh.isEmpty,
          s"co-partitioned join + grouped agg must not shuffle:\n$plan")
        assert(plan.toString.contains("KeyedParquetScan"),
          s"expected the keyed scan in:\n$plan")
        assert(df.collect().map(_.toString).toSeq == expected,
          "SPJ plan must produce exactly the shuffle plan's rows")
      } finally prev.fold(spark.conf.unset(bcOff))(
        spark.conf.set(bcOff, _))
    }
  }

  test("grouped aggregate on the partition column skips the exchange") {
    val (fact, _) = mkTables()
    withSpj(on = true) {
      val df = spark.sql(
        s"""SELECT day, CAST(SUM(v) AS DOUBLE) AS s
           |FROM $fact GROUP BY day""".stripMargin)
      val plan = finalPlan(df)
      assert(shuffles(plan).isEmpty,
        s"groupBy(partition col) over a keyed scan must not shuffle:\n$plan")
      assert(df.collect().length == 7)
    }
  }

  test("conf off falls back to the plain vectorized scan") {
    val (fact, _) = mkTables()
    withSpj(on = false) {
      val df = spark.sql(s"SELECT day, uid, v FROM $fact")
      val plan = finalPlan(df)
      assert(!plan.toString.contains("KeyedParquetScan"),
        s"bucketing off must not key the scan:\n$plan")
      assert(df.collect().length == 300)
    }
  }

  test("pruned-away partition column and WHERE subsets stay correct") {
    val (fact, _) = mkTables()
    withSpj(on = true) {
      // partition column absent from the output: the keyed report
      // cannot resolve — plan must degrade, never throw
      assert(spark.sql(s"SELECT uid FROM $fact").collect().length == 300)
      // manifest-pruned subset keys only surviving files
      val df = spark.sql(s"SELECT uid, v FROM $fact WHERE day = 3")
      val n = df.collect().length
      val exp = withSpj(on = false) {
        spark.sql(s"SELECT uid, v FROM $fact WHERE day = 3")
          .collect().length
      }
      assert(n == exp && n > 0)
    }
  }

  test("bucket(8, k) fact⋈fact join plans with zero shuffles, results exact") {
    val c = cat
    val a = s"$c.default.spj_bkt_a"
    val b = s"$c.default.spj_bkt_b"
    spark.sql(s"DROP TABLE IF EXISTS $a")
    spark.sql(s"DROP TABLE IF EXISTS $b")
    spark.sql(s"""CREATE TABLE $a (k BIGINT, v DOUBLE)
                |PARTITIONED BY (bucket(8, k))""".stripMargin)
    spark.sql(s"""CREATE TABLE $b (k BIGINT, w DOUBLE)
                |PARTITIONED BY (bucket(8, k))""".stripMargin)
    spark.sql(s"INSERT INTO $a SELECT id, id * 0.5 FROM range(0, 1000)")
    spark.sql(s"INSERT INTO $b SELECT id, id * 2.0 FROM range(500, 1500)")
    // write invariant: every staged file holds ONE bucket id
    val dir = s"$wh/default/spj_bkt_a"
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keys = ops.Layout.spjFileKeys(spark, dir,
      ops.Layout.currentVersion(fs, root))
    assert(keys.isDefined, "bucket table must key every staged file")
    assert(keys.get._1 == ops.Layout.SpjBucket("k", 8))
    assert(keys.get._2.values.map(_._2.head.asInstanceOf[Long]).toSet ==
      (0L until 8L).toSet)
    val q = s"SELECT a.k, a.v, b.w FROM $a a JOIN $b b ON a.k = b.k"
    val expected = withSpj(on = false) {
      spark.sql(q).collect().map(_.toString).sorted.toSeq
    }
    assert(expected.size == 500)
    withSpj(on = true) {
      val bcOff = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.getOption(bcOff)
      spark.conf.set(bcOff, "-1")
      try {
        val df = spark.sql(q)
        val plan = finalPlan(df)
        assert(shuffles(plan).isEmpty,
          s"co-bucketed fact⋈fact join must not shuffle either side:\n$plan")
        assert(plan.toString.contains("KeyedParquetScan"),
          s"expected keyed scans in:\n$plan")
        assert(df.collect().map(_.toString).sorted.toSeq == expected)
      } finally prev.fold(spark.conf.unset(bcOff))(
        spark.conf.set(bcOff, _))
    }
  }

  test("string bucket(8, k) join plans with zero shuffles; lookups prune") {
    // r19: string join keys (doc ids, UUIDs, URLs) are the common case
    // in LLM-pipeline tables — placement is pmod(xxhash64(k), 8) end to
    // end (fanout writer, #bucket groups, the V2 function's string
    // binding), and the co-bucketed join must elide its shuffles
    // exactly like the integral layout
    val c = cat
    val a = s"$c.default.spj_sbkt_a"
    val b = s"$c.default.spj_sbkt_b"
    spark.sql(s"DROP TABLE IF EXISTS $a")
    spark.sql(s"DROP TABLE IF EXISTS $b")
    spark.sql(s"""CREATE TABLE $a (k STRING, v DOUBLE)
                |PARTITIONED BY (bucket(8, k))""".stripMargin)
    spark.sql(s"""CREATE TABLE $b (k STRING, w DOUBLE)
                |PARTITIONED BY (bucket(8, k))""".stripMargin)
    spark.sql(s"INSERT INTO $a SELECT CONCAT('doc-', id), id * 0.5 " +
      "FROM range(0, 1000)")
    spark.sql(s"INSERT INTO $b SELECT CONCAT('doc-', id), id * 2.0 " +
      "FROM range(500, 1500)")
    // write invariant: every staged file holds ONE bucket id, and the
    // ids are the xxhash64 placement (0..7 all populated at this size)
    val dir = s"$wh/default/spj_sbkt_a"
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keys = ops.Layout.spjFileKeys(spark, dir,
      ops.Layout.currentVersion(fs, root))
    assert(keys.isDefined, "string bucket table must key every file")
    assert(keys.get._1 == ops.Layout.SpjBucket("k", 8))
    assert(keys.get._2.values.map(_._2.head.asInstanceOf[Long]).toSet ==
      (0L until 8L).toSet)
    val q = s"SELECT a.k, a.v, b.w FROM $a a JOIN $b b ON a.k = b.k"
    val expected = withSpj(on = false) {
      spark.sql(q).collect().map(_.toString).sorted.toSeq
    }
    assert(expected.size == 500)
    withSpj(on = true) {
      val bcOff = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.getOption(bcOff)
      spark.conf.set(bcOff, "-1")
      try {
        val df = spark.sql(q)
        val plan = finalPlan(df)
        assert(shuffles(plan).isEmpty,
          s"co-bucketed string join must not shuffle either side:\n$plan")
        assert(plan.toString.contains("KeyedParquetScan"),
          s"expected keyed scans in:\n$plan")
        assert(df.collect().map(_.toString).sorted.toSeq == expected)
      } finally prev.fold(spark.conf.unset(bcOff))(
        spark.conf.set(bcOff, _))
    }
    // the evaluable V2 function agrees with the writer on EVERY input,
    // including NULL (xxhash64 of a null child = the seed; the bound
    // function must not NPE — Spark may evaluate it to shuffle an
    // unbucketed third side into this placement)
    val bound = graft.sql.GraftBucketFunction.bind(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions
        .ScalarFunction[Integer]]
    val nullRow = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](8, null))
    assert(bound.produceResult(nullRow) ==
      org.apache.spark.sql.graft.BucketPlacement.idOfString(null, 8),
      "V2 function must place NULL keys where the writer does")
    // string point lookup prunes through the SAME hash the writer
    // placed by: only bucket strBucketId('doc-42', 8)'s files survive
    val (kept, total) = ops.Layout.fileSelection(spark, dir,
      Seq(ops.Layout.SkipEquals("k", "doc-42")))
    assert(total >= 8, s"expected >=8 one-bucket files, got $total")
    assert(kept.size <= total / 4,
      s"string bucket pruning kept ${kept.size} of $total")
    assert(spark.sql(s"SELECT COUNT(*) FROM $a WHERE k = 'doc-42'")
      .head.getLong(0) == 1)
  }

  test("keyed scans keep their statistics: small dim still broadcasts") {
    // join on a NON-partition column → SPJ can't apply; the 7-row dim
    // must still auto-broadcast, proving the keyed wrapper delegates
    // the inner scan's size estimate instead of losing it
    val (fact, dim) = mkTables()
    withSpj(on = true) {
      val df = spark.sql(
        s"SELECT f.uid, d.w FROM $fact f JOIN $dim d ON f.uid = d.day")
      val plan = finalPlan(df)
      assert(plan.toString.contains("BroadcastHashJoin"),
        s"small keyed dim must broadcast:\n$plan")
    }
  }

  test("asymmetric partition-value sets still join shuffle-free") {
    val c = cat
    val a = s"$c.default.spj_asym_a"
    val b = s"$c.default.spj_asym_b"
    spark.sql(s"DROP TABLE IF EXISTS $a")
    spark.sql(s"DROP TABLE IF EXISTS $b")
    spark.sql(s"""CREATE TABLE $a (day BIGINT, v DOUBLE)
                |PARTITIONED BY (day)""".stripMargin)
    spark.sql(s"""CREATE TABLE $b (day BIGINT, w DOUBLE)
                |PARTITIONED BY (day)""".stripMargin)
    spark.sql(s"INSERT INTO $a SELECT id % 7, id * 1.0 FROM range(0, 140)")
    // the dim side holds only days 0..3 — the fact's days 4..6 have NO
    // partner group; pushPartValues pads them with empty partitions
    // instead of falling back to a shuffle
    spark.sql(s"INSERT INTO $b SELECT id, id * 10.0 FROM range(0, 4)")
    val q = s"SELECT a.day, a.v, b.w FROM $a a JOIN $b b ON a.day = b.day"
    val expected = withSpj(on = false) {
      spark.sql(q).collect().map(_.toString).sorted.toSeq
    }
    assert(expected.size == 80) // 4 of 7 days survive
    withSpj(on = true) {
      val bcOff = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.getOption(bcOff)
      spark.conf.set(bcOff, "-1")
      try {
        val df = spark.sql(q)
        val plan = finalPlan(df)
        assert(shuffles(plan).isEmpty,
          s"asymmetric SPJ must pad, not shuffle:\n$plan")
        assert(df.collect().map(_.toString).sorted.toSeq == expected)
      } finally prev.fold(spark.conf.unset(bcOff))(
        spark.conf.set(bcOff, _))
    }
  }

  test("bucket point lookup prunes to the matching buckets' files") {
    val c = cat
    val t = s"$c.default.spj_bkt_prune"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v DOUBLE)
                |PARTITIONED BY (bucket(8, k))""".stripMargin)
    spark.sql(s"INSERT INTO $t SELECT id, id * 0.5 FROM range(0, 800)")
    val dir = s"$wh/default/spj_bkt_prune"
    // equality → exactly bucket pmod(42, 8) = 2's files survive
    val (kept, total) = ops.Layout.fileSelection(spark, dir,
      Seq(ops.Layout.SkipRange("k", 42L, 42L)))
    assert(total >= 8, s"expected >=8 one-bucket files, got $total")
    assert(kept.size <= total / 4,
      s"bucket pruning kept $kept of $total — the raw bounds can't " +
        "prune a hashed layout, the #bucket group must")
    // IN over two residues → two buckets' files
    val (keptIn, _) = ops.Layout.fileSelection(spark, dir,
      Seq(ops.Layout.SkipIn("k", Seq(42L, 43L))))
    assert(keptIn.size <= total / 2 && keptIn.size >= kept.size)
    // SQL WHERE takes the same decision and stays exact
    import org.apache.spark.sql.graft.SnapshotScanBuilder
    SnapshotScanBuilder.lastPrune = None
    assert(spark.sql(s"SELECT COUNT(*) FROM $t WHERE k = 42")
      .head.getLong(0) == 1)
    val prune = SnapshotScanBuilder.lastPrune
    assert(prune.exists { case (k2, t2) => k2 < t2 },
      s"SQL point lookup must bucket-prune, got $prune")
  }

  test("runtime filtering prunes keyed groups: DPP survives the SPJ wrap") {
    // r18 ADVICE (low): the keyed wrapper didn't forward runtime
    // filtering, so dynamic partition pruning was lost exactly on
    // SPJ-eligible scans. The keyed grouping IS the partition index:
    // a selective dim filter must prune the fact's groups at runtime.
    val c = cat
    val fact = s"$c.default.spj_dpp_fact"
    val dim = s"$c.default.spj_dpp_dim"
    spark.sql(s"DROP TABLE IF EXISTS $fact")
    spark.sql(s"DROP TABLE IF EXISTS $dim")
    spark.sql(s"""CREATE TABLE $fact (day BIGINT, v DOUBLE)
                |PARTITIONED BY (day)""".stripMargin)
    spark.sql(
      s"INSERT INTO $fact SELECT id % 7, id * 1.0 FROM range(0, 700)")
    spark.sql(s"CREATE TABLE $dim (day BIGINT, flag STRING)")
    spark.sql(s"INSERT INTO $dim SELECT id, IF(id = 3, 'keep', 'drop') " +
      "FROM range(0, 7)")
    val q = s"""SELECT f.day, COUNT(*) AS n, SUM(f.v) AS s
               |FROM $fact f JOIN $dim d ON f.day = d.day
               |WHERE d.flag = 'keep' GROUP BY f.day""".stripMargin
    val expected = withSpj(on = false) {
      spark.sql(q).collect().map(_.toString).sorted.toSeq
    }
    withSpj(on = true) {
      val df = spark.sql(q)
      val plan = finalPlan(df)
      assert(plan.toString.toLowerCase.contains("dynamicpruning"),
        s"expected a DPP subquery on the keyed fact scan:\n$plan")
      assert(df.collect().map(_.toString).sorted.toSeq == expected)
      // the scan instance itself was narrowed: one surviving group.
      // (walk through AQE query-stage leaves — collectWithSubqueries
      // alone stops at them)
      def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allNodes(q.plan)
        case _ => (p.children ++ p.subqueries).flatMap(allNodes)
      })
      val keyed = allNodes(plan).collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[org.apache.spark.sql.graft.KeyedParquetScan]
          => b.scan.asInstanceOf[org.apache.spark.sql.graft.KeyedParquetScan]
      }
      assert(keyed.nonEmpty, s"no keyed scan in:\n$plan")
      val parts = keyed.head.planInputPartitions().length
      assert(parts == 1,
        s"runtime filter should leave 1 of 7 groups, got $parts")
    }
    // a non-literal / unparseable predicate must be IGNORED, not
    // mis-prune: same query shape with an expression filter still exact
    withSpj(on = true) {
      assert(spark.sql(s"SELECT COUNT(*) FROM $fact f JOIN $dim d " +
        s"ON f.day = d.day WHERE d.flag <> 'drop'").head.getLong(0) == 100)
    }
  }

  test("compaction preserves SPJ eligibility on both layouts") {
    val c = cat
    def headKeys(dir: String) = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      ops.Layout.spjFileKeys(spark, dir,
        ops.Layout.currentVersion(fs, root))
    }
    // identity layout: many small per-day files → compact → still keyed
    val t1 = s"$c.default.spj_compact_id"
    spark.sql(s"DROP TABLE IF EXISTS $t1")
    spark.sql(s"""CREATE TABLE $t1 (day BIGINT, v DOUBLE)
                |PARTITIONED BY (day)""".stripMargin)
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO $t1 SELECT id % 4, id * 1.0 FROM range(${i * 40}, ${i * 40 + 40})"))
    val dir1 = s"$wh/default/spj_compact_id"
    val before = headKeys(dir1).get._2.size
    spark.sql(s"CALL $c.system.compact('default.spj_compact_id')")
    val after = headKeys(dir1)
    assert(after.isDefined,
      "compaction re-stages through the fanout — eligibility must survive")
    assert(after.get._2.size < before,
      s"compact must reduce files (${after.get._2.size} vs $before)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $t1").head.getLong(0) == 120)
    // bucket layout: same property
    val t2 = s"$c.default.spj_compact_bkt"
    spark.sql(s"DROP TABLE IF EXISTS $t2")
    spark.sql(s"""CREATE TABLE $t2 (k BIGINT, v DOUBLE)
                |PARTITIONED BY (bucket(4, k))""".stripMargin)
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO $t2 SELECT id, id * 1.0 FROM range(${i * 40}, ${i * 40 + 40})"))
    spark.sql(s"CALL $c.system.compact('default.spj_compact_bkt')")
    val k2 = headKeys(s"$wh/default/spj_compact_bkt")
    assert(k2.isDefined && k2.get._1 == ops.Layout.SpjBucket("k", 4))
    assert(spark.sql(s"SELECT COUNT(*) FROM $t2").head.getLong(0) == 120)
  }

  test("NULL partition rows disable SPJ soundly; GROUP BY stays exact") {
    val c = cat
    val t = s"$c.default.spj_nulls"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (day BIGINT, v DOUBLE)
                |PARTITIONED BY (day)""".stripMargin)
    spark.sql(s"""INSERT INTO $t
                |SELECT CASE WHEN id % 5 = 0 THEN NULL ELSE id % 3 END,
                |  id * 1.0 FROM range(60)""".stripMargin)
    // the NULL rows' file carries no null-proved #p group → the
    // snapshot must NOT claim a partitioning (a keyed scan would emit
    // the NULL group's rows under several partitions)
    val dir = s"$wh/default/spj_nulls"
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ops.Layout.spjFileKeys(spark, dir,
      ops.Layout.currentVersion(fs, root)).isEmpty,
      "a snapshot with NULL partition rows must not be SPJ-eligible")
    withSpj(on = true) {
      val rows = spark.sql(
        s"SELECT day, COUNT(*) AS n FROM $t GROUP BY day").collect()
      assert(rows.length == 4, s"3 days + ONE null group, got " +
        rows.map(_.toString).mkString(","))
      assert(rows.count(_.isNullAt(0)) == 1)
      assert(rows.find(_.isNullAt(0)).get.getLong(1) == 12)
    }
  }

  test("dropping or renaming the bucket column is refused while bucketed") {
    val c = cat
    val t = s"$c.default.spj_bkt_ddl"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v DOUBLE)
                |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql(s"INSERT INTO $t SELECT id, id * 1.0 FROM range(40)")
    val eDrop = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t DROP COLUMN k")
    }
    assert(eDrop.getMessage.contains("graft.bucket.by"), eDrop.getMessage)
    assert(spark.sql(s"SELECT COUNT(*) FROM $t").head.getLong(0) == 40)
  }

  test("layout props are ALTER-immutable: no path to a mis-keyed table") {
    // r18 verdict defect: SET TBLPROPERTIES ('graft.bucket.count'='8')
    // on a table written under bucket(16) would reinterpret recorded
    // #bucket groups (placed by pmod(k,16)) under the new modulus —
    // bucket pruning would drop matching files and the scan would
    // report a KeyGroupedPartitioning the data doesn't satisfy, so a
    // co-partitioned join elides its shuffle unsoundly. The only sound
    // answer is the ColumnMappingProp treatment: refuse SET and UNSET
    // of all three layout props outright.
    val c = cat
    val t = s"$c.default.spj_props_ddl"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (k BIGINT, v DOUBLE)
                |PARTITIONED BY (bucket(16, k))""".stripMargin)
    spark.sql(s"INSERT INTO $t SELECT id, id * 1.0 FROM range(64)")
    for (ddl <- Seq(
        s"ALTER TABLE $t SET TBLPROPERTIES ('graft.bucket.count'='8')",
        s"ALTER TABLE $t SET TBLPROPERTIES ('graft.bucket.by'='v')",
        s"ALTER TABLE $t SET TBLPROPERTIES ('graft.partitioned.by'='v')",
        s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.bucket.count')",
        s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.bucket.by')",
        s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.partitioned.by')")) {
      val e = intercept[Exception] { spark.sql(ddl) }
      assert(e.getMessage.contains("CREATE-time immutable") &&
          e.getMessage.contains("evolve_layout") &&
          e.getMessage.contains("relayout"),
        s"$ddl must refuse naming both layout-change doors, got: " +
          e.getMessage)
    }
    // the refusals committed nothing: the layout survives intact and
    // the keyed scan still reports the CREATE-time transform
    val dir = s"$wh/default/spj_props_ddl"
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keys = ops.Layout.spjFileKeys(spark, dir,
      ops.Layout.currentVersion(fs, root))
    assert(keys.isDefined, "layout must survive the refused DDLs")
    withSpj(on = true) {
      assert(spark.sql(s"SELECT SUM(v) FROM $t").head.getDouble(0) ==
        (0 until 64).map(_.toDouble).sum)
    }
  }

  test("double-typed partition column is not SPJ-groupable") {
    val c = cat
    val t = s"$c.default.spj_double"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (g DOUBLE, v BIGINT)
                |PARTITIONED BY (g)""".stripMargin)
    spark.sql(
      s"INSERT INTO $t SELECT CAST(id % 3 AS DOUBLE), id FROM range(30)")
    val dir = s"$wh/default/spj_double"
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ops.Layout.spjFileKeys(spark, dir,
        ops.Layout.currentVersion(fs, root)).isEmpty,
      "double bounds must not claim a partition key")
    withSpj(on = true) {
      assert(spark.sql(s"SELECT * FROM $t").collect().length == 30)
    }
  }
}
