package graft

/** Dev utility: time the READ-ONLY half of the SPJ keys — the
  * fact⋈fact join over pre-built bucket tables — with v2 bucketing
  * toggled, isolating the shuffle the keyed scan elides from the table
  * builds that dominate the keyed bench entries.
  *
  *   runMain graft.SpjAb [sfDir]   (tables must exist — run the keys
  *                                  or the probe first)
  *
  * Not part of the driver contract. */
object SpjAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", Some(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new BenchProtocol.CpuListener
    spark.sparkContext.addSparkListener(cpu)
    val wh = s"${ops.Sources.ioDir(spark, sfDir)}/sql_catalog"
    val cat = sql.GraftSql.catalogFor(spark, wh)
    val q =
      s"""SELECT o.o_orderstatus, COUNT(*) AS n, SUM(l.qty) AS sq,
         |  SUM(o.price) AS sp
         |FROM $cat.default.orders_bkt o
         |JOIN $cat.default.lineitem_bkt l
         |  ON o.o_orderkey = l.l_orderkey
         |GROUP BY o.o_orderstatus""".stripMargin
    // broadcast off: the comparison is SPJ zip vs shuffle join, not
    // vs a broadcast that only exists at toy scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (side <- Seq("true", "false")) {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", side)
      val samples = (1 to 3).map { _ =>
        val c0 = cpu.snapshot(spark)
        val t0 = System.nanoTime()
        spark.sql(q).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9,
          (cpu.snapshot(spark) - c0) / 1e9)
      }
      val sh = spark.sql(q).queryExecution.executedPlan.toString
        .split('\n').count(_.contains("Exchange hashpartitioning"))
      println(f"SPJAB bucketing=$side wall=${samples.map(_._1).min}%.3f " +
        f"cpu=${samples.map(_._2).min}%.3f shuffles=$sh")
    }
    spark.stop()
  }
}
