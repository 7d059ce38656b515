package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime join-pruning proofs — the two mechanisms that make selective
  * fact⋈dim joins cheap at 100 TB WITHOUT any physical re-layout:
  *
  *  - Dynamic partition pruning (DPP): when the fact table is
  *    partitioned on the join key's functional source, the dim-side
  *    filter prunes fact DIRECTORIES at runtime (a subquery computes the
  *    surviving keys before the fact scan starts).
  *  - Runtime bloom filters: for unpartitioned fact tables, Spark
  *    injects a bloom filter built from the filtered dim side into the
  *    fact scan, dropping non-joining rows at the scan instead of at
  *    the join.
  *
  * Both are optimizer behaviors this engine RELIES on (the flagship
  * star join filters small dims hard); these tests pin them so a config
  * regression can't silently turn a pruned scan into a full scan. */
class RuntimeFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // thresholds sized so sf0.001 tables qualify for injection
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "100MB")
    .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("constant dim filters are inferred as STATIC partition filters") {
    val out = "target/graft_io/li_part_by_rf"
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val fact = spark.read.parquet(out)
    // the dim filter is a constant on the JOIN key, so Catalyst infers
    // l_returnflag = 'R' onto the fact side — pruning happens at
    // PLANNING time, stronger than DPP (no runtime subquery needed)
    val dim = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("rf")).distinct()
      .where(col("rf") === "R")
    val joined = fact.join(dim, fact("l_returnflag") === dim("rf"))
      .groupBy("rf").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    val scan = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("li_part_by_rf"))
      .getOrElse(fail(s"no partitioned fact scan in:\n${plan.take(1500)}"))
    assert(scan.contains("PartitionFilters: [(l_returnflag"), scan)
    val n = joined.collect()
    assert(n.length == 1 && n(0).getLong(1) > 0)
  }

  test("dynamic partition pruning fires when the dim filter is non-inferable") {
    import spark.implicits._
    val out = "target/graft_io/ord_part_by_pri"
    Tables.orders(spark, sf)
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    val fact = spark.read.parquet(out)
    // filter on an ATTRIBUTE column, not the join key: no constant can
    // be inferred, so pruning the fact directories requires the runtime
    // DPP subquery over the dim. The dim must be a file-based relation —
    // a local Seq would be constant-folded, leaving no Filter for the
    // PartitionPruning rule to find.
    val dimPath = "target/graft_io/pri_dim"
    Seq(
      ("1-URGENT", "keep"), ("2-HIGH", "keep"), ("3-MEDIUM", "drop"),
      ("4-NOT SPECIFIED", "drop"), ("5-LOW", "drop"))
      .toDF("pri", "tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).where(col("tag") === "keep")
    val joined = fact.join(dim, fact("o_orderpriority") === dim("pri"))
      .groupBy("pri").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n${plan.take(2000)}")
    val n = joined.collect()
    assert(n.length == 2 && n.forall(_.getLong(1) > 0))
  }

  test("runtime bloom filter is injected into the fact side of a selective join") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sf)
      val ord = Tables.orders(spark, sf)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
          optimized.contains("BloomFilter"),
        s"no runtime bloom filter in:\n${optimized.take(1500)}")
      assert(joined.collect()(0).get(0) != null)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
