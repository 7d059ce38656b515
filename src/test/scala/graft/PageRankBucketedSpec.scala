package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level proof of the warehouse-scale claim documented on
  * [[ops.Graph.qPagerank]]: with the edge list stored as a table bucketed
  * on `src`, a PageRank iteration's big join (edges ⋈ rank-contributions)
  * plans with NO shuffle exchange on either side — the contribution
  * vector derives from the same bucketed table, so its partitioning is
  * compatible by construction. The only data movement left per iteration
  * is the `groupBy(dst)` re-key, which is the algorithm's irreducible
  * shuffle (rank mass genuinely moves from src-keyed to dst-keyed).
  * At 100 TB this is the difference between 2 full-edge-list shuffles
  * per iteration and 0. */
class PageRankBucketedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bucketed edge table makes the PageRank iteration join shuffle-free") {
    spark.sql("DROP TABLE IF EXISTS pr_edges_bucketed")
    val dir = new java.io.File("spark-warehouse/pr_edges_bucketed")
    if (dir.exists()) {
      import scala.reflect.io.Directory
      new Directory(dir).deleteRecursively()
    }
    val pairs = Tables.lineitem(spark, sf)
      .select((col("l_suppkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    pairs.unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .write.mode("overwrite")
      .bucketBy(8, "src").sortBy("src")
      .saveAsTable("pr_edges_bucketed")

    val edges = spark.table("pr_edges_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // one iteration, exactly the qPagerank shape: out-degree and the
      // contribution vector BOTH derive from the bucketed table, keyed on
      // src, so the degree aggregate and the iteration join inherit the
      // bucket partitioning instead of shuffling
      val contribs = edges.groupBy(col("src").as("cnode"))
        .agg(count(lit(1)).as("deg"))
        .select(col("cnode"), expr("1000000 div deg").as("c"))
      val incoming = edges
        .join(contribs, edges("src") === col("cnode"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val plan = incoming.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      // neither the edge scan nor the src-keyed contribution aggregate
      // below the join may re-shuffle on the join key
      assert(!joinSection.contains("Exchange hashpartitioning(src"),
        s"edge side shuffled on src:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning(cnode"),
        s"contribution side shuffled:\n$plan")
      // the dst re-key above the join is the one legitimate exchange
      assert(plan.contains("Exchange hashpartitioning(dst"),
        s"expected exactly the dst re-key to remain:\n$plan")

      // semantics unchanged vs the un-bucketed plan on the same data
      val flat = pairs
        .unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
      val flatContribs = flat.groupBy(col("src").as("cnode"))
        .agg(count(lit(1)).as("deg"))
        .select(col("cnode"), expr("1000000 div deg").as("c"))
      val expected = flat.join(flatContribs, flat("src") === col("cnode"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        .orderBy("dst").collect()
      val got = incoming.orderBy("dst").collect()
      assert(got.sameElements(expected))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
