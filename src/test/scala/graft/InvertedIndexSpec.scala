package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-design proof for lexical retrieval at 100 TB: the inverted
  * index (token, doc_id, tf) written bucketed-by-token makes every
  * posting-list join on `token` co-located — document-at-a-time scoring
  * (index ⋈ query-term table) runs with NO exchange on the index side,
  * which is the whole point of building the index.
  *
  * Also pins the library BM25 ([[graft.ops.Ranking.bm25]]) to the
  * oracle-contract form ([[graft.ops.Ranking.qBm25]]) on its fixed terms.
  */
class InvertedIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def dropTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val dir = new java.io.File(s"spark-warehouse/$t")
    if (dir.exists()) {
      import scala.reflect.io.Directory
      new Directory(dir).deleteRecursively()
    }
  }

  test("bucketed posting-list join is shuffle-free on the index side") {
    dropTable("inv_index")
    dropTable("query_terms")
    ops.Ranking.postings(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "token").sortBy("token")
      .saveAsTable("inv_index")
    // a query workload: per-term weights, bucketed the same way so the
    // scoring join co-locates (at scale this is the query-expansion /
    // decontamination probe set, thousands of terms)
    ops.Ranking.postings(spark, sf)
      .groupBy("token").agg(count(lit(1)).cast("double").as("w"))
      .limit(50)
      .write.mode("overwrite")
      .bucketBy(8, "token").sortBy("token")
      .saveAsTable("query_terms")

    val idx = spark.table("inv_index")
    val qt = spark.table("query_terms")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val scored = idx.join(qt, "token")
        .groupBy("doc_id")
        .agg(sum(col("tf").cast("double") * col("w")).as("score"))
      val plan = scored.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(token"),
        s"posting join shuffled:\n$plan")
      assert(scored.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("library bm25 matches the oracle-contract fixed-term form") {
    val lib = ops.Ranking.bm25(spark, sf, Seq("table", "hash", "window"))
      .select(col("doc_id"), round(col("bm25"), 4).as("bm25"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val contract = ops.Ranking.qBm25(spark, sf)
      .select(col("doc_id"), col("bm25"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(lib.keySet == contract.keySet)
    contract.foreach { case (id, v) =>
      assert(math.abs(lib(id) - v) < 1e-9, s"doc $id: ${lib(id)} vs $v")
    }
  }
}
