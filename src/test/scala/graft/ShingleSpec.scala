package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ShingleSet.shingleSet

/** The [[graft.functions.ShingleSet]] codegen kernel must be
  * value-identical to the composed Spark form it replaced
  * (explode → xxhash64 → collect_set → sort_array): the near-dup oracle
  * (q_dedup_near) was proven against THAT form, so any drift here would
  * silently change the verified pair set. */
class ShingleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def composed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"),
      explode(ops.Text.bigrams(ops.Text.toks(col("text")))).as("sstr"))
      .select(col("doc_id"), xxhash64(col("sstr")).as("h"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("h"))).as("hs"))

  test("kernel == composed form on the corpus, doc for doc") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val viaExpr = docs.select(col("doc_id"), shingleSet(col("text")).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaComposed = composed(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr.size == 500) // kernel keeps sub-2-token docs (empty set)
    assert(viaComposed.keySet.subsetOf(viaExpr.keySet))
    viaComposed.foreach { case (id, hs) =>
      assert(viaExpr(id) == hs, s"doc $id")
    }
    // docs the composed form dropped (explode of empty) must be empty sets
    (viaExpr.keySet -- viaComposed.keySet).foreach { id =>
      assert(viaExpr(id).isEmpty, s"doc $id")
    }
  }

  test("kernel == composed form on adversarial strings") {
    import spark.implicits._
    // NOTE: zero-token strings ("", "  ") are excluded — the composed
    // reference form itself throws on them (slice with negative length);
    // the kernel's behavior there (empty set) is pinned separately below.
    val cases = Seq(
      "the quick brown fox", "single", "a b a b a b",
      "UPPER lower MiXeD", "num3r1c 42 42 42", "a", "a  b",
      "tab\tsep\nnewline", "punct,comma;semi.dot", "ção unicode é",
      "x" * 500, ("ab " * 200).trim)
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val viaExpr = df.select(col("doc_id"), shingleSet(col("text")).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaComposed = composed(df)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    viaComposed.foreach { case (id, hs) =>
      assert(viaExpr(id) == hs, s"case $id: '${cases(id.toInt)}'")
    }
    (viaExpr.keySet -- viaComposed.keySet).foreach { id =>
      assert(viaExpr(id).isEmpty, s"case $id")
    }
  }

  test("kernel returns empty sets where the composed form would throw") {
    import spark.implicits._
    val out = Seq("", "   ", "\t\n", ",;.").toDF("text")
      .select(shingleSet(col("text")).as("hs"))
      .collect().map(_.getSeq[Long](0))
    assert(out.forall(_.isEmpty))
  }
}
