package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchKernels.{minHashSketch, simHash64}

/** Kernel-vs-composed-form pins for the per-row sketch expressions. */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("SimHash64 kernel == composed bit-vote aggregation, doc for doc") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val viaExpr = docs
      .select(col("doc_id"), simHash64(col("text")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the original composed form: explode distinct tokens, 64 vote sums,
    // sign → signature bit
    val tok = docs
      .select(col("doc_id"),
        explode(array_distinct(ops.Text.toks(col("text")))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val votes = tok.groupBy("doc_id").agg(
      sum(shiftright(col("h"), 0).bitwiseAND(1) * 2 - 1).as("b0"),
      (1 until 64).map(j =>
        sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"b$j")): _*)
    val composed = votes.select(col("doc_id"),
      (0 until 64).map(j =>
        when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(composed.nonEmpty)
    composed.foreach { case (id, sig) =>
      assert(viaExpr(id) == sig, s"doc $id")
    }
  }

  test("MinHashSketch: k mins, stable, monotone under set union") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(10L, 20L, 30L, 40L)),
      (3L, Seq.empty[Long])).toDF("id", "hs")
      .select(col("id"), minHashSketch(col("hs"), 8).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(df(1L).length == 8)
    assert(df(1L) == df(1L)) // deterministic
    // superset can only lower (or keep) each minhash
    df(1L).zip(df(2L)).foreach { case (a, b) => assert(b <= a) }
    assert(df(3L).isEmpty) // empty set → empty sketch, never a sentinel
  }

  test("identical documents share every minhash; disjoint sets share few") {
    import spark.implicits._
    val a = (1L to 60L).map(_ * 7919L)
    val b = (1L to 60L).map(_ * 104729L + 3L)
    val rows = Seq((1L, a), (2L, a), (3L, b)).toDF("id", "hs")
      .select(col("id"), minHashSketch(col("hs"), 32).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L) == rows(2L))
    val agree = rows(1L).zip(rows(3L)).count { case (x, y) => x == y }
    assert(agree < 8, s"disjoint sets agreed on $agree/32 minhashes")
  }
}
