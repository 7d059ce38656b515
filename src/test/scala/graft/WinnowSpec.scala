package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WinnowFingerprint
import graft.functions.WinnowFingerprint.winnowFingerprint

/** Contracts of the winnowing rolling-hash fingerprint kernel. */
class WinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def fps(texts: String*): Seq[Set[Long]] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), winnowFingerprint(col("text")).as("f"))
      .collect().sortBy(_.getLong(0))
      .map(_.getSeq[Long](1).toSet).toSeq
  }

  test("MOSS guarantee: shared span >= w+k-1 chars => shared fingerprint") {
    val shared = "the cardinal rule of winnowing is locality of selection"
    assert(shared.length >= WinnowFingerprint.W + WinnowFingerprint.K - 1)
    val Seq(a, b) = fps(
      s"completely unrelated preamble text here $shared and then one tail",
      s"zzz qqq different opening material $shared closing words differ too")
    assert(a.intersect(b).nonEmpty,
      "docs sharing a long span must share a fingerprint")
  }

  test("disjoint documents share no fingerprints; identical share all") {
    val Seq(a, b, c) = fps(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten eleven",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    assert(a.intersect(b).isEmpty)
    assert(a == c)
  }

  test("near-dup corpus pairs overlap heavily; background pairs do not") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), winnowFingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val pairs = ops.Text.qDedupNear(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    def jac(a: Set[Long], b: Set[Long]): Double =
      if (a.isEmpty && b.isEmpty) 0.0
      else a.intersect(b).size.toDouble / a.union(b).size
    // every verified near-dup pair shares fingerprints
    pairs.foreach { case (da, db) =>
      assert(jac(docs(da), docs(db)) > 0.3, s"near-dup ($da,$db)")
    }
    // background pairs (adjacent ids not in the pair set) share almost none
    val dup = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val background = docs.keys.toSeq.sorted.sliding(2)
      .collect { case Seq(x, y) if !dup(x) && !dup(y) => (x, y) }
      .take(50).toSeq
    val bgHigh = background.count { case (x, y) => jac(docs(x), docs(y)) > 0.3 }
    assert(bgHigh == 0, s"$bgHigh background pairs overlapped")
  }

  test("short texts: below k chars -> empty, exactly k -> one fingerprint") {
    val Seq(tiny, exact) = fps("ab", "abcdefgh")
    assert(tiny.isEmpty)
    assert(exact.size == 1)
  }
}
