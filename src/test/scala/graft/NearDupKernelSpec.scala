package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortedIntersectCount.{sortedIntersectAtLeast, sortedIntersectCount}

/** The r21 all-pairs fast path (length prefilter + early-exit threshold
  * kernel in [[ops.Text.dedupNearBroadcast]]) must keep the verified
  * pair set BIT-IDENTICAL to the full-count form it replaced: every cut
  * is an implied bound of the τ inequality, never a heuristic — this
  * spec pins that claim both at the kernel level (randomized sorted
  * arrays, threshold sweep) and at the operator level (the broadcast
  * path's pair set vs the unfiltered full-count reference on the
  * corpus). */
class NearDupKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("threshold kernel == (full count >= req) over randomized arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 2000).map { i =>
      val na = rnd.nextInt(12)
      val nb = rnd.nextInt(12)
      // overlapping value domain so intersections actually occur
      val a = Seq.fill(na)(rnd.nextInt(16).toLong).distinct.sorted
      val b = Seq.fill(nb)(rnd.nextInt(16).toLong).distinct.sorted
      (i.toLong, a, b, rnd.nextInt(14).toLong - 1) // req in [-1, 12]
    }
    val df = rows.toDF("id", "a", "b", "req")
    val out = df.select(col("id"),
      sortedIntersectAtLeast(col("a"), col("b"), col("req")).as("fast"),
      (sortedIntersectCount(col("a"), col("b")) >= col("req")).as("ref"))
      .collect()
    out.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2), s"id ${r.getLong(0)}")
    }
  }

  test("broadcast path pair set == unfiltered full-count reference") {
    val arr = ops.Text.shingleSets(spark, sf).where(size(col("hs")) > 0)
    // reference: the pre-r21 condition — full-count kernel on EVERY
    // ordered pair, integer-exact τ inequality, no prefilters
    val ref = arr.as("aa")
      .join(broadcast(arr.as("ab")),
        col("aa.doc_id") < col("ab.doc_id") &&
          sortedIntersectCount(col("aa.hs"), col("ab.hs")) *
            lit(15999995L) >=
            lit(5999995L) * (col("aa.n") + col("ab.n")))
      .select(col("aa.doc_id").as("da"), col("ab.doc_id").as("db"),
        sortedIntersectCount(col("aa.hs"), col("ab.hs")).as("c"),
        col("aa.n").as("na"), col("ab.n").as("nb"))
      .select(col("da"), col("db"),
        round(col("c").cast("double") /
          (col("na") + col("nb") - col("c")), 6).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val fast = ops.Text.dedupNearBroadcast(arr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(fast == ref)
    assert(fast.nonEmpty) // the corpus plants near-dup pairs; prove we saw them
  }
}
