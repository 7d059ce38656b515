package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HdrHistogram

/** Contract of the HDR-style histogram sketch (the mergeable quantile
  * column): exact determinism of the merge, the relative-error bound of
  * the bucketing, and the bucket/representative invariants. */
class HdrSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bucket/representative invariants across the long range") {
    val m = HdrHistogram.M
    // representative lies inside its bucket's interval, and bucketing is
    // monotone — probed across every octave plus boundary neighborhoods
    val probes = (0L to 300L) ++
      (m to 62).flatMap { e =>
        val base = 1L << e
        Seq(base - 1, base, base + 1, base + (base >> 1), (base << 1) - 1)
      }.filter(_ > 0)
    var prevBucket = -1
    probes.sorted.distinct.foreach { v =>
      val b = HdrHistogram.bucketOf(v)
      assert(b >= prevBucket, s"bucketing not monotone at $v")
      prevBucket = b
      val rep = HdrHistogram.repOf(b)
      // same bucket ⇒ rep within relative error 2^-m of v
      val err = math.abs(rep.toDouble - v.toDouble) / math.max(v, 1L)
      assert(err <= math.pow(2, -m) + 1e-15,
        s"rep $rep too far from $v (err $err)")
      assert(HdrHistogram.bucketOf(rep) == b,
        s"representative $rep escapes bucket $b of value $v")
    }
  }

  test("merge of per-shard sketches is BIT-identical to the direct sketch") {
    import graft.functions.HdrHistogram.hdrSketch
    val e = Events.events(spark, sf)
      .select(col("event_type"),
        (graft.Tables.dec2(col("value")) * 100).cast("long").as("cents"))
    def bytes(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Byte]] =
      df.groupBy("event_type").agg(hdrSketch(col("cents")).as("sk"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq)
        .toMap
    // counts add under union and serialization sorts buckets, so ANY
    // partitioning must produce the same bytes — the same-input ⇒
    // same-bytes contract that ruled out q-digest/KLL
    val direct = bytes(e.coalesce(1))
    val sharded = bytes(e.repartition(7, col("cents")))
    assert(direct == sharded, "sketch bytes depend on partitioning")
  }

  test("sketch quantiles stay within the 2^-M relative-error bound of exact") {
    val q = ops.Sketches.qHdrQuantiles(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // exact TYPE-1 (rank = ceil(p·n), no interpolation) — the sketch's
    // definition; comparing against Spark's interpolating `percentile`
    // conflates definitional differences with bucket error on small
    // groups. The bound under the matching definition is pure bucketing:
    // relative error ≤ 2^-M (plus 1 cent of midpoint rounding).
    val ps = Seq(0.5, 0.9, 0.99)
    val exact = Events.events(spark, sf)
      .select(col("event_type"),
        (graft.Tables.dec2(col("value")) * 100).cast("long").as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      .groupBy(_._1).map { case (t, vs) =>
        val sorted = vs.map(_._2).sorted
        t -> ps.map(p =>
          sorted(math.ceil(p * sorted.size).toLong.toInt - 1))
      }
    val tol = math.pow(2, -HdrHistogram.M)
    q.foreach { case (t, approx) =>
      approx.zip(exact(t)).zip(ps).foreach { case ((a, e), p) =>
        val err = math.abs(a * 100 - e)
        assert(err <= math.max(e * tol, 1.0),
          s"$t p$p: sketch $a exact ${e / 100.0} (err $err cents)")
      }
    }
  }
}
