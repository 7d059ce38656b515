package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the non-SQL-expressible compression-ratio signal:
  * deterministic across runs, and ordered the way the corpus filter
  * relies on (repetitive boilerplate compresses far better than
  * natural-ish text). */
class CompressRatioSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("deflate ratios are deterministic and sane") {
    def run() = ops.QualitySignals.qCompressRatio(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val a = run()
    val b = run()
    assert(a == b, "deflate output not stable across runs")
    assert(a.nonEmpty)
    a.values.foreach { case (raw, defl, ratio) =>
      assert(raw > 0 && defl > 0)
      assert(ratio > 0.0 && ratio < 1.5) // deflate never wildly expands text
    }
  }

  test("repetitive boilerplate compresses much better than word soup") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam " * 400),                            // pure repetition
      (2L, (1 to 400).map(i => s"w${i * 7919 % 1000}").mkString(" "))
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("cr_docs")
    val ratios = docs.select(
      $"doc_id",
      org.apache.spark.sql.functions.udf { (t: String) =>
        val in = t.getBytes("UTF-8")
        val d = new java.util.zip.Deflater(6, false)
        d.setInput(in); d.finish()
        val buf = new Array[Byte](8192)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        d.end()
        n.toDouble / in.length
      }.apply($"text").as("r"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(ratios(1L) < 0.05, s"boilerplate ratio ${ratios(1L)}")
    assert(ratios(2L) > 0.15, s"word-soup ratio ${ratios(2L)}")
    assert(ratios(1L) < ratios(2L) / 3)
  }
}
