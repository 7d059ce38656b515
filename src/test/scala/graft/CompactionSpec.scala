package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-file compaction (Layout.compact) must (1) cut the file count to
  * the byte-target bin count, (2) preserve every row byte-for-byte,
  * (3) keep — or create — the sorted layout that row-group/file skipping
  * needs, and (4) never leave the table in a mixed state (temp/backup
  * dirs must be gone after a successful pass). The chunked-append sink
  * (S8) is what produces the small-file layout this repairs. */
class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  private def parquetFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  /** Fragment `df` into ~n small files via append-cadence writes. */
  private def fragment(df: org.apache.spark.sql.DataFrame, dir: String,
                       n: Int): Unit =
    df.repartition(n).write.mode("overwrite").parquet(dir)

  test("compaction cuts file count and preserves content exactly") {
    val dir = "target/test_compact/orders"
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    fragment(src, dir, 40)
    assert(parquetFiles(dir).size == 40)
    val wantHash = src.agg(sum(xxhash64(col("o_orderkey"),
      col("o_orderstatus"), col("o_totalprice")).cast("decimal(38,0)")))
      .head.getDecimal(0)

    val stats = ops.Layout.compact(spark, dir,
      targetFileBytes = 128L << 20)
    assert(stats.filesBefore == 40)
    assert(stats.filesAfter < stats.filesBefore,
      s"no reduction: $stats")
    assert(parquetFiles(dir).size == stats.filesAfter)
    // order-independent content hash: nothing lost, nothing duplicated
    val gotHash = spark.read.parquet(dir).agg(sum(xxhash64(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .cast("decimal(38,0)"))).head.getDecimal(0)
    assert(gotHash == wantHash, "content changed across compaction")
    // the swap left no debris behind
    assert(!new java.io.File(dir + ".compact-tmp").exists())
    assert(!new java.io.File(dir + ".compact-bak").exists())
  }

  test("sorted compaction yields disjoint per-file key ranges (skipping)") {
    val dir = "target/test_compact/lineitem_sorted"
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    fragment(src, dir, 32)
    // small target so several output files survive to test disjointness
    val bytes = parquetFiles(dir).map(_.length).sum
    val stats = ops.Layout.compact(spark, dir,
      targetFileBytes = math.max(1L, bytes / 8),
      sortBy = Seq("l_orderkey"))
    assert(stats.filesAfter >= 4 && stats.filesAfter < 32, stats.toString)
    // per-file min/max on the sort key must not overlap — that is what
    // makes a point/range filter skip whole files and row groups
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: $hi1 > $lo2")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() == src.count())
  }

  test("incremental compaction re-packs only the small tail") {
    val dir = "target/test_compact/orders_incremental"
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    // 3 big files from the initial bulk load...
    src.repartition(3).write.mode("overwrite").parquet(dir)
    val bigNames = parquetFiles(dir).map(_.getName).toSet
    val bigMin = parquetFiles(dir).map(_.length).min
    // ...then an append burst leaves 24 small files behind
    src.limit(300).repartition(24).write.mode("append").parquet(dir)
    assert(parquetFiles(dir).size == 27)
    val total = spark.read.parquet(dir).count()

    val stats = ops.Layout.compact(spark, dir,
      targetFileBytes = 128L << 20, onlySmallerThan = Some(bigMin))
    // only the 24 small files were read and re-packed
    assert(stats.filesRewritten == 24, stats.toString)
    assert(stats.filesAfter < 27, stats.toString)
    // the 3 right-sized files were carried over untouched, by name
    val afterNames = parquetFiles(dir).map(_.getName).toSet
    assert(bigNames.subsetOf(afterNames),
      s"big files rewritten: ${bigNames -- afterNames}")
    // nothing lost, nothing duplicated
    assert(spark.read.parquet(dir).count() == total)
    assert(!new java.io.File(dir + ".compact-tmp").exists())
    assert(!new java.io.File(dir + ".compact-bak").exists())
    // a second pass finds at most the one merged tail file below the
    // threshold and declines to rewrite anything
    val again = ops.Layout.compact(spark, dir,
      targetFileBytes = 128L << 20, onlySmallerThan = Some(bigMin))
    assert(again.filesRewritten == 0, again.toString)
    assert(again.filesAfter == stats.filesAfter)
    // re-clustering cannot be combined with a partial rewrite
    intercept[IllegalArgumentException] {
      ops.Layout.compact(spark, dir, onlySmallerThan = Some(bigMin),
        sortBy = Seq("o_orderkey"))
    }
  }

  test("z-order compaction preserves rows and keeps both-column locality") {
    val dir = "target/test_compact/lineitem_z"
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    fragment(src, dir, 32)
    val bytes = parquetFiles(dir).map(_.length).sum
    val stats = ops.Layout.compact(spark, dir,
      targetFileBytes = math.max(1L, bytes / 8),
      zorderBy = Seq("l_orderkey", "l_partkey"))
    assert(stats.filesAfter < 32, stats.toString)
    assert(spark.read.parquet(dir).count() == src.count())
    // both-column locality: each file's (a, b) bounding rectangle covers
    // a strict subset of both value ranges (a z-file is a near-rectangle;
    // an unclustered file spans ~the full range of both)
    val glob = src.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head
    val (aLo, aHi, bLo, bHi) =
      (glob.getLong(0), glob.getLong(1), glob.getLong(2), glob.getLong(3))
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("alo"), max("l_orderkey").as("ahi"),
        min("l_partkey").as("blo"), max("l_partkey").as("bhi"))
      .collect()
    val narrowBoth = perFile.count { r =>
      val aSpan = (r.getLong(2) - r.getLong(1)).toDouble / (aHi - aLo)
      val bSpan = (r.getLong(4) - r.getLong(3)).toDouble / (bHi - bLo)
      aSpan <= 0.6 && bSpan <= 0.6
    }
    assert(narrowBoth * 2 >= perFile.length,
      s"only $narrowBoth/${perFile.length} files narrow in both dims")
  }
}
