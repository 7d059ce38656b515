package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortedIntersectCount.sortedIntersectCount
import graft.functions.VectorExprs.dotProduct

/** Property-based invariants (SURVEY.md §5): the custom codegen kernels
  * must agree exactly with Spark's interpreted built-ins, and core
  * operator laws (dedup idempotence, filter containment, N:1 join count
  * preservation, comma-decimal round trip) must hold on generated data.
  *
  * Driver-side generation + one local-relation Spark job per case keeps
  * each property to a few seconds; minSuccessfulTests is tuned down from
  * scalacheck's default accordingly. */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def check(name: String, prop: Prop, n: Int = 20): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("SortedIntersectCount == size(array_intersect) on sorted long sets") {
    import spark.implicits._
    val gen = for {
      a <- Gen.listOf(Gen.chooseNum(-50L, 50L))
      b <- Gen.listOf(Gen.chooseNum(-50L, 50L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    check("intersect", Prop.forAll(gen) { case (a, b) =>
      val r = Seq((a, b)).toDF("a", "b").select(
        sortedIntersectCount(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
        .collect().head
      r.getLong(0) == r.getLong(1)
    })
  }

  test("DotProduct == interpreted aggregate(zip_with) fold, bit-exact") {
    import spark.implicits._
    val gen = Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0))
    check("dot", Prop.forAll(gen, gen) { (a: List[Double], b: List[Double]) =>
      val r = Seq((a, b)).toDF("a", "b").select(
        dotProduct(col("a"), col("b")).as("k"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0d), (acc, v) => acc + v).as("ref"))
        .collect().head
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    })
  }

  test("dedup is idempotent and keeps one row per key") {
    import spark.implicits._
    check("dedup", Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0, 20))) {
      keys: List[Int] =>
        val once = keys.toDF("k").dropDuplicates("k")
        once.count() == keys.distinct.length.toLong &&
          once.dropDuplicates("k").count() == once.count()
    }, n = 10)
  }

  test("filter output is contained in scan and satisfies the predicate") {
    import spark.implicits._
    check("filter", Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100, 100))) {
      xs: List[Int] =>
        val got = xs.toDF("x").where(col("x") > 0)
          .collect().map(_.getInt(0))
        got.forall(_ > 0) && got.sorted.sameElements(xs.filter(_ > 0).sorted)
    }, n = 10)
  }

  test("N:1 join preserves fact count under full FK coverage") {
    import spark.implicits._
    check("join", Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0, 9))) {
      facts: List[Int] =>
        val dim = (0 to 9).map(k => (k, s"d$k")).toDF("k", "name")
        facts.toDF("fk").join(dim, col("fk") === col("k"), "inner")
          .count() == facts.length.toLong
    }, n = 10)
  }

  test("scd2 collapses runs exactly, even under timestamp ties") {
    import spark.implicits._
    // events with heavy timestamp collisions (ts drawn from 5 values) —
    // the ordering tie-break on event_id must keep versioning total
    val gen = Gen.nonEmptyListOf(for {
      u  <- Gen.chooseNum(0L, 2L)
      ts <- Gen.chooseNum(0L, 4L)
      st <- Gen.oneOf("a", "b", "c")
    } yield (u, ts, st))
    check("scd2", Prop.forAll(gen) { rows =>
      val withIds = rows.zipWithIndex
        .map { case ((u, ts, st), i) => (u, i.toLong, ts, st) }
      val df = withIds.toDF("user_id", "event_id", "ts", "event_type")
      val got = ops.Behavior.scd2Versions(df)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toList
      val expected = withIds.groupBy(_._1).toList.flatMap {
        case (u, es) =>
          val runs = es.sortBy(e => (e._3, e._2))
            .foldLeft(List.empty[(String, Long)]) {
              case (acc, (_, _, ts, st)) =>
                if (acc.headOption.exists(_._1 == st)) acc
                else (st, ts) :: acc
            }.reverse
          runs.zipWithIndex.map { case ((st, from), i) =>
            (u, (i + 1).toLong, st, from)
          }
      }.sortBy(t => (t._1, t._2))
      got == expected
    }, n = 15)
  }

  test("scd2 merge == full recompute at every cut, even under ties") {
    import spark.implicits._
    // same heavy-collision stream as the scd2 property; the merge
    // renumbers the unioned history by (valid_from, vid), and this must
    // land byte-identical to the full recompute for ANY batch boundary —
    // the round-7 advice case: versions of one user sharing a valid_from
    val gen = Gen.nonEmptyListOf(for {
      u  <- Gen.chooseNum(0L, 2L)
      ts <- Gen.chooseNum(0L, 4L)
      st <- Gen.oneOf("a", "b", "c")
    } yield (u, ts, st))
    check("scd2merge", Prop.forAll(gen) { rows =>
      val withIds = rows.zipWithIndex
        .map { case ((u, ts, st), i) => (u, i.toLong, ts, st) }
      val df = withIds.toDF("user_id", "event_id", "ts", "event_type")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))
      val full = ops.Behavior.scd2Versions(df).drop("vid")
        .collect().map(key).sorted.toList
      // cuts at every distinct boundary incl. all-history and all-batch
      (0L to 5L).forall { cut =>
        val merged = ops.Behavior.scd2Merge(df, cut)
          .collect().map(key).sorted.toList
        merged == full
      }
    }, n = 10)
  }

  test("comma-decimal normalization round-trips DECIMAL(18,2) values") {
    import spark.implicits._
    check("commadec", Prop.forAll(Gen.chooseNum(-99999999L, 99999999L)) {
      cents: Long =>
        val dec = java.math.BigDecimal.valueOf(cents, 2)
        val back = Seq(dec.toPlainString.replace('.', ',')).toDF("s")
          .select(cnpj.Warehouse.commaDecimal(col("s")).as("d"))
          .collect().head.getDecimal(0)
        back.compareTo(dec) == 0
    }, n = 10)
  }

  test("FileBloom never false-negatives: agg-built bloom contains every inserted value") {
    import graft.functions.FileBloom
    // the one property that makes bloom skipping SAFE: a value that was
    // aggregated into the bloom must always test present (false
    // negatives would silently drop matching files — missing rows).
    // Built through the REAL aggregate (groupBy → FileBloomAgg), probed
    // through the REAL membership check Layout.survivesBloom uses.
    check("bloom long containment", Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      vs: List[Long] =>
        import spark.implicits._
        val bloom = vs.toDF("v")
          .agg(FileBloom.fileBloom(col("v"), 1024).as("b"))
          .collect().head.getAs[Array[Byte]](0)
        vs.forall(FileBloom.mightContainLong(bloom, _))
    }, n = 10)
    check("bloom string containment", Prop.forAll(
      Gen.nonEmptyListOf(Gen.asciiPrintableStr)) { vs: List[String] =>
        import spark.implicits._
        val bloom = vs.toDF("v")
          .agg(FileBloom.fileBloom(col("v"), 1024).as("b"))
          .collect().head.getAs[Array[Byte]](0)
        vs.forall(FileBloom.mightContainString(bloom, _))
    }, n = 10)
  }
}
