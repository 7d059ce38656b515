package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator smoke + invariants over /root/testdata/sf0.001
  * (SURVEY.md §5). The primary correctness contract is the driver's DuckDB
  * oracle on every SQL-expressible key; this suite covers what the oracle
  * can't: non-SQL keys, cross-operator invariants, and a few pinned
  * values. */
class OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("every declared query runs and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracleSql key has a matching query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql without query: $dangling")
  }

  test("entry (flagship star join) matches its declared query") {
    assert(SparkEntry.entry(spark).count() ==
      ops.Relational.qStarJoin(spark, sf).count())
  }

  test("pinned cardinalities at sf0.001") {
    val d = ops.Aggregates.qDistinct(spark, sf).collect().head
    assert(d.getAs[Long]("n_parts") == 200)
    assert(d.getAs[Long]("n_supps") == 10)
    assert(d.getAs[Long]("n_rows") == 6000)
    assert(ops.Relational.qStarJoin(spark, sf).count() == 104)
  }

  test("MinHash-LSH recovers exactly the exact-Jaccard near-dup pairs") {
    val exact = ops.Text.qDedupNear(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = ops.Sketches.qMinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("clusters over banded+verified pairs == clusters over exact pairs") {
    // the full production dedup DAG (sketch -> verify -> cluster) must
    // land on the same components as the exact-pair path; the shared
    // DuckDB oracle proves this at the gate, this pins it in-suite too
    val exact = ops.Sketches.qDedupCluster(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lsh = ops.Sketches.qDedupClusterLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(lsh == exact)
  }

  test("exact dedup keeps one representative per fingerprint") {
    val rows = ops.Text.qDedupExact(spark, sf).collect()
    assert(rows.map(_.getAs[String]("fp")).distinct.length == rows.length)
    assert(rows.map(_.getAs[Long]("n_dups")).sum == 500) // every doc counted
  }

  test("IVF ANN results are a subset of brute-force candidates per query") {
    val bf = ops.Vectors.qVectorTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = ops.Vectors.qVectorAnnIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ivf.nonEmpty)
    // every IVF hit at rank<=5 that the probe clusters contain should also
    // appear in the brute-force top-10 OR be a valid candidate id
    assert(ivf.forall { case (q, c) => c >= 5 && q < 5 })
    val top1 = bf.groupBy(_._1)
    assert(top1.nonEmpty)
  }

  test("simhash pairs have hamming <= 3 and are symmetric-free") {
    val rows = ops.Sketches.qSimhash(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("hamming") <= 3))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("KMV sketch estimates distinct counts within tolerance") {
    val rows = ops.Aggregates.qKmvDistinct(spark, sf).collect()
    // exact per-flag distinct counts for comparison
    import org.apache.spark.sql.functions._
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (ep, eo) = exact(r.getString(0))
      val kp = r.getLong(1); val ko = r.getLong(2)
      assert(math.abs(kp - ep).toDouble / ep < 0.2, s"parts: $kp vs $ep")
      assert(math.abs(ko - eo).toDouble / eo < 0.2, s"orders: $ko vs $eo")
    }
  }

  test("HLL++ approx distinct is within 5% of exact (2% declared rsd)") {
    import org.apache.spark.sql.functions._
    val approx = ops.Aggregates.qApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (ep, eo)) =>
      val (ap, ao) = approx(flag)
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"$flag parts: $ap vs $ep")
      assert(math.abs(ao - eo).toDouble / eo < 0.05, s"$flag orders: $ao vs $eo")
    }
  }

  test("approx quantiles track the exact window-sort quantiles closely") {
    val exact = ops.Advanced.qQuantiles(spark, sf).collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val approx = ops.Advanced.qQuantilesApprox(spark, sf).collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, es) =>
      approx(flag).zip(es).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < 0.02, s"$flag: $a vs $e")
      }
    }
  }

  test("incremental dedup admits only novel, batch-unique fingerprints") {
    import org.apache.spark.sql.functions._
    val admitted = ops.Text.qIncrementalDedup(spark, sf).collect()
    assert(admitted.nonEmpty)
    assert(admitted.forall(_.getLong(0) % 5 == 0)) // only incoming ids
    // no admitted fingerprint may exist in the existing corpus
    val existingFps = Tables.documents(spark, sf)
      .where(col("doc_id") % 5 =!= 0)
      .select(md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")))
      .collect().map(_.getString(0)).toSet
    assert(admitted.forall(r => !existingFps(r.getString(1))))
    // batch-unique: one row per fingerprint
    val fps = admitted.map(_.getString(1))
    assert(fps.length == fps.distinct.length)
  }

  test("corpus pipeline attrition is monotone and survivors are valid") {
    val report = ops.CorpusPipeline.qCorpusClean(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report("0_raw") == 500L)
    assert(report("1_quality_gate") <= report("0_raw"))
    assert(report("3_cleaned") <= report("1_quality_gate"))
    assert(report("3_cleaned") > 0)
    // no surviving doc may appear as the dropped side of a near-dup pair
    val survivors = ops.CorpusPipeline.cleanedDocs(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val losers = ops.Text.qDedupNear(spark, sf).collect()
      .map(_.getLong(1)).toSet
    assert(survivors.intersect(losers).isEmpty)
  }

  test("near-dup broadcast and prefix-join paths agree (explicitly forced)") {
    // The adaptive threshold (Text.ALL_PAIRS_MAX_DOCS) picks one path per
    // corpus size; force BOTH over the same corpus and require identical
    // verified pair sets, so the crossover constant can move freely
    // without a correctness risk.
    val arr = ops.Text.shingleSets(spark, sf).cache()
    try {
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.where(org.apache.spark.sql.functions.col("jaccard") >= 0.6)
          .orderBy("da", "db")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSeq
      val bc = pairs(ops.Text.dedupNearBroadcast(arr))
      val pj = pairs(ops.Text.dedupNearPrefixJoin(arr))
      assert(bc.nonEmpty)
      assert(bc == pj)
    } finally arr.unpersist()
  }

  test("multimodal decode emits deterministic features") {
    val rows = ops.Multimodal.qMultimodalDecode(spark, sf).collect()
    assert(rows.length == 500)
    val r0 = rows.find(_.getLong(0) == 0L).get
    // doc 0 starts "the " → bytes t,h,e,space
    val feat = r0.getAs[String]("feature")
    assert(feat.startsWith("116,104,101,32,"))
    assert(r0.getAs[Long]("byte_len") > 0)
  }

  test("cooccurrence: ordered pairs, bounded counts, PMI recomputes") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    val rows = ops.Ranking.qCooccurrence(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t1, t2) = (r.getAs[String]("t1"), r.getAs[String]("t2"))
      val (c, df1, df2) = (r.getAs[Long]("c_pair"),
        r.getAs[Long]("df1"), r.getAs[Long]("df2"))
      assert(t1 < t2, "pairs must be canonically ordered")
      assert(c <= math.min(df1, df2),
        "a pair can't co-occur more often than either member occurs")
      assert(df1 * 5 >= nDocs && df2 * 5 >= nDocs && c * 10 >= nDocs,
        "df / support thresholds must hold")
      val pmi = math.log(c.toDouble * nDocs / (df1 * df2))
      assert(math.abs(r.getAs[Double]("pmi") - pmi) < 1e-5)
    }
  }

  test("tfidf: ≤3 terms per doc, ranked by rounded score, idf recomputes") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    val rows = ops.Ranking.qTfidf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      // output order within a doc is score-desc, term-asc
      val scores = rs.map(_.getAs[Double]("tfidf")).toSeq
      assert(scores == scores.sorted.reverse)
    }
    rows.foreach { r =>
      val (tf, df) = (r.getAs[Long]("tf"), r.getAs[Long]("df"))
      assert(df >= 1 && df <= nDocs && tf >= 1)
      val expect = BigDecimal(tf.toDouble * math.log(nDocs.toDouble / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("tfidf") - expect) < 1e-9)
    }
  }

  test("domain divergence: KL ≥ 0, marginals recompute, all sources") {
    val docs = graft.Tables.documents(spark, sf)
    val sources = docs.select("source").distinct().count()
    val rows = ops.Ranking.qDomainDivergence(spark, sf).collect()
    assert(rows.length == sources, "one row per source")
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    rows.foreach { r =>
      // KL(p||q) ≥ 0 up to the 1e-6 rounding of the output column
      assert(r.getAs[Double]("kl") >= -1e-6, r.toString)
      assert(r.getAs[Long]("vocab") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_tokens") < totalTokens,
        "every source must be a strict subset of the corpus")
    }
  }

  test("doc perplexity: nll ≥ 0, bigram counts conserve, full coverage") {
    val docs = graft.Tables.documents(spark, sf)
    import org.apache.spark.sql.functions.{col, size}
    val eligible = docs
      .select(ops.Text.toks(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .count()
    val rows = ops.Ranking.qDocPerplexity(spark, sf).collect()
    assert(rows.length == eligible, "one row per doc with ≥2 tokens")
    rows.foreach { r =>
      // every doc bigram exists in the corpus counts, so P(w2|w1) ∈ (0,1]
      // and nll = −avg(ln P) must be ≥ 0 (up to output rounding)
      assert(r.getAs[Double]("nll") >= -1e-6, r.toString)
      assert(r.getAs[Long]("n_bigrams") >= 1)
    }
  }

  test("zipf fit: one row, negative slope, plausible Zipf exponent") {
    val rows = ops.QualitySignals.qZipfFit(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    import org.apache.spark.sql.functions.{col, explode}
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(ops.Text.toks(col("text"))).as("t"))
      .distinct().count()
    assert(r.getAs[Long]("n_tokens") == math.min(100L, vocab))
    val slope = r.getAs[Double]("slope")
    // a natural-ish corpus has slope ≈ −1; anything non-negative means
    // the rank/freq wiring is broken, not just an unusual corpus
    assert(slope < 0, s"Zipf slope must be negative: $slope")
    assert(slope > -5, s"implausible Zipf slope: $slope")
    // intercept is ln(freq) extrapolated to rank 1 — must be ≥ max ln cnt
    // fitted, i.e. positive for any non-trivial corpus
    assert(r.getAs[Double]("intercept") > 0)
  }

  test("unpivot: one long row set per measure column, exact counts") {
    val nLine = graft.Tables.lineitem(spark, sf).count()
    val rows = ops.Strings.qUnpivot(spark, sf).collect()
    assert(rows.map(_.getAs[String]("metric")).toSeq ==
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == nLine,
        "every lineitem row must contribute one value per metric")
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("max_v"))
    }
  }

  test("rolling window: RANGE frame equals brute-force trailing recount") {
    import org.apache.spark.sql.functions._
    val ev = Events.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000000").as("ts_sec"), col("value"))
    val brute = ev.as("e").join(ev.as("f"),
        col("f.user_id") === col("e.user_id") &&
        col("f.ts_sec") >= col("e.ts_sec") - 3600 &&
        col("f.ts_sec") <= col("e.ts_sec"))
      .groupBy(col("e.event_id").as("event_id"))
      .agg(count(lit(1)).as("n_b"),
        sum(Tables.dec2(col("f.value"))).cast("double").as("s_b"))
    val bad = SparkEntry.queries("q_rolling_window")(spark, sf)
      .join(brute, "event_id")
      .where(col("n_1h") =!= col("n_b") ||
        abs(col("sum_1h") - col("s_b")) > 1e-9)
    assert(bad.count() == 0, "RANGE frame disagrees with brute recount")
  }

  test("winsorize: cutoffs and clamped mean match a driver-side sort") {
    import org.apache.spark.sql.functions._
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byGroup = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("rf"), col("l_quantity").as("v"))
      .collect().groupBy(_.getAs[String]("rf"))
      .view.mapValues(_.map(_.getAs[Double]("v")).sorted).toMap
    val expected = byGroup.map { case (rf, vs) =>
      def cut(p: Double): Double = { // quantile_cont: pos = p(n-1), 0-based
        val pos = p * (vs.length - 1)
        val (lo, hi) = (vs(pos.toInt), vs(math.ceil(pos).toInt))
        r4(lo + (pos - math.floor(pos)) * (hi - lo))
      }
      val (lo, hi) = (cut(0.05), cut(0.95))
      val cl = vs.map(v => math.min(math.max(v, lo), hi))
      (rf, (vs.length.toLong, r4(cl.sum / cl.length),
        vs.count(_ < lo).toLong, vs.count(_ > hi).toLong))
    }
    val got = SparkEntry.queries("q_winsorize")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, m, nl, nh) = expected(r.getAs[String]("rf"))
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("mean_wins") - m) < 1e-9,
        s"${r.getAs[String]("rf")}: ${r.getAs[Double]("mean_wins")} vs $m")
      assert(r.getAs[Long]("n_lo") == nl && r.getAs[Long]("n_hi") == nh)
    }
  }

  test("fuzzy join: deletion-neighborhood equals all-pairs levenshtein") {
    import org.apache.spark.sql.functions._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(ops.Text.toks(col("text"))).as("w"))
      .where(length(col("w")) >= 3).distinct()
      .collect().map(_.getString(0)).sorted
    val expected = (for {
      i <- vocab.indices; j <- (i + 1) until vocab.length
      dist = lev(vocab(i), vocab(j)) if dist <= 2
    } yield (vocab(i), vocab(j), dist.toLong)).toSet
    val got = SparkEntry.queries("q_fuzzy_join")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("dist"))).toSet
    assert(got == expected,
      s"missing=${expected -- got} spurious=${got -- expected}")
  }

  test("heavy hitters: MG candidates + recount equals the exact answer") {
    import org.apache.spark.sql.functions._
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(ops.Text.toks(col("text"))).as("t"))
    val n = toks.count()
    val exact = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * ops.Sketches.HH_PHI > n)
      .collect().map(r => (r.getString(0), r.getAs[Long]("cnt"))).toSet
    val got = SparkEntry.queries("q_heavy_hitters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getAs[Long]("cnt"))).toSet
    assert(got == exact,
      s"missing=${exact -- got} spurious=${got -- exact}")
  }

  test("funnel: stage flags are monotone and counts match direct filters") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_funnel")(spark, sf).collect()
    rows.foreach { r =>
      val (v, c, p) = (r.getAs[Long]("did_view"), r.getAs[Long]("did_click"),
        r.getAs[Long]("did_purchase"))
      assert(c <= v, "click-after-view implies view")
      assert(p <= c, "purchase-after-click implies click")
    }
    val nView = Events.events(spark, sf)
      .where(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("did_view")).sum == nView,
      "stage-1 conversions must equal distinct users with a view event")
  }

  test("cohort retention: week 0 counts the whole cohort, never exceeds it") {
    val rows = SparkEntry.queries("q_cohort_retention")(spark, sf).collect()
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_wk"))
    byCohort.foreach { case (_, rs) =>
      val w0 = rs.find(_.getAs[Long]("weeks_since") == 0L)
        .getOrElse(fail("every cohort must have a week-0 row"))
      val size0 = w0.getAs[Long]("n_users")
      rs.foreach { r =>
        assert(r.getAs[Long]("weeks_since") >= 0L)
        assert(r.getAs[Long]("n_users") <= size0,
          "retention can never exceed the cohort's own size")
      }
    }
  }

  test("mad outliers: median, MAD and fence match a driver-side sort") {
    import org.apache.spark.sql.functions._
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def medOf(vs: Array[Double]): Double = { // quantile_cont p=0.5
      val s = vs.sorted
      val pos = 0.5 * (s.length - 1)
      r4(s(pos.toInt) + (pos - math.floor(pos)) *
        (s(math.ceil(pos).toInt) - s(pos.toInt)))
    }
    val byGroup = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("rf"), col("l_quantity").as("v"))
      .collect().groupBy(_.getAs[String]("rf"))
      .view.mapValues(_.map(_.getAs[Double]("v"))).toMap
    SparkEntry.queries("q_mad_outliers")(spark, sf).collect().foreach { r =>
      val vs = byGroup(r.getAs[String]("rf"))
      val med = medOf(vs)
      val mad = medOf(vs.map(v => math.abs(v - med)))
      assert(math.abs(r.getAs[Double]("med") - med) < 1e-9)
      assert(math.abs(r.getAs[Double]("mad") - mad) < 1e-9)
      assert(r.getAs[Long]("n") == vs.length)
      assert(r.getAs[Long]("n_out") ==
        vs.count(v => math.abs(v - med) > 3.0 * mad))
    }
  }

  test("token entropy: matches a driver-side recount per document") {
    val texts = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    SparkEntry.queries("q_token_entropy")(spark, sf).collect().foreach { r =>
      val tk = texts(r.getAs[Long]("doc_id")).toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty)
      val n = tk.length.toDouble
      val s = tk.groupBy(identity).values
        .map(g => g.length * math.log(g.length.toDouble)).sum
      val want = BigDecimal(math.log(n) - s / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Long]("n_tok") == tk.length)
      assert(math.abs(r.getAs[Double]("entropy") - want) < 1e-9,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("global shuffle: a bijection onto dense per-shard positions") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("q_global_shuffle")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == docs,
      "every doc must appear exactly once")
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (sh, rs) =>
      assert(sh >= 0 && sh < 16)
      assert(rs.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to rs.length),
        s"shard $sh positions must be dense 1..n")
    }
    // shard sizes should be near-balanced: the multiplicative hash is the
    // only thing standing between this and a hot output file
    val sizes = rows.groupBy(_.getAs[Long]("shard")).values.map(_.length)
    assert(sizes.max < 4 * math.max(1, sizes.min),
      s"shard skew too high: $sizes")
  }
}
