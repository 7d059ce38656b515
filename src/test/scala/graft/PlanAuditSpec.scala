package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard — the 100 TB checklist as assertions:
  * filters pushed into the parquet scan, projection pruned, dims
  * broadcast, aggregates partial+final, kernels inside WholeStageCodegen.
  * If a refactor silently breaks pushdown or broadcasting, this fails
  * before any benchmark notices. */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // audit plans AS DEPLOYED: GraftSession installs the extensions
    // (TopKStrategy + RowNumberTopKRewrite), so the audited shapes must
    // be the extension-enabled ones. Clearing the handles makes this
    // deterministic regardless of which suite ran first.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("star join pushes IN filters into the parquet scans") {
    val p = plan("q_star_join")
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("In(l_partkey"), "l_partkey IN not pushed")
    assert(p.contains("In(o_orderstatus"), "o_orderstatus IN not pushed")
  }

  test("star join broadcasts every dimension") {
    val p = plan("q_star_join")
    // 4 joins total; at sf0.001 all are broadcastable — at minimum the
    // two explicit broadcast(dim) hints must be BroadcastHashJoin
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("projection is pruned at the scan (no unneeded columns read)") {
    val p = plan("q_projection")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema in:\n$p"))
    assert(!readSchema.contains("l_tax"), readSchema)
    assert(!readSchema.contains("l_shipdate"), readSchema)
    assert(readSchema.contains("l_quantity"), readSchema)
  }

  test("grouped aggregation is partial+final (map-side combine)") {
    val p = plan("q_agg_group")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
  }

  test("vector top-k broadcasts the query side, scans candidates once") {
    val p = plan("q_vector_topk")
    assert(p.contains("BroadcastExchange"), p.take(800))
    assert("Scan parquet".r.findAllIn(p).size <= 2, // queries + candidates
      "candidate corpus scanned more than once:\n" + p.take(800))
    // the per-query top-k must prune map-side BEFORE the shuffle: the
    // partial/final TopKPerKey pair caps shuffle volume at k·partitions·q
    assert(p.contains("PartialTopKPerKey"),
      "no map-side top-k pruning:\n" + p.take(1200))
    assert(p.contains("TopKPerKeyExec") || "TopKPerKey".r.findAllIn(p).size >= 2,
      p.take(1200))
  }

  test("embed pairs: broadcast BNL with codegen dot, parallel scoring") {
    val p = plan("q_embed_pairs")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("graft_dot"), p.take(800))
    // AQE must not collapse the compute-bound scoring to one partition
    assert(p.contains("RoundRobinPartitioning"), p.take(800))
  }

  test("format round trips prune columns at the scan") {
    Seq("q_orc_roundtrip" -> "orc", "q_jsonl_roundtrip" -> "json")
      .foreach { case (key, fmt) =>
        val p = plan(key)
        assert(p.toLowerCase.contains(fmt), s"$key: no $fmt scan\n" + p.take(400))
        assert(p.contains("HashAggregate"), s"$key: no partial agg")
      }
  }

  test("custom kernel plans natively; 1-NN rewrites to two-phase top-k") {
    val p = plan("q_embed_knn")
    assert(p.contains("graft_dot"), p.take(800))
    // RowNumberTopKRewrite turns the rn=1 filter-over-window into the
    // partial/final TopKPerKey pair: shuffle carries ≤1 row per probe
    // per map partition, and the Window node is gone entirely
    assert(p.contains("PartialTopKPerKey"), p.take(800))
    assert(p.contains("TopKPerKey"), p.take(800))
    assert(!p.contains("Window"), p.take(800))
  }

  test("bloom decontaminate probes via the codegen expression, never a ScalaUDF") {
    // r16 verdict task 6: the map-side prefilter must fuse into
    // WholeStageCodegen — a Scala UDF would box every train-side row
    val p = plan("q_bloom_decontaminate")
    assert(!p.contains("ScalaUDF"),
      "bloom probe regressed to a ScalaUDF:\n" + p.take(800))
    assert(p.contains("graft_bloom_might_contain"),
      "bloom probe expression missing from the plan:\n" + p.take(800))
  }

  test("exact near-dup kernel: ONE BNL join with the τ cut inside its condition") {
    // r16 verdict task 7: the documented shape at ops/Text.scala —
    // the intersect kernel evaluates ONCE per pair inside the
    // BroadcastNestedLoopJoin condition; a post-join WHERE would be
    // pushed back into the condition by Catalyst and re-evaluate the
    // kernel 2-3x per pair (seen in executed plans before this form).
    val arr = ops.Text.shingleSets(spark, sf)
    val df = ops.Text.dedupNearBroadcast(arr)
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1,
      "expected exactly one BNL join:\n" + p.take(1200))
    // the join node's own condition carries the kernel + integer cut —
    // find the BNL line and check the cut's magic constants sit in it.
    // r21: the condition kernel is the early-exit THRESHOLD form
    // (sorted_intersect_at_least) behind the length prefilter; the
    // full count runs only in the post-join projection
    // (NearDupKernelSpec pins pair-set equality with the old form).
    val bnlLine = p.linesIterator
      .find(_.contains("BroadcastNestedLoopJoin")).get
    assert(bnlLine.contains("sorted_intersect_at_least") &&
      bnlLine.contains("15999995"),
      "τ cut is not inside the BNL join condition:\n" + bnlLine)
    // and no separate Filter re-evaluates the kernel after the join
    val postJoinFilter = p.linesIterator.filter(_.trim.startsWith("+- Filter"))
      .exists(_.contains("sorted_intersect_count"))
    assert(!postJoinFilter,
      "a post-join Filter re-evaluates the intersect kernel:\n" +
        p.take(1200))
  }

  test("decontaminate broadcasts the eval side over one corpus scan") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // the training corpus (the big side) must not be shuffle-exchanged
    // before the contamination join — only the final groupBy shuffles
    val joinSection = p.substring(p.indexOf("BroadcastHashJoin"))
    assert(!joinSection.substring(0, joinSection.indexOf("HashAggregate")
        .max(1)).contains("Exchange hashpartitioning"),
      "training side shuffled before the contamination join:\n" + p.take(1200))
  }

  test("domain mix reads only the two metadata columns") {
    val p = plan("q_domain_mix")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema in:\n$p"))
    assert(!readSchema.contains("text"), readSchema)
    assert(readSchema.contains("source") && readSchema.contains("n_chars"),
      readSchema)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "no map-side partial aggregation")
  }

  test("sharded packing has no single-partition global window") {
    val p = plan("q_pack_sequences_sharded")
    // the window must be hash-partitioned by shard, never SinglePartition
    assert(p.contains("Window"), p.take(500))
    val winSection = p.substring(p.indexOf("Window"))
    assert(winSection.contains("hashpartitioning(shard"),
      "window not partitioned by shard:\n" + p.take(1200))
  }

  test("kmeans assignment broadcasts centroids, never shuffles the corpus") {
    val p = plan("q_vector_ann_kmeans")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("unigram surprisal never broadcasts the vocabulary") {
    // at 100 TB the vocabulary (the grouped token-frequency aggregate)
    // runs to billions of rows: it must never be the BUILD side of a
    // broadcast hash join. Size-based broadcasts of the raw scan side at
    // sf0.001, and the 1-row grand total, are fine — so this asserts on
    // plan nodes, not on the mere presence of a broadcast.
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val root = SparkEntry.queries("q_unigram_surprisal")(spark, sf)
      .queryExecution.sparkPlan
    root.collect { case j: BroadcastHashJoinExec => j }.foreach { j =>
      val build = j.buildSide match {
        case BuildLeft => j.left
        case BuildRight => j.right
      }
      val groupedAgg = build.collect {
        case a: HashAggregateExec if a.groupingExpressions.nonEmpty => a
      }
      assert(groupedAgg.isEmpty,
        "vocabulary aggregate is a broadcast build side:\n" + j.toString)
    }
  }

  test("tfidf: top-k rewrite fires, vocabulary never a broadcast build") {
    val p = plan("q_tfidf")
    // the row_number()≤3 idiom must become the two-phase top-k operator
    assert(p.contains("PartialTopKPerKey"),
      "tf-idf top-3 not rewritten to partial/final top-k:\n" + p.take(1200))
    // the df (vocabulary) aggregate must never be USER-HINTED broadcast
    // (the q_unigram_surprisal rule — vocab grows without bound, so the
    // decision must stay with the size estimator / AQE, which correctly
    // broadcasts it at sf0.001 and correctly won't at 100 TB). Only the
    // 1-row ungrouped n_docs aggregate may carry a hint.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val opt = SparkEntry.queries("q_tfidf")(spark, sf)
      .queryExecution.optimizedPlan
    opt.collect { case j: Join => j }.foreach { j =>
      Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).foreach {
        case (Some(h), side)
            if h.strategy.exists(_.toString.toLowerCase.contains("broadcast")) =>
          val grouped = side.collectFirst {
            case a: Aggregate if a.groupingExpressions.nonEmpty => a
          }
          assert(grouped.isEmpty,
            "user-forced broadcast of a grouped (vocab-sized) aggregate:\n" + j)
        case _ =>
      }
    }
  }

  test("domain divergence: partial aggregation, token-keyed shuffles only") {
    val p = plan("q_domain_divergence")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "no map-side partial aggregation:\n" + p.take(1200))
    // the per-source reduction must be partial+final (map-side combine
    // collapses each partition to ≤|sources| rows before the source-keyed
    // exchange — a giant source never funnels raw rows through 1 reducer)
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val root = SparkEntry.queries("q_domain_divergence")(spark, sf)
      .queryExecution.sparkPlan
    val sourceExchanges = root.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.toString.contains("source") &&
            !e.outputPartitioning.toString.contains("t#") => e
    }
    sourceExchanges.foreach { e =>
      assert(e.collectFirst {
        case a: HashAggregateExec if a.groupingExpressions.nonEmpty => a
      }.nonEmpty,
        "source-keyed exchange without a map-side partial aggregate:\n" + e)
    }
    assert(!p.contains("CartesianProduct"))
  }

  test("doc perplexity: partial aggs, no cartesian, no forced broadcasts") {
    val p = plan("q_doc_perplexity")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "no map-side partial aggregation:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"))
    // no user hint anywhere: the bigram/context tables are vocab²-scale,
    // so every broadcast decision must stay with the size estimator
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val opt = SparkEntry.queries("q_doc_perplexity")(spark, sf)
      .queryExecution.optimizedPlan
    opt.collect { case j: Join => j }.foreach { j =>
      assert(j.hint.leftHint.isEmpty && j.hint.rightHint.isEmpty,
        "unexpected join hint in perplexity plan:\n" + j)
    }
  }

  test("zipf fit: top-100 cut is TakeOrdered, counts partial-aggregate") {
    val p = plan("q_zipf_fit")
    // the global sort+limit must plan as per-partition top-k heaps
    // (TakeOrderedAndProject), never a full global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(p.contains("partial_count"), "token counts not partial-agg'd")
  }

  test("quantiles_dist: histogram partial-aggs, no per-group total sort") {
    val p = plan("q_quantiles_dist")
    // pass 1 must partial-aggregate the (rf, bin) histogram map-side
    assert(p.contains("partial_count"), "histogram not partial-aggregated")
    // the rank-pick window must be keyed by (rf, bin) — thousands of tiny
    // partitions — never by rf alone (q_quantiles' 3-reducer funnel)
    val winSections = p.split("Window \\[").drop(1)
    assert(winSections.exists(w => w.contains("hashpartitioning(rf")
        && w.contains("bin")),
      "no (rf, bin)-partitioned window:\n" + p.take(1500))
    // the needed-bin filter reaches the scan side as a broadcast join
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("quantiles auto-dispatch picks the binned plan beyond the threshold") {
    // threshold 0 → any input is "large" → the binned scale path, whose
    // signature is the (rf, bin)-keyed rank window + broadcast bin filter
    val large = ops.Advanced.exactQuantiles(spark, sf, thresholdBytes = 0L)
      .queryExecution.executedPlan.toString
    assert(large.split("Window \\[").drop(1).exists(w =>
        w.contains("hashpartitioning(rf") && w.contains("bin")),
      "large input did not dispatch to the binned plan:\n" + large.take(1000))
    assert(large.contains("BroadcastHashJoin"))
    // huge threshold → "small" → the single window sort keyed by rf alone
    val small = ops.Advanced
      .exactQuantiles(spark, sf, thresholdBytes = Long.MaxValue)
      .queryExecution.executedPlan.toString
    assert(!small.contains("BroadcastHashJoin"),
      "small input paid the two-pass histogram plan:\n" + small.take(1000))
    // the deployed default must route the small fixtures (sf0.001 /
    // sf0.01, pruned estimates ~36 KB / ~323 KB) to the window sort and
    // sf0.1's ~3.4 MB pruned estimate to the binned scale path — the
    // measured crossover (binned 0.58 s vs naive 0.93 s at sf0.1) sits
    // between them. Asserted against the REAL estimates, not just the
    // constant, so a pruning-estimate change re-fails here rather than
    // silently re-pinning the naive branch at scale (the round-10 bug:
    // a 64 MiB threshold kept naive alive to ~200 MB of files).
    assert(!ops.Advanced.quantilesAutoPicksBinned(spark, sf),
      "sf0.001 should take the cheap window sort")
    assert(!ops.Advanced.quantilesAutoPicksBinned(spark, "/root/testdata/sf0.01"),
      "sf0.01 should take the cheap window sort")
    assert(ops.Advanced.quantilesAutoPicksBinned(spark, "/root/testdata/sf0.1"),
      "sf0.1 must dispatch to the binned scale path")
  }

  test("substring dedup shuffles gram hashes and never a cartesian") {
    val p = plan("q_substring_dedup")
    // the first-occurrence window partitions by the 128-bit gram hash
    // pair — 16-byte shuffle keys, gram strings never leave the map side
    assert(p.contains("xxhash64"), "grams not hashed:\n" + p.take(800))
    assert(p.contains("hashpartitioning(g#"),
      "first-occurrence window not keyed by gram hash:\n" + p.take(1500))
    assert(p.contains("g2#"),
      "second 64-bit salt missing — key is not 128-bit:\n" + p.take(1500))
    // coverage joins back by (doc_id, p): an anti join, never a product
    assert(p.contains("LeftAnti"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("dup ngrams shuffles 8-byte gram hashes, never gram strings") {
    val p = plan("q_dup_ngrams")
    assert(p.contains("xxhash64"), "grams not hashed:\n" + p.take(800))
    // the gram→doc-count aggregation's shuffle key is the hash column;
    // no partial aggregate output may carry a gram string column g#
    val partial = p.linesIterator.filter(_.contains("partial_count"))
    partial.foreach { l =>
      assert(!l.matches(".*[\\[, ]g#\\d+.*"),
        "gram string crosses the shuffle: " + l)
    }
  }

  test("segment dedup's first-occurrence window is hash-partitioned by segment") {
    val p = plan("q_segment_dedup")
    val winSection = p.substring(p.indexOf("Window"))
    assert(winSection.contains("hashpartitioning(seg"),
      "window not partitioned by segment:\n" + p.take(1200))
    assert(!p.contains("SinglePartition"), "single-partition funnel")
  }

  test("classifier score broadcasts the weight table, no cartesian product") {
    val p = plan("q_classifier_score")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("semantic dedup joins within clusters, never all-pairs") {
    val p = plan("q_semantic_dedup")
    // centroid assignment is a broadcast NLJ over the tiny seed set; the
    // pair verify must be an equi-join keyed by the assigned cluster id
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      "BroadcastHashJoin".r.findAllIn(p).size >= 1, p.take(800))
  }

  test("cnpj flagship pushes all three IN lists into the fact scan") {
    val p = plan("q_cnpj_flagship")
    // the reference filters sit on derived columns here (synthetic ids),
    // so the pushdown target is the orders scan's required columns — but
    // joins must still broadcast all three dims and never cross-join
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup_exact shuffles fingerprints, not document bodies") {
    val p = plan("q_dedup_exact")
    // the shuffled row is the partial aggregate's output: (fp, min, count)
    val partial = p.linesIterator.find(_.contains("partial_min"))
      .getOrElse(fail(s"no partial aggregate in:\n$p"))
    val out = partial.substring(partial.indexOf("output=["))
    assert(!out.contains("text#"),
      "document text crosses the shuffle: " + out)
  }

  test("bloom decontaminate probes map-side BEFORE the verify join") {
    val p = plan("q_bloom_decontaminate")
    // the codegen probe must sit in a Filter below the join, so only
    // bloom survivors are ever shuffled/joined
    val filterLine = p.linesIterator.zipWithIndex
      .find { case (l, _) => l.contains("Filter") &&
        l.contains("graft_bloom_might_contain") }
      .getOrElse(fail(s"no bloom-probe filter in:\n${p.take(1200)}"))._2
    val joinLine = p.linesIterator.zipWithIndex
      .find(_._1.contains("Join")).getOrElse(fail("no join"))._2
    assert(joinLine < filterLine,
      "probe filter must be deeper in the tree than the verify join")
    assert(!p.contains("CartesianProduct"))
  }

  test("weighted sample is one narrow codegen'd filter — no wide exchange") {
    val p = plan("q_weighted_sample")
    // only the presentation orderBy may exchange (rangepartitioning);
    // the sampling itself must not shuffle or aggregate
    assert(!p.contains("hashpartitioning"),
      "PPS sampling must not hash-shuffle:\n" + p.take(800))
    assert(!p.contains("HashAggregate"))
    // the PPS predicate must be evaluated AT the scan (fused data filter),
    // not in a later stage
    val scan = p.linesIterator.find(_.contains("FileScan"))
      .getOrElse(fail(s"no scan in:\n$p"))
    assert(scan.contains("DataFilters: [isnotnull(doc_id"), scan)
    assert(scan.replaceAll("#\\d+", "").contains("% 1000) < least(n_chars"),
      "sampling predicate not fused into the scan: " + scan)
  }

  test("cooccurrence builds pairs map-side, never self-joins on doc_id") {
    val p = plan("q_cooccurrence")
    // the doc_id-keyed pair self-join would be a SortMergeJoin; the
    // map-side nested-transform form leaves only broadcast joins
    assert(!p.contains("SortMergeJoin"),
      "pair generation regressed to a doc_id self-join:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count"), "pair counting must map-side combine")
  }

  test("unpivot compiles to Expand + partial aggregation, one scan") {
    val p = plan("q_unpivot")
    assert(p.contains("Expand"), "native unpivot should plan an Expand node")
    assert(p.contains("partial_count"), "no map-side combine after melt")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "melt must not re-scan the table per measure column")
  }

  test("rolling window: one hash shuffle on user_id, single streaming frame") {
    val p = plan("q_rolling_window")
    assert("Window \\[".r.findAllIn(p).size == 1,
      "both frame aggregates must land in ONE Window pass:\n" + p.take(800))
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 1,
      "window must shuffle once on user_id:\n" + p.take(800))
    // the RANGE frame is computed in the one Window pass — a self-join
    // re-count (CartesianProduct / extra SortMergeJoin) would be the
    // quadratic formulation
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("asof join: one per-user window pass, no join operator at all") {
    val p = plan("q_asof_join")
    // the union+window formulation replaces the per-row lookup join: the
    // plan must carry ONE Window pass shuffled on user_id and ZERO join
    // operators — a Join here means the quadratic per-purchase probe
    // formulation snuck back in
    assert("Window \\[".r.findAllIn(p).size == 1,
      "as-of must be a single window pass:\n" + p.take(800))
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 1,
      "window must shuffle on user_id:\n" + p.take(800))
    assert(!p.contains("Join"), "as-of must not plan a join:\n" + p.take(800))
  }

  test("sessionize: per-user windows only — parallelism = user count") {
    val p = plan("q_sessionize")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 1,
      "session windows must be keyed by user_id:\n" + p.take(800))
    // a global (non-partitioned) window would funnel all events through
    // one task; every Window here must carry a partition spec
    assert(!p.contains("Window [") || !"Window \\[[^\\]]*\\], \\[\\]".r
      .findFirstIn(p).isDefined,
      "found an unpartitioned window:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("winsorize: cutoffs flow back as a broadcast, no raw-data window") {
    val p = plan("q_winsorize")
    assert(p.contains("BroadcastHashJoin"),
      "3-row cutoff table must broadcast:\n" + p.take(800))
    assert(p.contains("partial_count"), "histogram must map-side combine")
    // the only Window may run over the aggregated histogram — if the raw
    // scan fed a Window directly we'd be back to the per-group funnel
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0 && p.indexOf("HashAggregate") < winIdx,
      "window must consume the histogram, not the raw scan:\n" + p.take(1200))
  }

  test("fuzzy join shuffles 8-byte hashed variants, never all-pairs") {
    val p = plan("q_fuzzy_join").replaceAll("#\\d+L?", "")
    assert(p.contains("xxhash64"),
      "variant keys must be hashed to 64-bit longs:\n" + p.take(800))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "deletion-neighborhood join regressed to all-pairs:\n" + p.take(1200))
  }

  test("funnel composes equi-joins and partial mins — never a per-user sort") {
    val p = plan("q_funnel")
    assert(!p.contains("Window"),
      "ordered-funnel must not window-sort user histories:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_min"), "stage mins must map-side combine")
  }

  test("heavy hitters: candidates broadcast back for the exact recount") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"),
      "candidate filter must be a broadcast join:\n" + p.take(800))
    assert(p.contains("MapPartitions"),
      "MG sketch pass should be a MapPartitions operator:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("mad outliers: both cutoff tables broadcast, histogram-only windows") {
    val p = plan("q_mad_outliers")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "median and MAD tables must both broadcast back:\n" + p.take(800))
    assert(p.indexOf("HashAggregate") < p.indexOf("Window"),
      "windows may only run over the aggregated histograms:\n" + p.take(1200))
  }

  test("token entropy folds into partial+final aggregation, one scan") {
    val p = plan("q_token_entropy")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "token counting must map-side combine:\n" + p.take(800))
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "entropy must not re-scan documents:\n" + p.take(800))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("top ngrams runs the two-phase TopKPerKey, not a full window sort") {
    val p = plan("q_top_ngrams")
    assert(p.contains("PartialTopKPerKey"),
      "map-side top-k pruning missing:\n" + p.take(1200))
    assert(p.contains("partial_count"), "bigram counting must combine")
  }

  test("global shuffle numbers within shards — no single-partition sort") {
    val p = plan("q_global_shuffle")
    assert("hashpartitioning\\(shard".r.findAllIn(p).size >= 1,
      "row numbering must partition by shard:\n" + p.take(800))
    assert(!p.contains("SinglePartition"),
      "global shuffle must never serialize through one task:\n" + p.take(800))
  }

  test("bigram LM: top-3 rewrites to TopKPerKey, hot contexts broadcast") {
    val p = plan("q_bigram_lm")
    assert(p.contains("PartialTopKPerKey"),
      "row_number()≤3 should auto-rewrite to the two-phase top-k:\n" +
        p.take(1200))
    assert(p.contains("BroadcastHashJoin"),
      "the Zipf-cut context table must broadcast:\n" + p.take(800))
  }

  test("max concurrency: sweep windows keyed by (type, bucket), no few-key funnel") {
    val p = plan("q_max_concurrency")
    assert("hashpartitioning\\(event_type#\\d+, bucket".r.findAllIn(p)
      .nonEmpty,
      "local prefix sums must partition by (event_type, bucket):\n" +
        p.take(1000))
    assert(!p.contains("SinglePartition"),
      "sweep must never serialize through one task:\n" + p.take(800))
  }

  test("scd2 windows are all per-user — parallelism = user count") {
    val p = plan("q_scd2")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).nonEmpty,
      p.take(800))
    assert(!p.contains("SinglePartition"), p.take(800))
  }

  test("pagerank: Pregel joins only — no cartesian product, no single-partition funnel") {
    val p = plan("q_pagerank")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the only SinglePartition allowed is the 1-row node-count broadcast;
    // rank updates themselves must stay hash-partitioned
    assert("hashpartitioning\\(dst".r.findAllIn(p).nonEmpty,
      "incoming-mass aggregation must partition by dst:\n" + p.take(1000))
  }

  test("pareto: bucket offsets broadcast back, no O(n²) dominance self-join") {
    val p = plan("q_pareto")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "frontier must not plan a raw self-join:\n" + p.take(800))
    assert(p.contains("BroadcastHashJoin"),
      "per-bucket offset table must broadcast:\n" + p.take(800))
  }

  test("attribution: binned equi-join + per-purchase window, no cross-product") {
    val p = plan("q_attribution")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "purchase×click pairing must be the binned equi-join:\n" + p.take(800))
    assert("hashpartitioning\\(p_id".r.findAllIn(p).nonEmpty,
      "touch-count window must key by purchase id:\n" + p.take(800))
  }

  test("scd2 merge: every window and join keyed by user — no global funnel") {
    val p = plan("q_scd2_merge")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).nonEmpty, p.take(800))
    assert(!p.contains("SinglePartition"), p.take(800))
  }

  test("chunk stride is a narrow per-doc transform — no shuffle before the sort") {
    val p = plan("q_chunk_stride")
    // exactly one exchange: the final ORDER BY's range partitioning
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, // rangepartitioning + AQE read, nothing else
      s"chunking must not shuffle ($exchanges exchanges):\n" + p.take(1000))
    assert(!p.contains("hashpartitioning"),
      "no hash shuffle belongs in a per-doc slicing op:\n" + p.take(800))
  }

  test("hybrid retrieval takes bounded top-k on both sides, no global sort") {
    val p = plan("q_hybrid_retrieval")
    // each side's top-50 cut must plan as a distributed TakeOrdered —
    // per-partition top-k then a bounded merge — never a full-corpus
    // range-partitioned sort feeding a window
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      "top-k cuts not TakeOrdered:\n" + p.take(1200))
    // the only Window nodes rank the 50 surviving rows: every window's
    // input must sit above a TakeOrdered, which shows as no Exchange
    // rangepartitioning anywhere (the final ORDER BY is inside the
    // last TakeOrdered too)
    assert(!p.contains("rangepartitioning"),
      "global sort leaked into hybrid retrieval:\n" + p.take(1200))
    // the semantic side broadcasts the single query vector
    assert(p.contains("BroadcastExchange"), p.take(800))
  }

  test("PQ ANN: codebook and ADC table broadcast, preselect prunes map-side") {
    val p = plan("q_vector_ann_pq")
    // codebook + ADC table + rerank query side all broadcast — the
    // candidate corpus is never the build side of anything
    assert("BroadcastExchange".r.findAllIn(p).size >= 3, p.take(1200))
    // the top-C preselect must prune per-partition BEFORE the shuffle
    assert(p.contains("PartialTopKPerKey"),
      "no map-side preselect pruning:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("triangle census: adjacency broadcast, no wedge-row enumeration") {
    // the dispatcher must choose broadcast at this scale (estimate far
    // below the 1 GiB ceiling) …
    assert(ops.Graph.triangleBroadcastsAdj(spark, sf),
      "dispatcher did not pick broadcast at spec scale")
    val p = plan("q_triangle_count")
    // … and both adjacency attachments are broadcast joins on the edges
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(1200))
    // the intersection kernel (SortedIntersectCount) does the counting —
    // an edge-list self-join would show as a SortMergeJoin of the edge
    // table against itself
    assert(p.contains("graft_sorted_intersect"),
      "intersection kernel missing from the plan:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("triangle census drops the broadcast hint above the size ceiling") {
    // force the ceiling below any real input: the dispatcher must fall
    // back to shuffled adjacency joins, because adj grows with the graph
    // and a forced broadcast of a data-proportional table is a driver
    // OOM at warehouse scale (the r11 `weak`)
    val broadcastRows =
      SparkEntry.queries("q_triangle_count")(spark, sf).collect()
    spark.conf.set("spark.graft.triangle.broadcastBytes", "0")
    // ALSO disable auto-broadcast: at spec scale the planner would still
    // broadcast the now-unhinted adjacency on its own size estimate —
    // which is the correct planner behavior (the dispatcher only stops
    // FORCING broadcast; Spark may still choose it for genuinely small
    // inputs). To see the at-scale fallback shape, take the planner's
    // size-based choice off the table too.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(!ops.Graph.triangleBroadcastsAdj(spark, sf),
        "ceiling=0 but dispatcher still picked broadcast")
      val p = plan("q_triangle_count")
      // the adjacency attachments are now shuffle joins (the remaining
      // broadcasts are the three 1-row stat frames' crossJoin idiom,
      // which are BroadcastNestedLoopJoin, not BroadcastHashJoin)
      assert(!p.contains("BroadcastHashJoin"),
        "adjacency still broadcast with ceiling=0:\n" + p.take(1500))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "no shuffled adjacency join in the fallback plan:\n" + p.take(1500))
      assert(p.contains("graft_sorted_intersect"))
      assert(!p.contains("CartesianProduct"))
      // dispatch changes the PLAN, never the answer
      val shuffledRows =
        SparkEntry.queries("q_triangle_count")(spark, sf).collect()
      assert(shuffledRows.toSeq == broadcastRows.toSeq,
        "shuffled-join branch returned different census numbers")
    } finally {
      spark.conf.unset("spark.graft.triangle.broadcastBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("SQL catalog read keeps pushdown + pruning + columnar scan " +
      "through the manifest prune") {
    // the manifest-prune path REBUILDS the parquet scan builder over the
    // kept file list inside pushFilters — this pins that nothing is lost
    // in the swap: data filters still reach the parquet scan, the read
    // schema is still pruned to the projection, and the scan is still
    // the vectorized DSv2 batch path
    val wh = "target/graft_io/spec/plan_audit_catalog"
    val c = sql.GraftSql.catalogFor(spark, wh)
    spark.sql(s"DROP TABLE IF EXISTS $c.default.audit_t")
    spark.sql(s"""CREATE TABLE $c.default.audit_t (k BIGINT, v STRING)
                 |TBLPROPERTIES ('graft.stats.columns' = 'k')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $c.default.audit_t VALUES (1,'a'), (2,'b')")
    spark.sql(
      s"INSERT INTO $c.default.audit_t VALUES (100,'c'), (200,'d')")
    org.apache.spark.sql.graft.SnapshotScanBuilder.lastPrune = None
    val df = spark.sql(s"SELECT k FROM $c.default.audit_t WHERE k >= 100")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"), p.take(800))
    assert(p.contains("GreaterThanOrEqual(k,100)"),
      "data filter lost in the pruned-builder swap:\n" + p.take(800))
    val rs = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema in:\n$p"))
    assert(rs.contains("k:bigint") && !rs.contains("v:string"), rs)
    assert(p.contains("ColumnarToRow") || p.contains("Columnar"),
      "vectorized batch path lost:\n" + p.take(800))
    assert(df.collect().map(_.getLong(0)).toSet == Set(100L, 200L))
    val prune = org.apache.spark.sql.graft.SnapshotScanBuilder.lastPrune
    assert(prune.exists { case (kept, total) => kept < total },
      s"manifest prune did not engage: $prune")
  }

  test("prefix-join prefixes are frequency-ordered and length-filtered") {
    val arr = ops.Text.shingleSets(spark, sf)
    val p = ops.Text.dedupNearPrefixJoin(arr)
      .queryExecution.executedPlan.toString
    // the df table exists: a count aggregate keyed by the shingle hash
    assert(p.contains("partial_count") || p.contains("count("),
      "no document-frequency aggregate in prefix join:\n" + p.take(1000))
    // prefix selection ranks by (df, h) inside a per-doc window
    assert(p.contains("row_number"), p.take(1000))
    // the τ length filter reaches the candidate join condition
    assert(p.contains("least") && p.contains("greatest"),
      "length filter missing from candidate join:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("LSH pair generation: hash joins only, shingle memo persisted") {
    // r15's official bench blew this key up 23× in-loop; the pin is that
    // the banded candidate self-join on (band, bkey) and both exact
    // verification joins plan as HASH joins (broadcast or shuffled or
    // sort-merge — anything with equi-keys), NEVER a nested loop or
    // cartesian, and that the thrice-read shingle-set input comes from
    // the persisted memo instead of three scan+kernel re-runs.
    ops.Text.clearCaches()
    try {
      val p = ops.Sketches.minhashVerifiedPairs(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        "LSH join degenerated to a nested loop:\n" + p.take(1500))
      assert("HashJoin|SortMergeJoin".r.findAllIn(p).size >= 3,
        "expected candidate + 2 verification equi-joins:\n" + p.take(1500))
      // every read of the shingle sets (banded self-join ×2 +
      // verification ×2) must come through the persisted memo: each
      // InMemoryTableScan prints its InMemoryRelation, whose cached
      // subtree carries the ONLY parquet scans in the plan — a bare
      // parquet scan outside a cached relation would mean a re-run
      val memoScans = "InMemoryTableScan".r.findAllIn(p).size
      val pqScans = "Scan parquet".r.findAllIn(p).size
      assert(memoScans >= 4,
        s"expected 4 memoized shingle reads, got $memoScans:\n" +
          p.take(1500))
      assert(pqScans <= memoScans,
        s"$pqScans parquet scans vs $memoScans memo reads — some read " +
          "bypasses the persisted memo:\n" + p.take(1500))
    } finally ops.Text.clearCaches()
  }

  test("commit-time NDV stats turn a size-only sort-merge into a broadcast") {
    // r19 verdict task 6: manifests now record per-file #rows + KMV
    // sketches for the declared stats columns, merged into numRows/NDV
    // through estimateStatistics. Under CBO, a grouped subquery on a
    // low-NDV column then estimates to its NDV (5 rows) and broadcasts;
    // the stats-free twin keeps the size-only estimate (the whole scan)
    // and mis-plans a sort-merge join. Same data, same query — the only
    // difference is the recorded statistics.
    val wh = "target/graft_io/spec/planaudit_catalog"
    val c = sql.GraftSql.catalogFor(spark, wh)
    def mk(name: String, props: String): String = {
      val t = s"$c.default.$name"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (g BIGINT, payload STRING)$props")
      spark.sql(s"INSERT INTO $t SELECT id % 5, " +
        "md5(CAST(id AS STRING)) FROM range(40000)")
      t
    }
    val withStats =
      mk("ndv_stats", " TBLPROPERTIES ('graft.stats.columns' = 'g')")
    val noStats = mk("ndv_plain", "")
    val fact = s"$c.default.ndv_fact"
    spark.sql(s"DROP TABLE IF EXISTS $fact")
    spark.sql(s"CREATE TABLE $fact (g BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $fact SELECT id % 5, id * 1.0 " +
      "FROM range(40000)")
    // the manifest-only stats are exact at this cardinality (< k)
    val (rows, ndv) = ops.Layout.scanStats(spark,
      s"$wh/default/ndv_stats", 2)
    assert(rows.contains(40000L), s"manifest row count: $rows")
    assert(ndv.get("g").contains((5L, 0L)), s"manifest NDV: $ndv")
    // the STATIC physical plan is the judge: AQE re-plans a sort-merge
    // into a broadcast at runtime once the 5-row aggregate has
    // materialized, but by then both sides already paid their shuffle —
    // commit-time NDV gets the broadcast (and zero planned exchanges on
    // the build side) before a single task runs
    def planFor(t: String): String = {
      val df = spark.sql(
        s"""SELECT f.g, COUNT(*) AS n FROM $fact f
           |JOIN (SELECT g, COUNT(*) AS cnt FROM $t GROUP BY g) s
           |ON f.g = s.g GROUP BY f.g""".stripMargin)
      assert(df.collect().length == 5)
      df.queryExecution.sparkPlan.toString
    }
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString)
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pStats = planFor(withStats)
      assert(pStats.contains("BroadcastHashJoin"),
        s"NDV stats should broadcast the 5-row aggregate:\n$pStats")
      val pPlain = planFor(noStats)
      assert(!pPlain.contains("BroadcastHashJoin"),
        "the stats-free twin must NOT broadcast (size-only estimate " +
          s"above threshold) — if it does, this test proves nothing:\n" +
          pPlain)
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
