package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scaling probe: measures whether the heaviest query shapes scale
  * ~linearly in data volume — the asymptotic claims (banding occupancy,
  * prefix-join candidate volume, two-level prefix aggregation) argued in
  * the operator docs, checked by experiment.
  *
  * Builds a 10× replica of sf0.1 under target/sf1_replica (one-time,
  * marker-guarded), then times the 10 historically most expensive keys at
  * both scales (best of two runs, Bench's protocol: memo caches cleared
  * before every timed run, noop sink so final sorts execute) and reports
  * per-key sec and the sf1/sf0.1 ratio. A key whose ratio lands well
  * above 10 is superlinear and needs its plan re-audited.
  *
  * The replica is NOT naive duplication — copies must be semantically
  * DISTINCT the way 10× real data would be, or pair-generating operators
  * see 10 exact copies of every row and candidate volume inflates ×100
  * (a data artifact, not a plan property):
  *   - documents: every token gets a per-copy suffix (regexp token
  *     rewrite), so cross-copy docs share no shingles/grams and each
  *     copy keeps its internal near-dup structure; doc_id shifts by the
  *     id range; n_chars recomputed. Vocabulary grows ×10 — an upper
  *     bound on real sublinear vocab growth, i.e. conservative for BPE.
  *   - lineitem: l_orderkey, l_suppkey, l_partkey shift per copy — the
  *     supply graph gains 10 disjoint components (a genuinely 10×
  *     graph for PageRank), order ids stay join-consistent with orders.
  *   - orders: o_orderkey shifts with lineitem's step.
  * Dim tables are not scaled (facts grow, dims don't).
  */
object ScaleProbe {

  private def shiftStep(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head.getLong(0) + 1

  private def buildReplica(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    // v3: the replica also scales customer and shifts orders' o_custkey
    // (the CNPJ flagship probe needs a 10× empresas population; marker is
    // versioned so an older replica left in target/ rebuilds)
    // v4: the UNSCALED dim tables (supplier/part/nation/region) are now
    // copied in — "dim tables are not scaled" never meant "not present",
    // and their absence made every probed key touching them die with
    // FileNotFoundException (the r14 probe shipped q_snapshot_widening
    // as a -1.0 sentinel for exactly this)
    val done = new java.io.File(s"$out/_REPLICA_DONE_v4")
    if (done.exists()) return
    val docs = Tables.documents(spark, src)
    val docStep = shiftStep(docs, "doc_id")
    val docsN = (0 until copies).map { i =>
      if (i == 0) docs
      else docs.select(
        (col("doc_id") + i * docStep).as("doc_id"),
        regexp_replace(col("text"), "([a-z0-9]+)", "$1q" + i).as("text"),
        col("lang"), col("source"),
        length(regexp_replace(col("text"), "([a-z0-9]+)", "$1q" + i))
          .cast("long").as("n_chars"))
    }.reduce(_ unionAll _)
    docsN.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val li = Tables.lineitem(spark, src)
    val okStep = shiftStep(li, "l_orderkey")
    val skStep = shiftStep(li, "l_suppkey")
    val pkStep = shiftStep(li, "l_partkey")
    (0 until copies).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + i * okStep)
        .withColumn("l_suppkey", col("l_suppkey") + i * skStep)
        .withColumn("l_partkey", col("l_partkey") + i * pkStep)
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // customer scales WITH orders' o_custkey shift: the CNPJ flagship
    // derives its empresas fact from customer, so each copy must own a
    // disjoint customer population (empresas is ~60M rows at real CNPJ
    // scale — fact-sized, not a dim) and its orders must reference it
    val cust = Tables.customer(spark, src)
    val ckStep = shiftStep(cust, "c_custkey")
    (0 until copies).map { i =>
      cust.withColumn("c_custkey", col("c_custkey") + i * ckStep)
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    val ord = Tables.orders(spark, src)
    (0 until copies).map { i =>
      ord.withColumn("o_orderkey", col("o_orderkey") + i * okStep)
        .withColumn("o_custkey", col("o_custkey") + i * ckStep)
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // events: event_id/user_id shift per copy — the time range stays, the
    // user population grows ×10, so per-user session/as-of/funnel state
    // scales horizontally the way a real firehose does. ts passes through
    // raw; the loader's schema dispatch (graft.Events.normalize) handles
    // whatever encoding the write round-trips to.
    val ev = Tables.eventsRaw(spark, src)
    val eStep = shiftStep(ev, "event_id")
    val uStep = shiftStep(ev, "user_id")
    (0 until copies).map { i =>
      ev.withColumn("event_id", col("event_id") + i * eStep)
        .withColumn("user_id", col("user_id") + i * uStep)
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val emb = Tables.embeddings(spark, src)
    val vecStep = shiftStep(emb, "vec_id")
    // vectors repeat across copies (only ids shift): retrieval ranks are
    // then decided by the deterministic doc_id tie-break, which is fine
    // for a throughput probe — scoring work is what scales
    (0 until copies).map { i =>
      emb.withColumn("vec_id", col("vec_id") + i * vecStep)
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // dims pass through unscaled (facts grow, dims don't) — present so
    // a probed key can open them
    Seq("supplier", "part", "nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }

    done.getParentFile.mkdirs()
    done.createNewFile()
  }

  /** The 10 heaviest keys of the round-8 clean bench — together they
    * cover the prefix-join near-dup path (above the all-pairs
    * crossover at the replica's 50k docs), banding, substring-dedup's
    * gram shuffle, BPE's vocab folds, Pregel iteration, windowed exact
    * quantiles, and the plain wide scan. */
  private val ProbeKeys = Seq(
    "q_corpus_clean", "q_bpe_encode", "q_bpe_learn", "q_substring_dedup",
    "q_simhash", "q_dedup_cluster", "q_dedup_cluster_lsh",
    "q_hybrid_retrieval", "q_pagerank", "q_projection",
    // quantiles: the naive twin (expected superlinear BY CONTRACT), the
    // binned twin (the scale path the dispatcher must reach), and the
    // auto entry point — auto ≈ dist at 10× is the dispatch fix's proof
    "q_quantiles", "q_quantiles_auto", "q_quantiles_dist", "q_profile",
    // remaining heavy corpus keys the round-10 verdict wanted measured,
    // not argued: two-level gram prefix agg, tf-idf join, window gap-fill
    "q_dup_ngrams", "q_tfidf", "q_gap_fill",
    // events-table shapes (probe-able since the v2 replica scales events):
    // per-user windowed state, union+window as-of, binned interval join,
    // tumbling windows — each should track the ×10 event volume linearly
    "q_sessionize", "q_asof_join", "q_range_join_binned", "q_time_window",
    // the completed dedup DAGs' recurring corpus-scale stages
    "q_bpe_tokenize", "q_image_dedup_cluster",
    // round-11 additions: PQ encode/ADC over 10× candidates (queries and
    // codebooks stay fixed — copy-0 ids), and the triangle census over
    // 10 disjoint co-purchase components (edges ×10, degrees constant)
    "q_vector_ann_pq", "q_triangle_count",
    // HDR sketch columns: bucket cardinality is value-range-bounded, so
    // the merge stage should be flat while the encode pass tracks ×10
    "q_hdr_quantiles",
    // sketch-table rollup post the Hadoop-FS rework: the partial-sketch
    // write and merge-read should both track volume, nothing driver-bound
    "q_sketch_rollup",
    // warehouse lifecycle: data writes must track volume while the
    // metadata operations (partition dirs, manifest CAS, rollup merge)
    // stay O(1) — q_schema_evolution is omitted (supplier isn't scaled
    // in the replica, so its ratio would measure nothing)
    "q_partitioned_backfill", "q_incremental_agg", "q_manifest_snapshot",
    // round-12 lifecycle verbs: REPLACE-commit compaction (read+rewrite
    // tracks volume, the CAS stays O(1)), copy-on-write delete and merge
    // (affected-file scan + selective rewrite track volume)
    "q_compact_snapshot", "q_snapshot_delete", "q_snapshot_merge",
    "q_manifest_skipping", "q_snapshot_changes",
    // round-12 additions per the r11 verdict task 6: the remaining
    // heavy keys never probed — Misra-Gries per group, SCD2 window
    // merge, per-key rolling windows — and the corpus pipeline's new
    // LSH composition (expected well under q_corpus_clean's ~8.6×)
    "q_heavy_hitters_grouped", "q_scd2_merge", "q_rolling_window",
    "q_corpus_clean_lsh",
    // streaming table read: per-trigger cost is manifest metadata (O(1)
    // in table size) + the delta scan, so the 3-commit end-to-end key
    // should track data volume, never file count; the pipe adds the
    // sink's per-batch staging write, and the batch veneer adds the
    // relation-resolution overhead — all should track volume
    "q_manifest_stream", "q_manifest_pipe", "q_manifest_batch_io",
    // categorical skipping: the one-language read should scale with the
    // LANGUAGE's bytes, not the table's
    "q_manifest_skipping_str",
    // round-13 lakehouse keys (r13 verdict task 7): multi-column
    // skipping's z-write + two-range read should track volume with the
    // pruning fraction constant; widening evolution adds only the
    // schema-merge O(1) on top of two appends
    "q_manifest_skipping_multi", "q_snapshot_widening",
    // round-14: the SQL catalog lifecycle — CREATE + two INSERT commits
    // + aggregate read through the DSv2 scan; all data-volume-bound,
    // catalog resolution O(1)
    "q_manifest_sql",
    // round-15: MERGE INTO through the group-based COW rewrite — the
    // rewrite cost is matched-file footprint + insert volume (runtime
    // group filtering prunes the rest), so the key should track data
    // volume like the insert path it extends
    "q_manifest_merge_sql",
    // round-15: CALL maintenance procedures — compact tracks rewritten
    // bytes, rollback/expire are O(manifest) metadata verbs, so the
    // key's ratio should sit near the insert volume like the other
    // lifecycle keys
    "q_manifest_maintenance_sql",
    // round-15: SQL-path manifest skipping — insert volume dominates;
    // the pruned read's cost tracks the SELECTED quartile's bytes, with
    // the pruning fraction constant at 10×
    "q_manifest_skipping_sql",
    // round-16: bloom skipping — insert volume dominates; the probed
    // read's cost is bloom-bounded at sf0.1 (files pruned) and
    // saturation-bounded at 10× (524288 bits vs 375k rows/file → blooms
    // saturate, nothing prunes, the scan is paid — the documented
    // sizing contract: bits must track rows/file)
    "q_manifest_skipping_bloom",
    // round-16: REPLACE WHERE — the full insert dominates; the backfill
    // rewrites only files holding upper-range keys (COW), so the key
    // should track insert volume like the other lifecycle verbs
    "q_manifest_replace_where",
    // round-16: CHECK constraints — the gated insert pays one extra
    // limit(1) pass per constraint over the staged bytes; both the
    // insert and the gate track volume
    "q_manifest_constraint_sql",
    // round-16: DDL evolution — ADD COLUMN is an O(manifest) schema-only
    // commit; the two inserts dominate and track volume (supplier isn't
    // scaled in the replica, so absolute ratio mostly measures fixed
    // commit overhead — the pin is "no superlinear surprise")
    "q_manifest_evolution_sql",
    // round-17: merge-on-read row-level verbs — the r16 verdict's #1
    // ask. The MOR delete's cost is the matched-position scan + sidecar
    // write (∝ matched rows, never table size) and the dv-applied
    // re-read adds one anti-join of the grid; the MOR merge adds the
    // update/insert append. Both should track data volume with NO
    // file-rewrite component (the COW twins above carry that)
    "q_snapshot_delete_mor", "q_snapshot_merge_mor", "q_merge_sql_mor",
    // round-17: PARTITIONED BY via SQL — the bulk insert (clustered by
    // the partition column) dominates and tracks volume; the REPLACE
    // WHERE day rebuild tracks the day's bytes
    "q_partitioned_sql",
    // round-17: sharded-HNSW graph ANN — build cost ∝ shard volume
    // (n·log n inserts each over an in-memory graph), search fan-out =
    // shards × ef with the query set fixed; should track corpus volume
    "q_vector_ann_hnsw",
    // round-18: persisted shard graphs — build + serialize tracks
    // corpus volume; the search half restores the graph table (∝ graph
    // size) instead of reconstructing, so the key should probe BELOW
    // the in-memory twin at scale
    "q_vector_ann_hnsw_persist",
    // round-18: RENAME COLUMN lifecycle — two inserts dominate
    // (supplier unscaled in the replica, so the pin is fixed-overhead
    // sanity like the evolution key); the rename itself is O(manifest)
    "q_rename_sql",
    // round-18: storage-partitioned joins — the writes (fanout-staged
    // single-value files) dominate and track volume; the join halves
    // have ZERO shuffle at both scales, so the read cost is the two
    // scans + per-value zip (∝ volume). The bucket twins are the
    // fact⋈fact case — orders AND lineitem both scale ×10; the r19
    // string-key twin adds the xxhash64 placement on the same shape
    "q_spj_join", "q_bucket_join", "q_bucket_join_str",
    // round-18: WAP and clone lifecycles — the staged insert dominates
    // and tracks volume; fork, publish (fast-forward CAS) and clone
    // are O(manifest) metadata verbs, so both keys should sit at the
    // two-insert lifecycle envelope
    "q_wap_publish", "q_clone_sql",
    // round-19: equality-upsert lifecycle — the two upsert commits are
    // append+annotate (zero data-file reads), so the key should track
    // the two-insert volume like the WAP twin, with the masked read's
    // key anti-join ∝ batch size on top; the r20 composite-key twin
    // runs THREE upserts on a two-column key, same envelope
    "q_upsert_eq", "q_upsert_eq_multi",
    // round-19 (probed r20 per the r19 verdict): relayout is the one
    // key whose cost is BY DESIGN O(table) — a full REPLACE re-fanout
    // under the new layout props — so its ratio should sit near the
    // rewrite keys' (q_compact_snapshot family), never above
    "q_relayout_sql",
    // round-20: metadata-only evolution — the props swap itself is
    // O(manifest); the key's cost is its two bucketed inserts plus the
    // closing compact, so the ratio should track the insert+rewrite
    // volume like the relayout sibling
    "q_evolve_layout",
    // the CNPJ vertical (reference envelope ">20 GB", readme.md:108):
    // synthetic flagship over the replica's 10× orders/customer —
    // r15 splits load (z-cluster + commit, data-volume-bound) from
    // query (pruned read + star join) so each phase gets its own ratio
    "q_cnpj_load", "q_cnpj_flagship")

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = "target/sf1_replica"
    val spark = GraftSession.builder(s"local[$cpus]", Some(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    buildReplica(spark, src, out, copies = 10)

    // Dispatch pin (round-10 finding #1): the 10× replica MUST route
    // q_quantiles_auto to the binned scale path — fail the probe loudly
    // if a threshold/estimate change ever re-pins the naive sort at scale.
    val autoBinnedAtSf1 = ops.Advanced.quantilesAutoPicksBinned(spark, out)
    require(autoBinnedAtSf1,
      s"q_quantiles_auto dispatched NAIVE at the 10x replica (estimate=" +
        s"${ops.Advanced.quantileInputEstimate(spark, out)} <= threshold=" +
        s"${ops.Advanced.QuantileDispatchBytes}) — recalibrate")

    // CNPJ flagship plan audit at both scales: the three dimension joins
    // must stay broadcast and the plan must never degrade to a cartesian;
    // the empresas (fact⋈fact) side is planner-decided — broadcast while
    // it fits, sort-merge beyond the threshold — so record which it chose
    // rather than pinning it.
    def flagshipPlanShape(dir: String): (Boolean, String) = {
      val p = SparkEntry.queries("q_cnpj_flagship")(spark, dir)
        .queryExecution.executedPlan.toString
      val ok = "BroadcastHashJoin".r.findAllIn(p).size >= 3 &&
        !p.contains("CartesianProduct")
      val empJoin = if (p.contains("SortMergeJoin")) "sort_merge"
        else if (p.contains("ShuffledHashJoin")) "shuffled_hash"
        else "broadcast"
      (ok, empJoin)
    }
    val (fs01ok, fs01emp) = flagshipPlanShape(src)
    val (fs1ok, fs1emp) = flagshipPlanShape(out)
    require(fs01ok && fs1ok,
      s"flagship plan degraded (sf0.1 ok=$fs01ok, sf1 ok=$fs1ok)")

    def timeOnce(key: String, dir: String): Double =
      BenchProtocol.timeOnce(spark, dir, SparkEntry.queries(key))
    // Bench's variance bound, same constants by construction: a >1.25×
    // spread on a non-trivial key gets a third sample and min-of-3, so
    // one GC pause / scheduler hiccup at 10× volume can't masquerade as
    // a superlinear ratio (measured: q_dedup_cluster@sf1 swung
    // 11.8 s ↔ 42 s across runs on a noisy box with identical plans and
    // label-propagation round counts)
    def best2(key: String, dir: String): Double =
      BenchProtocol.boundedMin(timeOnce(key, dir), timeOnce(key, dir),
        timeOnce(key, dir))
    def r3(v: Double): Double = math.rint(v * 1000) / 1000

    // same contention self-labeling as Bench: a ratio measured while
    // another tenant holds the cores is not a plan property
    def load1m(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadBefore = load1m()
    val rows = ProbeKeys.map { k =>
      val t01 = best2(k, src)
      val t1 = best2(k, out)
      val ratio = if (t01 > 0 && t1 > 0) t1 / t01 else -1
      println(s"""PROBE {"$k":{"sf01":${r3(t01)},"sf1":${r3(t1)},"ratio":${r3(ratio)}}}""")
      (k, t01, t1, ratio)
    }
    val qs = rows.map { case (k, a, b, r) =>
      s""""$k":{"sf01_sec":${r3(a)},"sf1_sec":${r3(b)},"ratio":${r3(r)}}"""
    }.mkString("{", ",", "}")
    // a -1 sentinel is a FAILED measurement, not a ratio — it must ship
    // as an explicit failed_keys entry (and shout), never as a silent
    // number a reader has to notice (the r14 artifact shipped one)
    val failed = rows.collect { case (k, a, b, _) if a < 0 || b < 0 => k }
    if (failed.nonEmpty)
      System.err.println(
        s"PROBE FAILED KEYS (measurement errored, not a plan property): " +
          failed.mkString(", "))
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"sf1_scaling","copies":10,"quantiles_auto_binned_at_sf1":$autoBinnedAtSf1,"flagship_emp_join":{"sf01":"$fs01emp","sf1":"$fs1emp"},"loadavg":{"before":${r3(loadBefore)},"after":${r3(load1m())}},"failed_keys":$failedJson,"queries":$qs,"src":"$src"}"""
    println(line)
    val w = new java.io.PrintWriter("/root/repo/BENCH_sf1.json", "UTF-8")
    try w.println(line) finally w.close()
    spark.stop()
  }
}
