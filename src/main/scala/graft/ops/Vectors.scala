package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.VectorExprs.{dotProduct, squaredDistance}

/** Vector-similarity surface (SURVEY.md §2.4 X3) over `embeddings`
  * (64-dim float vectors).
  *
  * All arithmetic is double-precision sequential accumulation
  * (`aggregate(zip_with(...))` folds left-to-right), which is bit-identical
  * to DuckDB's `list_cosine_similarity` over `DOUBLE[]` — verified — so
  * cosines hash-match the oracle with no rounding.
  *
  * Scale posture (100 TB):
  *   - [[qVectorTopk]] is the brute-force baseline: broadcast the (small)
  *     query set, ONE scan of the candidate corpus, per-query top-k via
  *     the [[graft.plans.TopKPerKey]] partial/final operator — each scan
  *     partition is pruned to ≤ k rows per query BEFORE the shuffle, so
  *     shuffle volume is k × partitions × queries instead of the
  *     n_cand × n_query scored rows the plain window form ships to one
  *     reducer per query.
  *   - [[qVectorAnnIvf]] is the scale path: IVF — assign every vector to
  *     its nearest centroid once (linear), then probe only the nprobe
  *     closest clusters per query, cutting the scanned fraction to
  *     ~nprobe/k_centroids. Centroids here are fixed seed vectors (no
  *     k-means iterations) to stay deterministic for the oracle.
  *   - [[qEmbedKnn]] is the embedding-near-dup primitive: exact 1-NN per
  *     vector over a bounded probe set; at corpus scale the same code runs
  *     per-LSH-bucket instead of all-pairs.
  */
object Vectors {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Sequential-fold dot product — a native codegen'd Expression
    * ([[graft.functions.DotProduct]]); bit-identical to the interpreted
    * `aggregate(zip_with(...))` fold it replaced, ~20x faster. */
  private def dot(a: Column, b: Column): Column = dotProduct(a, b)

  private def cosine(a: Column, aNorm: Column, b: Column, bNorm: Column) =
    dot(a, b) / (aNorm * bNorm)

  private def withNorm(df: DataFrame, emb: String): DataFrame =
    df.withColumn("nrm", sqrt(dot(col(emb), col(emb))))

  /** X3 baseline: brute-force cosine top-k (k=10) for query vectors
    * vec_id < 5 against all candidates vec_id >= 5. Scoring is one
    * broadcast pass over the candidate scan; the per-query top-k is the
    * custom partial/final [[graft.plans.TopKPerKey]] operator, so only
    * ≤ k survivors per (partition, query) reach the shuffle. The final
    * row_number window then ranks k × queries rows — trivial at any
    * scale. */
  def qVectorTopk(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"),
      asDouble(col("embedding")).as("emb"))
    val q = withNorm(e.where(col("vec_id") < 5), "emb")
      .select(col("vec_id").as("query_id"), col("emb").as("qe"),
        col("nrm").as("qn"))
    val c = withNorm(e.where(col("vec_id") >= 5), "emb")
      .select(col("vec_id").as("cand_id"), col("emb").as("ce"),
        col("nrm").as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", cosine(col("qe"), col("qn"), col("ce"), col("cn")))
      .select("query_id", "cand_id", "cosine")
    val pruned = graft.plans.TopKPerKey.topKPerKey(scored,
      Seq(col("query_id")), Seq(col("cosine").desc, col("cand_id")), 10)
    pruned
      .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("cand_id"))))
      .select("query_id", "cand_id", "rnk", "cosine")
      .orderBy("query_id", "rnk")
  }

  /** X3 scale path: IVF ANN. Centroids = vectors vec_id < 8 (deterministic
    * seeds). Every candidate is assigned to its nearest centroid by L2²
    * (argmin, ties → smaller centroid id); each query probes its nprobe=2
    * nearest clusters and ranks only those candidates by cosine (top-5). */
  def qVectorAnnIvf(s: SparkSession, d: String): DataFrame = {
    // fanOutSmallScan: the per-centroid L2² assignment is 64-dim HOF
    // arithmetic per row — serial on a single-row-group scan (identity
    // at scale; min_by's total tie-break keeps it partitioning-proof)
    val e = fanOutSmallScan(embeddings(s, d)).select(col("vec_id"),
      asDouble(col("embedding")).as("emb"))
    val cent = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    def l2sq(a: Column, b: Column): Column = squaredDistance(a, b)

    // cluster assignment: one broadcast-join pass over the corpus.
    // argmin via min_by over the (dist, cid) struct — partial-aggregated
    // map-side, so the shuffle carries ONE row per vector instead of the
    // k_centroids-times-larger sorted window input (ties broken by cid,
    // same order the row_number form used)
    val asg = e.crossJoin(broadcast(cent))
      .withColumn("dist", l2sq(col("emb"), col("cemb")))
      .groupBy("vec_id")
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("acid"))

    val q = withNorm(e.where(col("vec_id") < 5), "emb")
      .select(col("vec_id").as("query_id"), col("emb").as("qe"),
        col("nrm").as("qn"))
    // nprobe=2 closest centroids per query
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("dist").asc, col("cid").asc)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("dist", l2sq(col("qe"), col("cemb")))
      .withColumn("rn", row_number().over(probeW))
      .where(col("rn") <= 2)
      .select(col("query_id"), col("cid").as("pcid"))

    val cands = withNorm(e.where(col("vec_id") >= 5), "emb")
      .select(col("vec_id").as("cand_id"), col("emb").as("ce"),
        col("nrm").as("cn"))
      .join(asg, col("cand_id") === asg("vec_id"))
      .select(col("cand_id"), col("ce"), col("cn"), col("acid"))

    val topW = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    cands.join(broadcast(probes), col("acid") === probes("pcid"))
      .join(broadcast(q), "query_id")
      .withColumn("cosine", cosine(col("qe"), col("qn"), col("ce"), col("cn")))
      .withColumn("rnk", row_number().over(topW))
      .where(col("rnk") <= 5)
      .select("query_id", "cand_id", "rnk", "cosine")
      .orderBy("query_id", "rnk")
  }

  /** X3 scale path with TRAINED centroids: one deterministic Lloyd
    * iteration refines the 8 seed centroids before the IVF probe.
    *
    * Distributed k-means is normally unreproducible: the centroid
    * update is a floating-point mean whose accumulation order varies
    * run to run. Here the embedding is quantized to exact integers
    * (round(x·2^20) — the scaled float is a multiple of 2^-4, so both
    * engines round identically) and the update keeps the EXACT rational
    * centroid (per-dim BIGINT sum, member count): sums are associative,
    * so the result is identical for any partitioning. The re-assignment
    * compares dist(x, s/c) by the equivalent integer form
    * Σ(c·x_d − s_d)² / c² with the numerator in DECIMAL(38,0) — exact —
    * so cluster membership is a pure function of the data, not the
    * execution. The final top-5 ranks probed candidates by exact cosine
    * over the ORIGINAL doubles, so output values carry no quantization. */
  def qVectorAnnKmeans(s: SparkSession, d: String): DataFrame = {
    val S = 1048576L // 2^20
    val dec0 = lit(0).cast("decimal(38,0)")
    // fanOutSmallScan: the quantize + per-centroid distance stages are
    // 64-dim HOF arithmetic per row and ran serially on the single-row-
    // group embeddings scan; identity at scale. Safe under any
    // partitioning — every reduction here is exact-integer/decimal and
    // min_by carries a total tie-break (the operator's own determinism
    // contract).
    val e = fanOutSmallScan(embeddings(s, d)).select(col("vec_id"),
      transform(asDouble(col("embedding")),
        x => round(x * S, 0).cast("long")).as("xq"),
      asDouble(col("embedding")).as("emb"))
    val seeds = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("xq").as("cq"))
    // assignment 1: exact BIGINT L2² in the scaled domain (≤ 64·(1.2e6)²
    // ≈ 9e13, comfortably exact)
    val d1 = aggregate(
      zip_with(col("xq"), col("cq"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)
    // argmin as a map-side-combined min_by, not a sorted window: the
    // shuffle carries one (vec, winner) row, not 8 sorted candidates.
    // first(xq) is deterministic — xq is functionally dependent on the
    // group key.
    val asg1 = e.crossJoin(broadcast(seeds))
      .withColumn("dist", d1)
      .groupBy("vec_id")
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("acid"),
        first(col("xq")).as("xq"))
      .select(col("vec_id"), col("xq"), col("acid"))
    // Lloyd update: exact per-dimension integer sums + member counts.
    // The shuffle carries (cluster, dim, partial BIGINT sum) — at 100 TB
    // this is the classic map-side-combined k-means update, and exactness
    // means the result is independent of partition count.
    val sums = asg1
      .select(col("acid"), posexplode(col("xq")).as(Seq("pos", "v")))
      .groupBy("acid", "pos").agg(sum(col("v")).as("sv"))
      .groupBy("acid").agg(
        transform(array_sort(collect_list(struct(col("pos"), col("sv")))),
          x => x.getField("sv")).as("sq"))
    val cent = sums.join(
      asg1.groupBy("acid").agg(count(lit(1)).as("c")), "acid")
    // assignment 2 against rational centroids s/c without ever forming a
    // float mean: argmin of Σ(c·x−s)²/c², numerator exact in decimal
    def d2(x: Column, sq: Column, c: Column): Column =
      aggregate(
        zip_with(x, sq, (xd, sd) =>
          ((c * xd - sd).cast("decimal(19,0)") *
            (c * xd - sd).cast("decimal(19,0)"))),
        dec0, (acc, v) => acc + v).cast("double") /
        (c * c).cast("double")
    val asg2 = e.crossJoin(broadcast(cent))
      .withColumn("dist", d2(col("xq"), col("sq"), col("c")))
      .groupBy("vec_id")
      .agg(min_by(col("acid"), struct(col("dist"), col("acid")))
        .as("acid2"))
    // probe: each query's nprobe=2 nearest TRAINED centroids
    val q = withNorm(e.where(col("vec_id") < 5), "emb")
      .select(col("vec_id").as("query_id"), col("xq").as("qx"),
        col("emb").as("qe"), col("nrm").as("qn"))
    val pW = Window.partitionBy("query_id")
      .orderBy(col("dist").asc, col("acid").asc)
    val probes = q.select(col("query_id"), col("qx"))
      .crossJoin(broadcast(cent))
      .withColumn("dist", d2(col("qx"), col("sq"), col("c")))
      .withColumn("rn", row_number().over(pW))
      .where(col("rn") <= 2)
      .select(col("query_id"), col("acid").as("pcid"))
    val cands = withNorm(e.where(col("vec_id") >= 5), "emb")
      .select(col("vec_id").as("cand_id"), col("emb").as("ce"),
        col("nrm").as("cn"))
      .join(asg2, col("cand_id") === asg2("vec_id"))
      .select(col("cand_id"), col("ce"), col("cn"), col("acid2"))
    val topW = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    cands.join(broadcast(probes), col("acid2") === probes("pcid"))
      .join(broadcast(q.select(col("query_id"), col("qe"), col("qn"))),
        "query_id")
      .withColumn("cosine", cosine(col("qe"), col("qn"), col("ce"), col("cn")))
      .withColumn("rnk", row_number().over(topW))
      .where(col("rnk") <= 5)
      .select("query_id", "cand_id", "rnk", "cosine")
      .orderBy("query_id", "rnk")
  }

  /** X3 memory-compression tier: product-quantization (PQ) ANN with
    * asymmetric-distance preselection and exact rerank.
    *
    * The 64-dim vector splits into m=8 subspaces of 8 dims; each
    * subspace has a 16-entry codebook (the first 16 corpus vectors'
    * subvectors — deterministic seeds, same convention as the IVF
    * centroids). Every candidate is ENCODED as 8 nibble codes (argmin
    * subspace L2², ties → lower code id): 4 bytes of codes standing in
    * for 256 bytes of floats — the 64× footprint cut is the whole point
    * at 100 TB, where the code table fits in executor memory and the
    * float vectors stay in cold storage. Queries never decode: ADC
    * (asymmetric distance computation) precomputes the query→codebook
    * distance table (m × 16 entries per query, broadcast) and scores a
    * candidate as the SUM of 8 table lookups — one equi-join on (j,
    * code) against the code table, no float vector is touched until the
    * top-C=64 preselected candidates are reranked by exact cosine over
    * the original doubles (so reported cosines carry no quantization).
    *
    * Determinism: embeddings are quantized to exact integers
    * (round(x·2^20), same multiple-of-2^-4 argument as
    * [[qVectorAnnKmeans]]); encode/ADC arithmetic is all BIGINT —
    * associative, partition-order-free — so codes, approximate
    * distances, and the preselection set are pure functions of the
    * data, and the DuckDB oracle replays them exactly. The final
    * cosines are the same sequential-fold doubles as every other key.
    *
    * Scale posture: encoding is one broadcast-join pass (m·k small
    * kernel evals per vector, map-side argmin); ADC scoring shuffles
    * one (query, cand, partial-sum) row per candidate-subspace hit
    * with map-side combine; preselection is the partial/final
    * [[graft.plans.TopKPerKey]] — ≤ C survivors per (partition, query)
    * reach the shuffle; the rerank touches C × queries float vectors
    * total. PQ recall is a property of the codebook (VectorSpec pins
    * the measured overlap vs the exact top-k on testdata); the
    * preselect→exact-rerank split is what IVF-PQ indexes (FAISS-style)
    * do, minus the training loop the fixed seeds replace. */
  def qVectorAnnPq(s: SparkSession, d: String): DataFrame = {
    val S = 1048576L // 2^20
    val m = 8 // subspaces
    val sub = 8 // dims per subspace
    val e = embeddings(s, d).select(col("vec_id"),
      transform(asDouble(col("embedding")),
        x => round(x * S, 0).cast("long")).as("xq"),
      asDouble(col("embedding")).as("emb"))
    // exact BIGINT subspace L2²: ≤ 8·(2·2^20)² ≈ 3.5e13 per subspace,
    // comfortably inside long range
    def l2i(a: Column, b: Column): Column = aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    def subspaces(df: DataFrame, idCol: String, as: String): DataFrame = df
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .select(col(idCol), col("j"),
        slice(col("xq"), col("j") * sub + 1, lit(sub)).as(as))
    // per-subspace codebook: 16 codes × 8 subspaces = 128 rows
    val codebook = subspaces(
      e.where(col("vec_id") < 16).select(col("vec_id").as("cid"), col("xq")),
      "cid", "csub")
    // encode: nibble code per (candidate, subspace) — broadcast-join
    // argmin, map-side combined, ties → lower code id
    val codes = subspaces(
      e.where(col("vec_id") >= 5)
        .select(col("vec_id").as("cand_id"), col("xq")),
      "cand_id", "vsub")
      .join(broadcast(codebook), "j")
      .withColumn("dist", l2i(col("vsub"), col("csub")))
      .groupBy("cand_id", "j")
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("code"))
    val q = withNorm(e.where(col("vec_id") < 5), "emb")
      .select(col("vec_id").as("query_id"), col("xq"),
        col("emb").as("qe"), col("nrm").as("qn"))
    // ADC table: query → (subspace, code) distance, 5 × 8 × 16 rows
    val dtab = subspaces(
      q.select(col("query_id"), col("xq")), "query_id", "qsub")
      .join(broadcast(codebook), "j")
      .select(col("query_id"), col("j"), col("cid"),
        l2i(col("qsub"), col("csub")).as("d"))
    // approximate distance = Σ_j table[j, code_j] — exact long sum
    val approx = codes
      .join(broadcast(dtab),
        codes("j") === dtab("j") && codes("code") === dtab("cid"))
      .groupBy("query_id", "cand_id")
      .agg(sum(col("d")).as("adist"))
    // preselect C=64 per query on the approximate metric, then rerank
    // the survivors by exact cosine over the original doubles
    val pre = graft.plans.TopKPerKey.topKPerKey(approx,
      Seq(col("query_id")), Seq(col("adist").asc, col("cand_id")), 64)
    val cemb = withNorm(
      e.where(col("vec_id") >= 5)
        .select(col("vec_id").as("cand_id"), col("emb")), "emb")
      .select(col("cand_id"), col("emb").as("ce"), col("nrm").as("cn"))
    val topW = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    pre.select("query_id", "cand_id")
      .join(cemb, "cand_id")
      .join(broadcast(q.select(col("query_id"), col("qe"), col("qn"))),
        "query_id")
      .withColumn("cosine", cosine(col("qe"), col("qn"), col("ce"), col("cn")))
      .withColumn("rnk", row_number().over(topW))
      .where(col("rnk") <= 5)
      .select("query_id", "cand_id", "rnk", "cosine")
      .orderBy("query_id", "rnk")
  }

  /** X3 / near-dup primitive: exact cosine 1-NN for each probe vector
    * (vec_id < 100) against the full corpus. */
  def qEmbedKnn(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"),
      asDouble(col("embedding")).as("emb"))
    val probes = withNorm(e.where(col("vec_id") < 100), "emb")
      .select(col("vec_id").as("probe_id"), col("emb").as("pe"),
        col("nrm").as("pn"))
    val corpus = withNorm(e, "emb")
      .select(col("vec_id").as("nn_id"), col("emb").as("ne"),
        col("nrm").as("nn"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("nn_id"))
    corpus.crossJoin(broadcast(probes))
      .where(col("nn_id") =!= col("probe_id"))
      .withColumn("cosine", cosine(col("pe"), col("pn"), col("ne"), col("nn")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("probe_id", "nn_id", "cosine")
      .orderBy("probe_id")
  }

  /** X2 embedding flavor: embedding-cosine near-duplicate PAIRS — every
    * (va < vb) with cosine ≥ 0.45, the vector-space analogue of the
    * shingle-Jaccard near-dup contract. Exact all-pairs with the codegen
    * dot kernel and a broadcast of the (norm-annotated) right side; the
    * explicit repartition defeats AQE's tiny-bytes coalescing so the
    * O(n²) scoring stays CPU-parallel (same reasoning as
    * Text.dedupNearBroadcast). At corpus scale the identical verify runs
    * per sign-LSH bucket (random-hyperplane SimHash over the embedding)
    * instead of all-pairs — the [[qEmbedKnn]] note applies. */
  def qEmbedPairs(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d).select(col("vec_id"),
      asDouble(col("embedding")).as("emb")), "emb")
    val par = s.sparkContext.defaultParallelism
    val a = e.select(col("vec_id").as("va"), col("emb").as("ea"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vb"), col("emb").as("eb"),
      col("nrm").as("nb"))
    // threshold inside the join condition: the BNL join only materializes
    // qualifying pairs (~1e-4 of n²/2) instead of building every joined
    // row and filtering after — row materialization, not the dot kernel,
    // dominates all-pairs cost (same reasoning as Text.dedupNearBroadcast)
    a.repartition(par).join(broadcast(b),
        col("va") < col("vb") &&
          cosine(col("ea"), col("na"), col("eb"), col("nb")) >= 0.45)
      .withColumn("cosine",
        cosine(col("ea"), col("na"), col("eb"), col("nb")))
      .select("va", "vb", "cosine")
      .orderBy("va", "vb")
  }

  /** X2 scale path for embedding near-dup: banded sign-LSH
    * (random-hyperplane SimHash). Bit j is the sign of the dot product
    * with hyperplane j (the first 16 corpus vectors serve as
    * deterministic hyperplanes); the 16 bits form 4 BANDS of 4 bits, and
    * a pair is a candidate if it collides in ANY band — the classic
    * bands/rows recall dial (for cos ≥ 0.9: P[bit agree] ≈ 0.86,
    * P[≥1 of 4 band hits] ≈ 95%). Only same-band-bucket pairs are
    * cosine-verified, so candidate volume is Σ_bucket n_b²/2 per band
    * instead of n²/2. This materializes the per-bucket verify promised
    * in [[qEmbedPairs]]'s scale note as its own contract (an LSH
    * prefilter is a recall<1 operator — its output is "pairs the index
    * retrieves", matched exactly by the oracle replaying the same bands).
    *
    * Signatures are reproducible across engines because the dot product
    * is the same sequential fold on both sides (bit-identical per the
    * determinism rules); a sign could only differ if a dot were within
    * one ULP of zero — measure-zero for real embeddings. */
  def qEmbedLshPairs(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(embeddings(s, d).select(col("vec_id"),
      asDouble(col("embedding")).as("emb")), "emb")
    val hyper = e.where(col("vec_id") < 16)
      .select(col("vec_id").as("hid"), col("emb").as("hemb"))
    // (vec, band, 4-bit band signature)
    val bandSigs = e.crossJoin(broadcast(hyper))
      .select(col("vec_id"), expr("hid div 4").as("band"),
        when(dot(col("emb"), col("hemb")) > 0,
          expr("shiftleft(cast(1 as bigint), cast(hid % 4 as int))"))
          .otherwise(lit(0L)).as("bit"))
      .groupBy("vec_id", "band").agg(sum(col("bit")).as("bsig"))
    val a = bandSigs.select(col("vec_id").as("va"), col("band"),
      col("bsig"))
    val b = bandSigs.select(col("vec_id").as("vb"),
      col("band").as("band_b"), col("bsig").as("bsig_b"))
    // candidates: collide in ≥1 band; distinct BEFORE the verify join so
    // multi-band collisions are scored once
    val cand = a.join(b,
        col("band") === col("band_b") && col("bsig") === col("bsig_b") &&
          col("va") < col("vb"))
      .select("va", "vb").distinct()
    val ea = e.select(col("vec_id").as("va"), col("emb").as("ea"),
      col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("vb"), col("emb").as("eb"),
      col("nrm").as("nb"))
    cand.join(ea, "va").join(eb, "vb")
      .withColumn("cosine",
        cosine(col("ea"), col("na"), col("eb"), col("nb")))
      .where(col("cosine") >= 0.45)
      .select("va", "vb", "cosine")
      .orderBy("va", "vb")
  }

  /** SemDeDup-style semantic dedup: cluster the embedding space (the
    * same deterministic IVF seed-centroid assignment as
    * [[qVectorAnnIvf]]), then compare pairs only WITHIN a cluster and
    * drop every vector that has a lower-id cluster-mate with cosine
    * ≥ 0.45 (reported with its keeper and that cosine). The clustering
    * is what makes semantic dedup tractable: candidate pairs are
    * Σ_cluster n_c²/2 instead of n²/2, and the per-cluster verify is an
    * equi-join on the cluster id — one shuffle keyed by cluster. At
    * corpus scale k_centroids grows with n to hold cluster sizes
    * roughly constant (n/k docs each), exactly the SemDeDup recipe. */
  def qSemanticDedup(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"),
      asDouble(col("embedding")).as("emb"))
    val cent = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    val asg = e.crossJoin(broadcast(cent))
      .withColumn("dist", squaredDistance(col("emb"), col("cemb")))
      .groupBy("vec_id")
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("acid"),
        first(col("emb")).as("emb"))
    val m = withNorm(asg, "emb")
    val a = m.select(col("acid"), col("vec_id").as("va"),
      col("emb").as("ea"), col("nrm").as("na"))
    val b = m.select(col("acid").as("acid_b"), col("vec_id").as("vb"),
      col("emb").as("eb"), col("nrm").as("nb"))
    a.join(b, col("acid") === col("acid_b") && col("va") < col("vb") &&
        cosine(col("ea"), col("na"), col("eb"), col("nb")) >= 0.45)
      .withColumn("cosine",
        cosine(col("ea"), col("na"), col("eb"), col("nb")))
      .groupBy(col("vb").as("vec_id"))
      .agg(min(col("va")).as("kept_by"),
        min_by(col("cosine"), col("va")).as("kept_cosine"))
      .orderBy("vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vector_topk"    -> qVectorTopk _,
    "q_vector_ann_ivf" -> qVectorAnnIvf _,
    "q_vector_ann_kmeans" -> qVectorAnnKmeans _,
    "q_vector_ann_pq"  -> qVectorAnnPq _,
    "q_embed_knn"      -> qEmbedKnn _,
    "q_embed_pairs"    -> qEmbedPairs _,
    "q_embed_lsh_pairs" -> qEmbedLshPairs _,
    "q_semantic_dedup" -> qSemanticDedup _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |cent AS (SELECT vec_id AS cid, emb AS cemb FROM e
        |         WHERE vec_id < 8),
        |ad AS (SELECT e.vec_id, cent.cid,
        |         list_sum(list_transform(list_zip(e.emb, cent.cemb),
        |           z -> (z[1]-z[2])*(z[1]-z[2]))) AS dist
        |       FROM e, cent),
        |asg AS (SELECT vec_id, cid AS acid FROM (
        |         SELECT vec_id, cid, ROW_NUMBER() OVER (
        |           PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
        |         FROM ad) WHERE rn = 1),
        |m AS (SELECT e.vec_id, e.emb, asg.acid
        |      FROM e JOIN asg USING (vec_id)),
        |p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
        |        list_cosine_similarity(a.emb, b.emb) AS cosine
        |      FROM m a JOIN m b
        |        ON a.acid = b.acid AND a.vec_id < b.vec_id
        |      WHERE list_cosine_similarity(a.emb, b.emb) >= 0.45)
        |SELECT vb AS vec_id, MIN(va) AS kept_by,
        |       arg_min(cosine, va) AS kept_cosine
        |FROM p GROUP BY vb ORDER BY vec_id""".stripMargin,
    "q_embed_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings)
        |SELECT a.vec_id AS va, b.vec_id AS vb,
        |       list_cosine_similarity(a.emb, b.emb) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.45
        |ORDER BY va, vb""".stripMargin,
    "q_embed_lsh_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |h AS (SELECT vec_id AS hid, emb AS hemb FROM e WHERE vec_id < 16),
        |bits AS (
        |  SELECT e.vec_id, h.hid // 4 AS band,
        |    CASE WHEN list_dot_product(e.emb, h.hemb) > 0
        |         THEN CAST(1 AS BIGINT) << CAST(h.hid % 4 AS INTEGER)
        |         ELSE 0 END AS bit
        |  FROM e, h),
        |bsigs AS (SELECT vec_id, band, CAST(SUM(bit) AS BIGINT) AS bsig
        |          FROM bits GROUP BY vec_id, band),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
        |  FROM bsigs a JOIN bsigs b
        |    ON a.band = b.band AND a.bsig = b.bsig
        |   AND a.vec_id < b.vec_id)
        |SELECT va, vb,
        |       list_cosine_similarity(ea.emb, eb.emb) AS cosine
        |FROM cand
        |JOIN e ea ON ea.vec_id = va
        |JOIN e eb ON eb.vec_id = vb
        |WHERE list_cosine_similarity(ea.emb, eb.emb) >= 0.45
        |ORDER BY va, vb""".stripMargin,
    "q_vector_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) qe
        |           FROM embeddings WHERE vec_id < 5),
        |     c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) ce
        |           FROM embeddings WHERE vec_id >= 5),
        |     p AS (SELECT query_id, cand_id,
        |             list_cosine_similarity(qe, ce) AS cosine FROM c, q),
        |     r AS (SELECT query_id, cand_id, cosine,
        |             ROW_NUMBER() OVER (PARTITION BY query_id
        |               ORDER BY cosine DESC, cand_id) AS rnk
        |           FROM p)
        |SELECT query_id, cand_id, rnk, cosine FROM r
        |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "q_vector_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 8),
        |ad AS (SELECT e.vec_id, cent.cid,
        |         list_sum(list_transform(list_zip(e.emb, cent.cemb),
        |           z -> (z[1]-z[2])*(z[1]-z[2]))) AS dist
        |       FROM e, cent),
        |asg AS (SELECT vec_id, cid AS acid FROM (
        |         SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
        |           ORDER BY dist ASC, cid ASC) AS rn FROM ad) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < 5),
        |pd AS (SELECT q.query_id, cent.cid,
        |         list_sum(list_transform(list_zip(q.qe, cent.cemb),
        |           z -> (z[1]-z[2])*(z[1]-z[2]))) AS dist
        |       FROM q, cent),
        |probes AS (SELECT query_id, cid AS pcid FROM (
        |         SELECT query_id, cid, ROW_NUMBER() OVER (
        |           PARTITION BY query_id ORDER BY dist ASC, cid ASC) AS rn
        |         FROM pd) WHERE rn <= 2),
        |cands AS (SELECT e.vec_id AS cand_id, e.emb AS ce, asg.acid
        |          FROM e JOIN asg ON e.vec_id = asg.vec_id
        |          WHERE e.vec_id >= 5),
        |scored AS (SELECT p.query_id, c.cand_id,
        |             list_cosine_similarity(q.qe, c.ce) AS cosine
        |           FROM cands c
        |           JOIN probes p ON c.acid = p.pcid
        |           JOIN q ON q.query_id = p.query_id),
        |r AS (SELECT query_id, cand_id, cosine,
        |        ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY cosine DESC, cand_id) AS rnk
        |      FROM scored)
        |SELECT query_id, cand_id, rnk, cosine FROM r
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "q_vector_ann_kmeans" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(round(x * 1048576) AS BIGINT)) AS xq,
        |    CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |seeds AS (SELECT vec_id AS cid, xq AS cq FROM e WHERE vec_id < 8),
        |a1 AS (
        |  SELECT e.vec_id, s.cid,
        |    list_sum(list_transform(list_zip(e.xq, s.cq),
        |      z -> (z[1]-z[2])*(z[1]-z[2]))) AS dist
        |  FROM e, seeds s),
        |asg1 AS (
        |  SELECT vec_id, cid AS acid FROM (
        |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dist ASC, cid ASC) AS rn FROM a1) WHERE rn = 1),
        |dims AS (
        |  SELECT asg1.acid, generate_subscripts(e.xq, 1) AS pos,
        |         unnest(e.xq) AS v
        |  FROM asg1 JOIN e USING (vec_id)),
        |persum AS (
        |  SELECT acid, pos, SUM(v) AS sv FROM dims GROUP BY 1, 2),
        |sums AS (
        |  SELECT acid, list(sv ORDER BY pos) AS sq FROM persum GROUP BY 1),
        |cnt AS (SELECT acid, COUNT(*) AS c FROM asg1 GROUP BY 1),
        |cent AS (SELECT sums.acid, sq, c FROM sums JOIN cnt USING (acid)),
        |a2 AS (
        |  SELECT e.vec_id, ct.acid,
        |    CAST(list_sum(list_transform(list_zip(e.xq, ct.sq),
        |      z -> CAST(ct.c*z[1]-z[2] AS HUGEINT)
        |         * CAST(ct.c*z[1]-z[2] AS HUGEINT))) AS DOUBLE)
        |      / (CAST(ct.c AS DOUBLE) * CAST(ct.c AS DOUBLE)) AS dist
        |  FROM e, cent ct),
        |asg2 AS (
        |  SELECT vec_id, acid AS acid2 FROM (
        |    SELECT vec_id, acid, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dist ASC, acid ASC) AS rn FROM a2) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, xq AS qx, emb AS qe FROM e
        |      WHERE vec_id < 5),
        |pd AS (
        |  SELECT q.query_id, ct.acid,
        |    CAST(list_sum(list_transform(list_zip(q.qx, ct.sq),
        |      z -> CAST(ct.c*z[1]-z[2] AS HUGEINT)
        |         * CAST(ct.c*z[1]-z[2] AS HUGEINT))) AS DOUBLE)
        |      / (CAST(ct.c AS DOUBLE) * CAST(ct.c AS DOUBLE)) AS dist
        |  FROM q, cent ct),
        |probes AS (
        |  SELECT query_id, acid AS pcid FROM (
        |    SELECT query_id, acid, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY dist ASC, acid ASC) AS rn FROM pd) WHERE rn <= 2),
        |cands AS (
        |  SELECT e.vec_id AS cand_id, e.emb AS ce, asg2.acid2
        |  FROM e JOIN asg2 USING (vec_id) WHERE e.vec_id >= 5),
        |scored AS (
        |  SELECT p.query_id, c.cand_id,
        |    list_cosine_similarity(q.qe, c.ce) AS cosine
        |  FROM cands c JOIN probes p ON c.acid2 = p.pcid
        |  JOIN q ON q.query_id = p.query_id),
        |r AS (
        |  SELECT query_id, cand_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, cand_id) AS rnk
        |  FROM scored)
        |SELECT query_id, cand_id, rnk, cosine FROM r
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "q_vector_ann_pq" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(round(x * 1048576) AS BIGINT)) AS xq,
        |    CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |js AS (SELECT unnest(range(0, 8)) AS j),
        |cb AS (
        |  SELECT e.vec_id AS cid, js.j,
        |    list_slice(e.xq, js.j*8 + 1, js.j*8 + 8) AS csub
        |  FROM e, js WHERE e.vec_id < 16),
        |vsub AS (
        |  SELECT e.vec_id AS cand_id, js.j,
        |    list_slice(e.xq, js.j*8 + 1, js.j*8 + 8) AS vsub
        |  FROM e, js WHERE e.vec_id >= 5),
        |enc AS (
        |  SELECT v.cand_id, v.j, cb.cid,
        |    CAST(list_sum(list_transform(list_zip(v.vsub, cb.csub),
        |      z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist
        |  FROM vsub v JOIN cb ON v.j = cb.j),
        |codes AS (
        |  SELECT cand_id, j, cid AS code FROM (
        |    SELECT cand_id, j, cid, ROW_NUMBER() OVER (
        |      PARTITION BY cand_id, j ORDER BY dist ASC, cid ASC) AS rn
        |    FROM enc) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, xq, emb AS qe FROM e
        |      WHERE vec_id < 5),
        |dtab AS (
        |  SELECT q.query_id, cb.j, cb.cid,
        |    CAST(list_sum(list_transform(list_zip(
        |      list_slice(q.xq, cb.j*8 + 1, cb.j*8 + 8), cb.csub),
        |      z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS d
        |  FROM q, cb),
        |approx AS (
        |  SELECT dt.query_id, c.cand_id, CAST(SUM(dt.d) AS BIGINT) AS adist
        |  FROM codes c JOIN dtab dt ON c.j = dt.j AND c.code = dt.cid
        |  GROUP BY 1, 2),
        |pre AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT query_id, cand_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY adist ASC, cand_id ASC) AS rn
        |    FROM approx) WHERE rn <= 64),
        |scored AS (
        |  SELECT pre.query_id, pre.cand_id,
        |    list_cosine_similarity(q.qe, ce.emb) AS cosine
        |  FROM pre
        |  JOIN e ce ON ce.vec_id = pre.cand_id
        |  JOIN q ON q.query_id = pre.query_id),
        |r AS (
        |  SELECT query_id, cand_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, cand_id) AS rnk
        |  FROM scored)
        |SELECT query_id, cand_id, rnk, cosine FROM r
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "q_embed_knn" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, emb AS pe FROM e
        |      WHERE vec_id < 100),
        |s AS (SELECT p.probe_id, e.vec_id AS nn_id,
        |        list_cosine_similarity(p.pe, e.emb) AS cosine
        |      FROM e, p WHERE e.vec_id <> p.probe_id),
        |r AS (SELECT probe_id, nn_id, cosine,
        |        ROW_NUMBER() OVER (PARTITION BY probe_id
        |          ORDER BY cosine DESC, nn_id) AS rn
        |      FROM s)
        |SELECT probe_id, nn_id, cosine FROM r WHERE rn = 1
        |ORDER BY probe_id""".stripMargin,
  )
}
