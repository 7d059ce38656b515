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
  *     window. The scan parallelizes perfectly; the window shuffles
  *     n_cand × n_query scored rows on query_id. Upgrade path: partial
  *     top-k per partition (mapPartitions heap) before the shuffle, which
  *     caps shuffle volume at k × partitions × queries.
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
    * vec_id < 5 against all candidates vec_id >= 5. */
  def qVectorTopk(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"),
      asDouble(col("embedding")).as("emb"))
    val q = withNorm(e.where(col("vec_id") < 5), "emb")
      .select(col("vec_id").as("query_id"), col("emb").as("qe"),
        col("nrm").as("qn"))
    val c = withNorm(e.where(col("vec_id") >= 5), "emb")
      .select(col("vec_id").as("cand_id"), col("emb").as("ce"),
        col("nrm").as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    c.crossJoin(broadcast(q))
      .withColumn("cosine", cosine(col("qe"), col("qn"), col("ce"), col("cn")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 10)
      .select("query_id", "cand_id", "rnk", "cosine")
      .orderBy("query_id", "rnk")
  }

  /** X3 scale path: IVF ANN. Centroids = vectors vec_id < 8 (deterministic
    * seeds). Every candidate is assigned to its nearest centroid by L2²
    * (argmin, ties → smaller centroid id); each query probes its nprobe=2
    * nearest clusters and ranks only those candidates by cosine (top-5). */
  def qVectorAnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"),
      asDouble(col("embedding")).as("emb"))
    val cent = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    def l2sq(a: Column, b: Column): Column = squaredDistance(a, b)

    // cluster assignment: one broadcast-join pass over the corpus
    val asgW = Window.partitionBy("vec_id")
      .orderBy(col("dist").asc, col("cid").asc)
    val asg = e.crossJoin(broadcast(cent))
      .withColumn("dist", l2sq(col("emb"), col("cemb")))
      .withColumn("rn", row_number().over(asgW))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("acid"))

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vector_topk"    -> qVectorTopk _,
    "q_vector_ann_ivf" -> qVectorAnnIvf _,
    "q_embed_knn"      -> qEmbedKnn _,
    "q_embed_pairs"    -> qEmbedPairs _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_embed_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings)
        |SELECT a.vec_id AS va, b.vec_id AS vb,
        |       list_cosine_similarity(a.emb, b.emb) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.45
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
