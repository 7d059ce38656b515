package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Quality contract for the APPROXIMATE vector paths: an ANN index that
  * is never measured against the exact answer is a liability, so this
  * spec computes recall directly.
  *
  *  - banded sign-LSH pairs must be a SUBSET of the exact cos ≥ 0.45
  *    pairs (precision 1 by construction — every candidate is verified)
  *    and retrieve a usable fraction of them;
  *  - IVF (both seed and k-means-refined) top-5 per query is compared
  *    against brute-force top-5: nprobe=2 of 8 clusters scans ~25% of
  *    the corpus, so recall well above 25% means the space is genuinely
  *    clustered and the index earns its keep. */
class VectorRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH pairs are exact-subset with measurable recall") {
    val exact = pairSet(ops.Vectors.qEmbedPairs(spark, sf))
    val lsh = pairSet(ops.Vectors.qEmbedLshPairs(spark, sf))
    assert(lsh.subsetOf(exact),
      s"LSH produced non-pairs: ${lsh -- exact}")
    assert(exact.nonEmpty && lsh.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    info(f"banded sign-LSH recall over cos>=0.45 pairs: $recall%.2f " +
      s"(${lsh.size}/${exact.size})")
    assert(recall >= 0.25, f"recall collapsed: $recall%.2f")
  }

  private def top5(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF recall versus brute force beats its scan fraction") {
    val exact = ops.Vectors.qVectorTopk(spark, sf)
      .where(org.apache.spark.sql.functions.col("rnk") <= 5)
    val exactSet = top5(exact)
    val seed = top5(ops.Vectors.qVectorAnnIvf(spark, sf))
    val kmeans = top5(ops.Vectors.qVectorAnnKmeans(spark, sf))
    val rSeed = (seed & exactSet).size.toDouble / exactSet.size
    val rKm = (kmeans & exactSet).size.toDouble / exactSet.size
    info(f"IVF recall@5 — seed centroids: $rSeed%.2f, " +
      f"k-means-refined: $rKm%.2f (scan fraction ~0.25)")
    assert(rSeed > 0.25, f"seed IVF no better than random scan: $rSeed%.2f")
    assert(rKm > 0.25, f"k-means IVF no better than random scan: $rKm%.2f")
  }

  test("PQ+ADC preselect recall versus brute force beats its candidate fraction") {
    val exact = ops.Vectors.qVectorTopk(spark, sf)
      .where(org.apache.spark.sql.functions.col("rnk") <= 5)
    val exactSet = top5(exact)
    val pq = top5(ops.Vectors.qVectorAnnPq(spark, sf))
    val r = (pq & exactSet).size.toDouble / exactSet.size
    val nCands = spark.read.parquet(s"$sf/embeddings.parquet")
      .where("vec_id >= 5").count()
    info(f"PQ recall@5: $r%.2f (preselect C=64 of $nCands candidates = " +
      f"${64.0 / nCands}%.3f scan fraction at rerank)")
    // the preselect keeps 64/n candidates; recall far above that fraction
    // means the 4-byte codes genuinely preserve neighborhood structure
    assert(r > 0.5, f"PQ preselect lost the true neighbors: $r%.2f")
  }
}
