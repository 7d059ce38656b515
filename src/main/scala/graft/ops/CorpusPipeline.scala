package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** End-to-end training-data cleaning pipeline — the composition the
  * individual operators exist for:
  *
  *   raw corpus
  *     → quality gate   (token/stopword heuristics, per-row, no shuffle)
  *     → exact dedup    (md5 fingerprint groupBy — one narrow shuffle)
  *     → near-dup dedup (shingle Jaccard ≥ 0.6 pairs; greedy keep-lowest-id
  *                       survivor per pair — LSH-prefiltered at corpus
  *                       scale, exact here)
  *     → cleaned corpus + per-stage attrition report
  *
  * Scale posture: every stage is one pass / one bounded shuffle; document
  * bodies never cross a shuffle (fingerprints and doc_ids do). The
  * greedy near-dup survivor rule (drop the higher doc_id of every
  * qualifying pair) is deterministic and single-pass; transitive-closure
  * clustering (connected components) is the heavyweight alternative when
  * dup chains matter.
  */
object CorpusPipeline {

  private def qualityGate(s: SparkSession, d: String): DataFrame =
    Text.qTextQuality(s, d)
      .where(col("n_tokens") >= 10 && col("quality") > 0.3)
      .select("doc_id")

  /** Cleaned corpus: doc_ids surviving all three gates. */
  def cleanedDocs(s: SparkSession, d: String): DataFrame = {
    val exactKeep = Text.qDedupExact(s, d).select(col("keep_id").as("doc_id"))
    val nearDupLosers = Text.nearDupPairs(s, d)
      .select(col("db").as("doc_id")).distinct()
    qualityGate(s, d)
      .join(exactKeep, "doc_id") // semi-ish: survivors of exact dedup
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
  }

  /** Per-stage attrition report (the pipeline's observable contract).
    * Each stage DataFrame is cached so its count and its role as input to
    * the next stage share one computation — without this, the report's
    * four actions would recompute the expensive near-dup stage from
    * scratch. */
  def qCorpusClean(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val quality = qualityGate(s, d).cache()
    val exactKeep = Text.qDedupExact(s, d)
      .select(col("keep_id").as("doc_id")).cache()
    val nearDupLosers = Text.nearDupPairs(s, d)
      .select(col("db").as("doc_id")).distinct().cache()
    try {
      val total = documents(s, d).count()
      val afterQuality = quality.count()
      val afterExact = exactKeep.count()
      val cleaned = quality
        .join(exactKeep, "doc_id")
        .join(nearDupLosers, Seq("doc_id"), "left_anti")
        .count()
      Seq(
        ("0_raw", total),
        ("1_quality_gate", afterQuality),
        ("2_exact_dedup_groups", afterExact),
        ("3_cleaned", cleaned),
      ).toDF("stage", "docs").orderBy("stage")
    } finally {
      quality.unpersist(); exactKeep.unpersist(); nearDupLosers.unpersist()
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_clean" -> qCorpusClean _,
  )

  /** Attrition counts are SQL-expressible but the composed pipeline is the
    * point; covered by ScalaTest invariants (monotone attrition,
    * determinism, survivor validity) instead of the oracle. */
  val oracleSql: Map[String, String] = Map.empty
}
