package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and packing: benchmark decontamination and domain-mixture
  * weighting.
  *
  * Scale posture:
  *   - Decontamination is an n-gram containment join: the EVAL side (the
  *     benchmark suite) is tiny and broadcast; the training corpus is
  *     exploded to distinct grams per doc and joined — one narrow
  *     broadcast-hash join over the full scan, no corpus-side shuffle
  *     before aggregation, and the shuffle that remains carries (train
  *     doc, gram-hit) pairs only. At 100 TB the grams are hashed to
  *     64-bit longs (xxhash64) so the probe side is 8 bytes/row; here
  *     they stay strings because the oracle replays them.
  *   - Domain mixture is a classic metadata aggregate: one groupBy over
  *     a low-cardinality key, one broadcast of the 1-row total. The
  *     whole job reads two columns at any scale.
  */
object Curation {

  private val N = 4 // gram width; 4 catches phrase-level contamination
                    // in the synthetic corpus at every SF

  /** Distinct word-N-grams from an already-materialized token array.
    * `tk` must be a plain column reference: Column trees are inlined at
    * every use site and Spark disables codegen subexpression elimination
    * for lambda-bearing expressions, so passing the tokenizer expression
    * here directly would re-run the regex split 3× per row. */
  private def gramsFromToks(tk: Column): Column =
    when(size(tk) >= N,
      array_distinct(transform(sequence(lit(1), size(tk) - (N - 1)),
        i => concat_ws(" ", slice(tk, i, lit(N))))))
      .otherwise(array().cast("array<string>"))

  /** Benchmark decontamination report: training docs (doc_id % 97 ≠ 0)
    * sharing at least one word-4-gram with the held-out eval slice
    * (doc_id % 97 = 0 — the stand-in for a benchmark suite). Reports how
    * many distinct grams and eval docs each contaminated training doc
    * touches; a real pipeline would drop or redact these rows. */
  def qDecontaminate(s: SparkSession, d: String): DataFrame = {
    def side(pred: Column, as: String) =
      documents(s, d).where(pred)
        .select(col("doc_id").as(as), Text.toks(col("text")).as("tk"))
        .select(col(as), explode(gramsFromToks(col("tk"))).as("g"))
    val ev = side(col("doc_id") % 97 === 0, "eval_id")
    val tr = side(col("doc_id") % 97 =!= 0, "train_id")
    tr.join(broadcast(ev), "g")
      .groupBy("train_id")
      .agg(countDistinct(col("g")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("train_id")
  }

  /** Domain-mixture weights: temperature-flattened sampling distribution
    * over the `source` field (w_i ∝ n_i^0.7, the multilingual-training
    * upsampling scheme), plus the implied per-doc upsample factor
    * relative to natural frequency. round(…,6) on both engines absorbs
    * the libm pow/accumulation-order ULPs. */
  def qDomainMix(s: SparkSession, d: String): DataFrame = {
    val counts = documents(s, d).groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    val totals = counts.agg(
      sum(pow(col("n_docs").cast("double"), 0.7d)).as("z"),
      sum(col("n_docs")).as("n_total"))
    counts.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_chars"),
        round(pow(col("n_docs").cast("double"), 0.7d) / col("z"), 6)
          .as("weight"),
        round((pow(col("n_docs").cast("double"), 0.7d) / col("z")) /
          (col("n_docs").cast("double") / col("n_total")), 6)
          .as("upsample"))
      .orderBy("source")
  }

  /** Data selection under a token budget: per language, take documents
    * in quality order (best first) until 2000 tokens are claimed — the
    * "which slice of the corpus do we actually train on" primitive.
    * A doc is kept while the budget has room BEFORE it (same prior-cumsum
    * convention as sequence packing, so one oversized best doc still
    * ships). One shuffle on the stratum key; the per-stratum sort is the
    * operator. Quality here is the same integer-derived-and-one-division
    * score as q_text_quality, so the ordering is engine-exact. */
  def qBudgetSelect(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 2000L
    val scored = documents(s, d)
      .select(col("doc_id"), col("lang"), Text.toks(col("text")).as("tk"))
      .select(col("doc_id"), col("lang"),
        size(col("tk")).cast("long").as("n_tok"),
        size(filter(col("tk"), t => t.isin(Seq("the", "a", "of", "and",
          "to", "in", "is", "on", "for", "with"): _*)))
          .cast("long").as("n_stop"))
      .where(col("n_tok") > 0)
      .withColumn("quality",
        least(col("n_tok"), lit(100L)).cast("double") / 100.0d * 0.5d +
          col("n_stop").cast("double") / col("n_tok") * 0.5d)
    val w = Window.partitionBy("lang")
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .where(col("cum_tok") - col("n_tok") < budget)
      .select(col("doc_id"), col("lang"), col("n_tok"),
        round(col("quality"), 6).as("quality"), col("cum_tok"))
      .orderBy("lang", "cum_tok", "doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decontaminate" -> qDecontaminate _,
    "q_domain_mix"    -> qDomainMix _,
    "q_budget_select" -> qBudgetSelect _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_decontaminate" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                x -> x <> '') AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(tk) - 2),
        |      i -> array_to_string(tk[i:i+3], ' '))) AS gs
        |  FROM tk WHERE len(tk) >= 4),
        |ev AS (SELECT doc_id AS eval_id, unnest(gs) AS g FROM g
        |       WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id AS train_id, unnest(gs) AS g FROM g
        |       WHERE doc_id % 97 <> 0)
        |SELECT train_id,
        |  CAST(COUNT(DISTINCT g) AS BIGINT) AS n_shared_grams,
        |  CAST(COUNT(DISTINCT eval_id) AS BIGINT) AS n_eval_docs
        |FROM tr JOIN ev USING (g)
        |GROUP BY train_id ORDER BY train_id""".stripMargin,
    "q_budget_select" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                x -> x <> '') AS tk
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, lang,
        |    CAST(len(tk) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(tk, x -> x IN ('the','a','of','and','to',
        |      'in','is','on','for','with'))) AS BIGINT) AS n_stop
        |  FROM tk WHERE len(tk) > 0),
        |q AS (
        |  SELECT doc_id, lang, n_tok,
        |    CAST(least(n_tok, 100) AS DOUBLE) / 100.0 * 0.5
        |      + CAST(n_stop AS DOUBLE) / n_tok * 0.5 AS quality
        |  FROM sc),
        |c AS (
        |  SELECT doc_id, lang, n_tok, quality,
        |    CAST(SUM(n_tok) OVER (PARTITION BY lang
        |      ORDER BY quality DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tok
        |  FROM q)
        |SELECT doc_id, lang, n_tok, round(quality, 6) AS quality, cum_tok
        |FROM c WHERE cum_tok - n_tok < 2000
        |ORDER BY lang, cum_tok, doc_id""".stripMargin,
    "q_domain_mix" ->
      """WITH c AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY source),
        |t AS (
        |  SELECT SUM(power(CAST(n_docs AS DOUBLE), 0.7)) AS z,
        |         CAST(SUM(n_docs) AS BIGINT) AS n_total
        |  FROM c)
        |SELECT source, n_docs, n_chars,
        |  round(power(CAST(n_docs AS DOUBLE), 0.7) / z, 6) AS weight,
        |  round((power(CAST(n_docs AS DOUBLE), 0.7) / z) /
        |        (CAST(n_docs AS DOUBLE) / n_total), 6) AS upsample
        |FROM c CROSS JOIN t ORDER BY source""".stripMargin,
  )
}
