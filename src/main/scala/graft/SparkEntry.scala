package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full operator inventory (SURVEY.md §2), one key
  * per operator, each runnable on any testdata scale-factor directory.
  * `oracleSql` holds the DuckDB-equivalent ANSI SQL for every
  * SQL-expressible key; keys absent there get the driver's weaker rows-only
  * check (probabilistic sketches, LSH, mapPartitions plumbing).
  */
object SparkEntry {

  /** Flagship query (the reference's QUERY_FINAL shape,
    * ETLCNPJFinalEmpresaEstabelecimentos.py:191-234) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.qStarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++
    ops.Aggregates.queries ++
    ops.Windows.queries ++
    ops.SetOps.queries ++
    ops.Text.queries ++
    ops.Vectors.queries ++
    ops.Sketches.queries ++
    ops.Hnsw.queries ++
    ops.Multimodal.queries ++
    ops.Advanced.queries ++
    ops.Strings.queries ++
    ops.CorpusPipeline.queries ++
    ops.Sources.queries ++
    ops.Layout.queries ++
    ops.Ranking.queries ++
    ops.QualitySignals.queries ++
    ops.Curation.queries ++
    ops.Behavior.queries ++
    ops.Bpe.queries ++
    ops.Graph.queries ++
    sql.GraftSql.queries ++
    cnpj.FlagshipKey.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracleSql ++
    ops.Aggregates.oracleSql ++
    ops.Windows.oracleSql ++
    ops.SetOps.oracleSql ++
    ops.Text.oracleSql ++
    ops.Vectors.oracleSql ++
    ops.Sketches.oracleSql ++
    ops.Hnsw.oracleSql ++
    ops.Multimodal.oracleSql ++
    ops.Advanced.oracleSql ++
    ops.Strings.oracleSql ++
    ops.CorpusPipeline.oracleSql ++
    ops.Sources.oracleSql ++
    ops.Layout.oracleSql ++
    ops.Ranking.oracleSql ++
    ops.QualitySignals.oracleSql ++
    ops.Curation.oracleSql ++
    ops.Behavior.oracleSql ++
    ops.Bpe.oracleSql ++
    ops.Graph.oracleSql ++
    sql.GraftSql.oracleSql ++
    cnpj.FlagshipKey.oracleSql
}
