package graft.cnpj

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet warehouse + typed views (SURVEY.md §2.1 S8–S10, §1.4).
  *
  * The reference's SQLite warehouse (CREATE TABLE + chunked append + B-tree
  * indexes, ETLCNPJFinalEmpresaEstabelecimentos.py:113-182) maps to parquet
  * tables with an atomic job commit. Secondary indexes have no Spark
  * equivalent; their physical role (join/filter locality on cnpj_basico,
  * id_cnae) is filled by `repartition(col)` at write time — co-located
  * sorted row groups give min/max skipping on the filter keys, and the
  * dims are broadcast at query time anyway.
  *
  * Typed views implement the §1.4 canonical typing decision: clean
  * numerics/dates get real types; affinity-mixed columns (numero, ddd*,
  * telefone*) deliberately stay strings so SQLite's "11.0" float artifact
  * never enters the engine.
  */
object Warehouse {

  /** S8/S9: overwrite-write a table, partitioned on a locality key —
    * the physical analogue of the reference's bulk-load-then-index. */
  def writeTable(df: DataFrame, dir: String, partitionKey: Option[String])
      : Unit = {
    val out = partitionKey.fold(df)(k => df.repartition(col(k)))
    out.write.mode("overwrite").parquet(dir)
  }

  def readTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** S10 adjunct — the reference readme's post-load `ANALYZE` suggestion
    * (readme.md:135, SQLite's planner statistics) mapped to Spark's
    * cost-based optimizer: register the parquet directory as an external
    * catalog table and collect table-level statistics (size, row count)
    * plus per-column min/max/ndv/null-count for the named columns.
    *
    * Why it matters at warehouse scale: without catalog statistics the
    * planner sees only file bytes, and a FILTERED relation keeps its
    * full-scan estimate (Filter is a pass-through in size-only
    * estimation) — so a dimension that shrinks to a few KB after its
    * predicate still plans as a shuffle join. With column stats, CBO's
    * FilterEstimation turns ndv/min-max into selectivity, the estimate
    * drops below the broadcast threshold, and the join flips to
    * BroadcastHashJoin (CboStatsSpec pins exactly that flip). Stats are
    * one extra scan at load time, amortized over every later query.
    * Column-selectivity estimation needs `spark.sql.cbo.enabled=true` in
    * the QUERYING session — deliberately not GraftSession's default,
    * because on deep plans with NO catalog stats the CBO estimator is
    * measurable pure overhead (see the GraftSession comment); table-level
    * size/row-count stats improve estimates either way.
    *
    * Overwrite-by-design: re-registration replaces the previous
    * definition, matching the overwrite warehouse write above. */
  def analyzeTable(spark: SparkSession, name: String, dir: String,
      statsColumns: Seq[String] = Nil): DataFrame = {
    // qualify the location up front: a relative dir in LOCATION would
    // otherwise resolve against spark.sql.warehouse.dir, not the cwd the
    // caller wrote the parquet to
    val loc = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p)
    }
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(s"CREATE TABLE `$name` USING parquet LOCATION '$loc'")
    spark.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS")
    if (statsColumns.nonEmpty)
      spark.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS FOR COLUMNS " +
        statsColumns.map(c => s"`$c`").mkString(", "))
    spark.table(name)
  }

  /** Read through the ANALYZE'd catalog table when one named `name` is
    * registered AT exactly `dir` — the statistics then flow into this
    * plan — and fall back to the plain path read otherwise (a session
    * that never ran [[analyzeTable]], or a test pointing the same name
    * at a different warehouse). Qualified-path comparison, so relative
    * dirs and URI-style catalog locations compare equal. */
  def readTableWithStats(spark: SparkSession, name: String, dir: String)
      : DataFrame = {
    import org.apache.hadoop.fs.Path
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(name)
    val cat = spark.sessionState.catalog
    val hconf = spark.sparkContext.hadoopConfiguration
    def qualified(p: Path) = p.getFileSystem(hconf).makeQualified(p)
    val registeredHere = cat.tableExists(ident) &&
      qualified(new Path(cat.getTableMetadata(ident).location)) ==
        qualified(new Path(dir))
    if (registeredHere) spark.table(name) else readTable(spark, dir)
  }

  /** Comma-decimal → DECIMAL(18,2): "195400,00" (FIXTURES.md A.1). */
  def commaDecimal(c: org.apache.spark.sql.Column) =
    regexp_replace(c, ",", ".").cast("decimal(18,2)")

  /** yyyyMMdd text dates → DateType ("20080409", FIXTURES.md A.2);
    * empty/zero dates → null. */
  def cnpjDate(c: org.apache.spark.sql.Column) =
    when(c.isNull || c === "" || c === "0" || c === "00000000", lit(null))
      .otherwise(to_date(c, "yyyyMMdd"))

  /** Typed empresas view (raw is all-string per Schemas). */
  def typedEmpresas(raw: DataFrame): DataFrame =
    raw.select(
      col("cnpj_basico").cast("long").as("cnpj_basico"),
      col("razao_social"),
      col("natureza_juridica").cast("int").as("natureza_juridica"),
      col("qualificacao_responsavel").cast("int")
        .as("qualificacao_responsavel"),
      commaDecimal(col("capital_social")).as("capital_social"),
      col("porte_empresa"),
      col("ente_federativo_responsavel"))

  /** Typed estabelecimentos view — only the columns the flagship needs
    * typed; the rest pass through as strings. */
  def typedEstabelecimentos(raw: DataFrame): DataFrame =
    raw
      .withColumn("cnpj_basico", col("cnpj_basico").cast("long"))
      .withColumn("id_situacao_cadastral",
        col("id_situacao_cadastral").cast("int"))
      .withColumn("id_cnae", col("id_cnae").cast("long"))
      .withColumn("id_municipio", col("id_municipio").cast("int"))
      .withColumn("data_situacao_cadastro_d",
        cnpjDate(col("data_situacao_cadastro")))
      .withColumn("data_de_inicio_atividade_d",
        cnpjDate(col("data_de_inicio_atividade")))

  def typedCnae(raw: DataFrame): DataFrame =
    raw.select(col("id_cnae").cast("long").as("id_cnae"),
      col("descricao_cnae"))

  def typedMunicipios(raw: DataFrame): DataFrame =
    raw.select(col("id_municipio").cast("int").as("id_municipio"),
      col("nome_municipio"))

  def typedMotivoSituacao(raw: DataFrame): DataFrame =
    raw.select(
      col("id_situacao_cadastral").cast("int").as("id_situacao_cadastral"),
      col("descricao_situacao_cadastral"))

  /** FK-only catalogs (Schemas.naturezaJuridicaRaw etc.): integer code +
    * description, same typing rule as the other dims. */
  def typedNaturezaJuridica(raw: DataFrame): DataFrame =
    raw.select(col("natureza_juridica").cast("int").as("natureza_juridica"),
      col("descricao_natureza_juridica"))

  def typedQualificacaoResponsavel(raw: DataFrame): DataFrame =
    raw.select(
      col("qualificacao_responsavel").cast("int")
        .as("qualificacao_responsavel"),
      col("descricao_qualificacao_responsavel"))

  def typedPais(raw: DataFrame): DataFrame =
    raw.select(col("pais").cast("int").as("pais"), col("descricao_pais"))
}
