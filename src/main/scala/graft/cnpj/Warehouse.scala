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
