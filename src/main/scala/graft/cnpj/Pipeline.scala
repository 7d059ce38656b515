package graft.cnpj

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end CNPJ pipeline — the Spark re-expression of the reference's
  * main() (ETLCNPJFinalEmpresaEstabelecimentos.py:237-265):
  *
  *   download → unzip → [re-header] → load → index → query → export
  *
  * becomes
  *
  *   (driver fetch utils) → schema-on-read CSV → typed parquet warehouse
  *   (repartitioned on join keys — the "index") → flagship star join →
  *   BOM'd CSV export.
  *
  * The re-header stage disappears entirely (schema-on-read), chunking
  * disappears (partitions), PRAGMA/commit dance disappears (atomic job
  * commit). Every arrow after the fetch is distributed.
  */
object Pipeline {

  /** Ingest raw CSVs → typed parquet warehouse. `rawDir` holds one
    * subdirectory per table of `;`-separated headerless latin-1 CSVs
    * (the Receita Federal layout). */
  def buildWarehouse(spark: SparkSession, rawDir: String, warehouseDir: String)
      : Unit = {
    def raw(sub: String, schema: org.apache.spark.sql.types.StructType) =
      Ingest.readRawCsv(spark, s"$rawDir/$sub", schema)

    Warehouse.writeTable(
      Warehouse.typedEmpresas(raw("empresas", Schemas.empresasRaw)),
      s"$warehouseDir/empresas", Some("cnpj_basico"))
    Warehouse.writeTable(
      Warehouse.typedEstabelecimentos(
        raw("estabelecimentos", Schemas.estabelecimentosRaw)),
      s"$warehouseDir/estabelecimentos", Some("cnpj_basico"))
    Warehouse.writeTable(
      Warehouse.typedCnae(raw("cnae", Schemas.cnaeRaw)),
      s"$warehouseDir/cnae", None)
    Warehouse.writeTable(
      Warehouse.typedMunicipios(raw("municipios", Schemas.municipiosRaw)),
      s"$warehouseDir/municipios", None)
    Warehouse.writeTable(
      Warehouse.typedMotivoSituacao(
        raw("motivo_situacao_cadastral", Schemas.motivoSituacaoRaw)),
      s"$warehouseDir/motivo_situacao_cadastral", None)

    // FK-only catalogs (referenced by the DDL's FOREIGN KEYs, never queried
    // — ETLCNPJFinalEmpresaEstabelecimentos.py:122-152). Optional: loaded
    // when the raw directory ships them, skipped otherwise, matching the
    // reference running its load with FKs off and these tables absent.
    Seq(
      ("natureza_juridica", Schemas.naturezaJuridicaRaw,
        Warehouse.typedNaturezaJuridica _),
      ("qualificacao_responsavel", Schemas.qualificacaoResponsavelRaw,
        Warehouse.typedQualificacaoResponsavel _),
      ("pais", Schemas.paisRaw, Warehouse.typedPais _)
    ).foreach { case (sub, schema, typed) =>
      if (new File(s"$rawDir/$sub").isDirectory)
        Warehouse.writeTable(typed(raw(sub, schema)),
          s"$warehouseDir/$sub", None)
    }

    // The reference's post-load ANALYZE step (readme.md:135) — collect
    // planner statistics over the joined/filtered columns so the
    // flagship (and any ad-hoc query over the catalog names) plans with
    // row counts and filter selectivity instead of raw file bytes. One
    // extra scan per table at load time; flagship() reads through these
    // registrations when they point at this warehouse.
    Seq(
      ("estabelecimentos", Seq("cnpj_basico", "id_cnae", "id_municipio",
        "id_situacao_cadastral")),
      ("empresas", Seq("cnpj_basico", "natureza_juridica")),
      ("cnae", Seq("id_cnae")),
      ("municipios", Seq("id_municipio")),
      ("motivo_situacao_cadastral", Seq("id_situacao_cadastral"))
    ).foreach { case (t, cols) =>
      Warehouse.analyzeTable(spark, s"cnpj_$t", s"$warehouseDir/$t", cols)
    }
  }

  /** Run the flagship query over the warehouse — through the ANALYZE'd
    * catalog registrations when buildWarehouse made them for THIS
    * warehouse dir (CBO then sees row counts + column stats), plain
    * path reads otherwise. */
  def flagship(spark: SparkSession, warehouseDir: String): DataFrame = {
    def t(n: String) =
      Warehouse.readTableWithStats(spark, s"cnpj_$n", s"$warehouseDir/$n")
    Flagship.query(t("estabelecimentos"), t("cnae"), t("empresas"),
      t("municipios"), t("motivo_situacao_cadastral"))
  }

  /** Full run: warehouse → flagship → single-file BOM'd CSV export
    * (the reference's resultado_final.csv shape). */
  def run(spark: SparkSession, rawDir: String, warehouseDir: String,
      exportDir: String, exportFile: File): DataFrame = {
    buildWarehouse(spark, rawDir, warehouseDir)
    // cached: the export writes it and callers typically count/show it —
    // without the cache each action re-runs the 5-way join
    val result = flagship(spark, warehouseDir).cache()
    Export.writeCsvUtf8SigSingle(
      result.orderBy("cnpj_basico", "nome_fantasia"), exportDir, exportFile)
    result
  }

  /** Full run rendered pandas-compat (the golden resultado_final.csv
    * artifacts — float-formatted ddd/telefone, comma-decimal
    * capital_social; see [[PandasCompat]]). The warehouse itself stays
    * canonically typed; compat is applied only at export. */
  def runCompat(spark: SparkSession, rawDir: String, warehouseDir: String,
      exportDir: String, exportFile: File): DataFrame = {
    buildWarehouse(spark, rawDir, warehouseDir)
    val result = PandasCompat(flagship(spark, warehouseDir)).cache()
    Export.writeCsvUtf8SigSingle(
      result.orderBy("cnpj_basico", "nome_fantasia"), exportDir, exportFile)
    result
  }
}
