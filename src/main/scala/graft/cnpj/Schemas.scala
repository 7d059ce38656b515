package graft.cnpj

import org.apache.spark.sql.types._

/** CNPJ registry schemas, taken from the reference's column declarations.
  *
  * All ingest columns are StringType, mirroring the reference reading every
  * CSV field as string (`dtype=str`,
  * ETLCNPJFinalEmpresaEstabelecimentos.py:87, :170). Typed projections are
  * applied in [[Warehouse]] — we deliberately do NOT reproduce SQLite's
  * per-cell NUMERIC affinity (SURVEY.md §1.3): clean numerics get real
  * types, affinity-mixed fields (numero, ddd*, telefone*) stay strings.
  */
object Schemas {

  private def allString(names: Seq[String]): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  /** 7 columns — ETLCNPJFinalEmpresaEstabelecimentos.py:38-42. */
  val empresasCols: Seq[String] = Seq(
    "cnpj_basico", "razao_social", "natureza_juridica",
    "qualificacao_responsavel", "capital_social", "porte_empresa",
    "ente_federativo_responsavel")
  val empresasRaw: StructType = allString(empresasCols)

  /** 30 columns — ETLCNPJFinalEmpresaEstabelecimentos.py:44-53. */
  val estabelecimentosCols: Seq[String] = Seq(
    "cnpj_basico", "cnpj_ordem", "cnpj_dv", "identificador_matriz_filial",
    "nome_fantasia", "id_situacao_cadastral", "data_situacao_cadastro",
    "motivo_cadastral", "nome_da_cidade_no_exterior", "pais",
    "data_de_inicio_atividade", "id_cnae", "cnae_fiscal_secundaria",
    "tipo_do_logradouro", "logradouro", "numero", "complemento", "bairro",
    "cep", "uf", "id_municipio", "ddd1", "telefone1", "ddd2", "telefone2",
    "ddd_do_fax", "fax", "correio_eletronico", "situacao_especial",
    "data_da_situacao_especial")
  val estabelecimentosRaw: StructType = allString(estabelecimentosCols)

  /** Dimension tables the flagship query joins (prerequisites the
    * reference assumes pre-populated; readme.md:149-159 + join sites
    * ETLCNPJFinalEmpresaEstabelecimentos.py:216-222). */
  val cnaeRaw: StructType = allString(Seq("id_cnae", "descricao_cnae"))
  val municipiosRaw: StructType =
    allString(Seq("id_municipio", "nome_municipio"))
  val motivoSituacaoRaw: StructType =
    allString(Seq("id_situacao_cadastral", "descricao_situacao_cadastral"))

  /** FK-only dimension catalogs: referenced by the warehouse DDL's FOREIGN
    * KEYs (ETLCNPJFinalEmpresaEstabelecimentos.py:122-152) but never joined
    * by any reference query — carried for catalog completeness. Receita
    * publishes each as a 2-column `codigo;descricao` CSV in the same
    * headerless latin-1 dialect. */
  val naturezaJuridicaRaw: StructType =
    allString(Seq("natureza_juridica", "descricao_natureza_juridica"))
  val qualificacaoResponsavelRaw: StructType =
    allString(Seq("qualificacao_responsavel",
      "descricao_qualificacao_responsavel"))
  val paisRaw: StructType = allString(Seq("pais", "descricao_pais"))
}
