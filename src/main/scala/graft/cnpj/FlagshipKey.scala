package graft.cnpj

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's QUERY_FINAL (ETLCNPJFinalEmpresaEstabelecimentos.py:
  * 191-234) as a driver-surface oracle key: [[Flagship.query]] — the same
  * 5-table star join, the same three IN lists (verbatim literals from
  * [[Flagship]]), the same 20-column projection — run over synthetic CNPJ
  * tables derived DETERMINISTICALLY from the driver's testdata, so the
  * DuckDB oracle replays the identical construction and QUERY_FINAL itself
  * sits under the rows+schema+hash gate rather than only inside ScalaTest.
  *
  * Construction (pure modular arithmetic + string concat, engine-exact):
  * `estabelecimentos` maps one row per `orders` row with id columns drawn
  * from pairwise-coprime moduli (5 CNAEs / 4 municípios / 9 situações, of
  * which 3 / 3 / 3 pass the reference IN lists) so the three filters stay
  * independent and genuinely selective (~15% combined); `empresas` maps
  * one row per `customer`; the three dimensions are literal value tables.
  * Every synthetic column is unique per (cnpj_basico, numero), making the
  * final ORDER BY total — required for the driver's hash compare.
  */
object FlagshipKey {

  /** 3 of these 5 CNAE codes are in the reference's 53-literal list. */
  private val cnaeIds = Seq(4321500L, 7410202L, 4399199L, 1111111L, 2222222L)
  /** 3 of these 4 município codes are in the reference's list. */
  private val munIds = Seq(6313L, 7157L, 6669L, 1000L)

  private def pick(ids: Seq[Long], key: Column): Column =
    element_at(array(ids.map(lit): _*),
      (pmod(key, lit(ids.size)) + 1).cast("int"))

  /** Synthetic `estabelecimentos`: one row per orders row. */
  private def estab(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_custkey").as("cnpj_basico"),
      concat(lit("fant_"), (col("o_orderkey") % 1000).cast("string"))
        .as("nome_fantasia"),
      pick(cnaeIds, col("o_orderkey")).as("id_cnae"),
      pick(munIds, col("o_orderkey")).as("id_municipio"),
      (col("o_orderkey") % 9).as("id_situacao_cadastral"),
      col("o_orderpriority").as("bairro"),
      col("o_orderstatus").as("tipo_do_logradouro"),
      concat(lit("rua_"), (col("o_orderkey") % 50).cast("string"))
        .as("logradouro"),
      col("o_orderkey").cast("string").as("numero"),
      lpad((col("o_orderkey") % 100000).cast("string"), 8, "0").as("cep"),
      lit("").as("complemento"),
      (col("o_orderkey") % 90 + 10).cast("string").as("ddd1"),
      lpad((col("o_orderkey") % 10000000).cast("string"), 7, "9")
        .as("telefone1"),
      (col("o_custkey") % 90 + 10).cast("string").as("ddd2"),
      lpad((col("o_custkey") % 10000000).cast("string"), 7, "8")
        .as("telefone2"),
      concat(lit("cnpj"), col("o_custkey").cast("string"),
        lit("@example.com")).as("correio_eletronico"),
      col("o_orderdate").cast("date").cast("string")
        .as("data_de_inicio_atividade"),
      col("o_orderdate").cast("date").cast("string")
        .as("data_situacao_cadastro"))

  /** Synthetic `empresas`: one row per customer row. capital_social goes
    * through DECIMAL(12,2) so both engines print the identical 2-dp
    * string. */
  private def empresas(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").as("cnpj_basico"),
      col("c_name").as("razao_social"),
      col("c_acctbal").cast("decimal(12,2)").cast("string")
        .as("capital_social"))

  /** The fact table's warehouse landing: the reference bulk-loads
    * estabelecimentos into SQLite and B-tree-indexes the filter columns
    * (`ETLCNPJFinalEmpresaEstabelecimentos.py:167-182`) before querying.
    * Here the same load→index→query pipeline runs on the engine's OWN
    * table format: estabelecimentos commits into a graft-manifest table
    * z-clustered on (id_municipio, id_cnae) with manifest bounds
    * recorded for BOTH — the two selective IN filters then prune whole
    * files from the read set before any footer opens, the secondary-
    * index role at 100 TB. FlagshipManifestSpec pins the pruning. */
  private[graft] def estabTable(s: SparkSession, d: String): String =
    s"${graft.ops.Sources.ioDir(s, d)}/cnpj_estab_manifest"

  /** Marker proving the z-clustered warehouse table is built and
    * current for this build recipe — bump the suffix on any change to
    * the load (layout params, stats columns, estab derivation) so a
    * stale table from an older recipe rebuilds instead of silently
    * serving. */
  private def loadMarker(s: SparkSession, d: String) =
    new java.io.File(s"${estabTable(s, d)}/_FLAGSHIP_LOAD_OK_v1")

  /** The timed LOAD: drop + z-cluster + manifest-commit the fact table,
    * every invocation — the reference's bulk-load + CREATE INDEX phase
    * (`ETLCNPJFinalEmpresaEstabelecimentos.py:167-182`) as its own
    * bench-visible cost, instead of hiding inside the query key (the
    * r14 verdict: `q_cnpj_flagship` timed a 16 s CPU rebuild per run
    * with no note). */
  private def buildEstabWarehouse(s: SparkSession, d: String): String = {
    import graft.ops.Layout
    val table = estabTable(s, d)
    Layout.dropTable(s, table) // deterministic re-run: fresh history
    // fanOutSmallScan: zArranged runs THREE passes over its input (the
    // min/max stats aggregate, the range-partitioner sample, the range
    // shuffle write) and a single-row-group orders scan serializes all
    // three on one task (r21 StageProbe: 0.35 + 0.48 s 1-task stages
    // ahead of the 8-task z write). Size-dispatched — identity at
    // warehouse scale where the scan already splits. File contents may
    // regroup across the 8 z-chunks (range bounds are sample-derived);
    // both load keys aggregate over ALL committed rows, so the oracle
    // hash is placement-invariant.
    Layout.commitSnapshot(s, table,
      Layout.zArranged(graft.Tables.fanOutSmallScan(estab(s, d)),
        "id_municipio", "id_cnae",
        files = 8, buckets = 64),
      statsColumns = Seq("id_municipio", "id_cnae"))
    val m = loadMarker(s, d)
    m.getParentFile.mkdirs()
    m.createNewFile()
    table
  }

  /** The QUERY path's warehouse handle: build once, reuse thereafter
    * (marker-guarded, like the scale probe's `_REPLICA_DONE`) — so
    * `q_cnpj_flagship` measures the query over the existing table, the
    * phase split the reference itself uses (load+index `:167-182`, then
    * `export_select` queries `:185-188`). */
  private def estabSnapshot(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Layout
    val table = estabTable(s, d)
    if (!loadMarker(s, d).exists()) buildEstabWarehouse(s, d)
    Layout.readSnapshotWhere(s, table, Seq(
      Layout.SkipIn("id_municipio", Flagship.municipios.map(_.toLong)),
      Layout.SkipIn("id_cnae", Flagship.cnaes)))
  }

  /** Oracle-checked load key: after the commit, the aggregates are read
    * BACK from the manifest table (the committed bytes, not the input
    * frame), so the hash compare proves load fidelity end-to-end. */
  def qCnpjLoad(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Layout
    val table = buildEstabWarehouse(s, d)
    Layout.readSnapshot(s, table).agg(
      count(lit(1)).as("n_estab"),
      countDistinct(col("cnpj_basico")).as("n_empresas"),
      sum(col("id_cnae")).as("sum_cnae"),
      sum(col("id_municipio")).as("sum_municipio"),
      sum(col("id_situacao_cadastral")).as("sum_situacao"))
  }

  def qCnpjFlagship(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cnaeDim = cnaeIds.toDF("id_cnae")
      .select(col("id_cnae"),
        concat(lit("cnae_"), col("id_cnae").cast("string"))
          .as("descricao_cnae"))
    val munDim = munIds.toDF("id_municipio")
      .select(col("id_municipio"),
        concat(lit("municipio_"), col("id_municipio").cast("string"))
          .as("nome_municipio"))
    val motDim = (0L to 8L).toDF("id_situacao_cadastral")
      .select(col("id_situacao_cadastral"),
        concat(lit("situacao_"), col("id_situacao_cadastral").cast("string"))
          .as("descricao_situacao_cadastral"))
    Flagship.query(estabSnapshot(s, d), cnaeDim, empresas(s, d), munDim,
        motDim)
      .orderBy("cnpj_basico", "numero")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cnpj_flagship" -> qCnpjFlagship _,
    "q_cnpj_load" -> qCnpjLoad _,
  )

  /** The estab construction as a DuckDB CTE — shared by both oracles. */
  private def estabCte: String =
    s"""SELECT o_custkey AS cnpj_basico,
       |    [${cnaeIds.mkString(", ")}]
       |      [CAST(o_orderkey % 5 AS INTEGER) + 1] AS id_cnae,
       |    [${munIds.mkString(", ")}]
       |      [CAST(o_orderkey % 4 AS INTEGER) + 1] AS id_municipio,
       |    o_orderkey % 9 AS id_situacao_cadastral
       |  FROM orders""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_cnpj_load" ->
      s"""WITH estab AS ($estabCte)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_estab,
         |  CAST(COUNT(DISTINCT cnpj_basico) AS BIGINT) AS n_empresas,
         |  CAST(SUM(id_cnae) AS BIGINT) AS sum_cnae,
         |  CAST(SUM(id_municipio) AS BIGINT) AS sum_municipio,
         |  CAST(SUM(id_situacao_cadastral) AS BIGINT) AS sum_situacao
         |FROM estab""".stripMargin,
    "q_cnpj_flagship" ->
      s"""WITH estab AS (
         |  SELECT o_custkey AS cnpj_basico,
         |    'fant_' || CAST(o_orderkey % 1000 AS VARCHAR) AS nome_fantasia,
         |    [${cnaeIds.mkString(", ")}]
         |      [CAST(o_orderkey % 5 AS INTEGER) + 1] AS id_cnae,
         |    [${munIds.mkString(", ")}]
         |      [CAST(o_orderkey % 4 AS INTEGER) + 1] AS id_municipio,
         |    o_orderkey % 9 AS id_situacao_cadastral,
         |    o_orderpriority AS bairro,
         |    o_orderstatus AS tipo_do_logradouro,
         |    'rua_' || CAST(o_orderkey % 50 AS VARCHAR) AS logradouro,
         |    CAST(o_orderkey AS VARCHAR) AS numero,
         |    lpad(CAST(o_orderkey % 100000 AS VARCHAR), 8, '0') AS cep,
         |    '' AS complemento,
         |    CAST(o_orderkey % 90 + 10 AS VARCHAR) AS ddd1,
         |    lpad(CAST(o_orderkey % 10000000 AS VARCHAR), 7, '9')
         |      AS telefone1,
         |    CAST(o_custkey % 90 + 10 AS VARCHAR) AS ddd2,
         |    lpad(CAST(o_custkey % 10000000 AS VARCHAR), 7, '8')
         |      AS telefone2,
         |    'cnpj' || CAST(o_custkey AS VARCHAR) || '@example.com'
         |      AS correio_eletronico,
         |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
         |      AS data_de_inicio_atividade,
         |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
         |      AS data_situacao_cadastro
         |  FROM orders),
         |empresas AS (
         |  SELECT c_custkey AS cnpj_basico, c_name AS razao_social,
         |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
         |      AS capital_social
         |  FROM customer),
         |cnae AS (
         |  SELECT id_cnae, 'cnae_' || CAST(id_cnae AS VARCHAR)
         |    AS descricao_cnae
         |  FROM (SELECT unnest([${cnaeIds.mkString(", ")}]) AS id_cnae)),
         |municipios AS (
         |  SELECT id_municipio,
         |    'municipio_' || CAST(id_municipio AS VARCHAR) AS nome_municipio
         |  FROM (SELECT unnest([${munIds.mkString(", ")}]) AS id_municipio)),
         |motivo AS (
         |  SELECT id_situacao_cadastral, 'situacao_'
         |      || CAST(id_situacao_cadastral AS VARCHAR)
         |      AS descricao_situacao_cadastral
         |  FROM (SELECT unnest(range(0, 9)) AS id_situacao_cadastral))
         |SELECT
         |  e.cnpj_basico, e.nome_fantasia, emp.razao_social,
         |  c.descricao_cnae, e.bairro, m.nome_municipio,
         |  e.tipo_do_logradouro, e.logradouro, e.numero, e.cep,
         |  e.complemento, e.ddd1, e.telefone1, e.ddd2, e.telefone2,
         |  e.correio_eletronico, e.data_de_inicio_atividade,
         |  e.data_situacao_cadastro, emp.capital_social,
         |  mot.descricao_situacao_cadastral
         |FROM estab e
         |JOIN cnae c ON e.id_cnae = c.id_cnae
         |JOIN empresas emp ON emp.cnpj_basico = e.cnpj_basico
         |JOIN municipios m ON m.id_municipio = e.id_municipio
         |JOIN motivo mot
         |  ON mot.id_situacao_cadastral = e.id_situacao_cadastral
         |WHERE e.id_municipio IN (${Flagship.municipios.mkString(", ")})
         |  AND e.id_situacao_cadastral IN (${Flagship.situacoes.mkString(", ")})
         |  AND e.id_cnae IN (${Flagship.cnaes.mkString(", ")})
         |ORDER BY e.cnpj_basico, e.numero""".stripMargin,
  )
}
