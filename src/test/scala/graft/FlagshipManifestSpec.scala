package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the CNPJ vertical's warehouse integration: the flagship's fact
  * table lands in a graft-manifest table z-clustered on
  * (id_municipio, id_cnae) with bounds recorded for both — the
  * secondary-index slot of the reference's B-tree indexes
  * (`ETLCNPJFinalEmpresaEstabelecimentos.py:178-181`) — and the two
  * selective IN filters of QUERY_FINAL prune whole files at the
  * manifest level. The q_cnpj_flagship ORACLE pins answer equality;
  * this spec pins that the pruning actually happens and that the
  * skipped read set is row-identical to the plain snapshot filter. */
class FlagshipManifestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("flagship IN filters prune manifest files on municipality AND cnae") {
    import ops.Layout._
    // running the key materializes the z-clustered manifest table
    val res = cnpj.FlagshipKey.qCnpjFlagship(spark, sf)
    assert(res.count() > 0)
    val table = cnpj.FlagshipKey.estabTable(spark, sf)
    val munIn = SkipIn("id_municipio",
      cnpj.Flagship.municipios.map(_.toLong))
    val cnaeIn = SkipIn("id_cnae", cnpj.Flagship.cnaes)
    val (kMun, total) = fileSelection(spark, table, Seq(munIn))
    assert(total >= 8 && kMun.size < total,
      s"municipality IN did not prune: kept ${kMun.size} of $total")
    val (kCnae, _) = fileSelection(spark, table, Seq(cnaeIn))
    assert(kCnae.size < total,
      s"cnae IN did not prune: kept ${kCnae.size} of $total")
    // pruning must change the read set, never the rows that survive
    // the full predicate
    val skipped = readSnapshotWhere(spark, table, Seq(munIn, cnaeIn))
      .where(col("id_situacao_cadastral")
        .isin(cnpj.Flagship.situacoes: _*)).count()
    val plain = readSnapshot(spark, table)
      .where(col("id_municipio")
          .isin(cnpj.Flagship.municipios.map(_.toLong): _*) &&
        col("id_cnae").isin(cnpj.Flagship.cnaes: _*) &&
        col("id_situacao_cadastral")
          .isin(cnpj.Flagship.situacoes: _*)).count()
    assert(skipped == plain && plain > 0,
      s"manifest path changed the answer: $skipped vs $plain")
  }
}
