package graft.cnpj

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pandas/SQLite-compat rendering of the flagship projection (SURVEY.md
  * §1.3 / §7.4.2): reproduces the golden `data/resultado_final.csv`
  * artifacts WITHOUT letting them into the engine — the warehouse stays
  * canonically typed; this is a presentation-layer projection applied only
  * at export time.
  *
  * The artifacts, and where they come from in the reference
  * (ETLCNPJFinalEmpresaEstabelecimentos.py:186-188):
  *
  *   - SQLite NUMERIC affinity converts digit-string cells of
  *     NUMERIC-declared columns (numero, ddd*, telefone* — DDL :147-157)
  *     to INTEGER at insert, which also strips leading zeros.
  *   - `pd.read_sql_query` then types each COLUMN from its cells:
  *     all-int+no-NULL → int64 ("11"); all-int+some-NULL → float64
  *     ("11.0", the golden row-2 artifact); any TEXT cell → object
  *     (ints render "11", text passes through).
  *   - `capital_social` never parses as a number (decimal comma) → TEXT,
  *     so the golden file shows "195400,00".
  *   - `nome_municipio` keeps its fixed-width padding (no trim anywhere).
  *
  * Scale posture: the per-column dtype decision needs two boolean facts
  * per column (any-text? any-null?) — ONE aggregate pass over the result
  * producing a 1-row flag table, broadcast back with a crossJoin. No
  * per-row driver logic, no second scan per column.
  */
object PandasCompat {

  /** Flagship output columns that the reference DDL declares NUMERIC and
    * therefore pick up affinity typing (:147, :153-156). */
  private val affinityCols = Seq("numero", "ddd1", "telefone1", "ddd2",
    "telefone2")

  private def isIntText(c: Column): Column = c.rlike("^[0-9]+$")

  /** Render one affinity column per the pandas dtype rules, given the
    * column-level flags. */
  private def render(c: Column, hasText: Column, hasNull: Column): Column = {
    val asInt = c.cast("long").cast("string") // affinity int: zeros stripped
    val asFloat = concat(asInt, lit(".0")) // float64 repr
    when(c.isNull, lit(null))
      .when(!isIntText(c), c) // TEXT cell passes through (object dtype)
      .when(hasText, asInt) // object dtype: int cells render bare
      .when(hasNull, asFloat) // float64: NaN forced widening
      .otherwise(asInt) // int64
  }

  /** Apply the compat projection to a flagship result (Flagship.outputCols
    * schema, canonical types). Output: all columns rendered exactly as the
    * reference's pandas `to_csv` would. */
  def apply(result: DataFrame): DataFrame = {
    val flagExprs = affinityCols.flatMap { n =>
      Seq(
        max(when(col(n).isNotNull && !isIntText(col(n)), true)
          .otherwise(false)).as(s"${n}_has_text"),
        max(when(col(n).isNull, true).otherwise(false))
          .as(s"${n}_has_null"))
    }
    val flags = result.agg(flagExprs.head, flagExprs.tail: _*)
    val withFlags = result.crossJoin(broadcast(flags))
    val cols = Flagship.outputCols.map {
      case n if affinityCols.contains(n) =>
        render(col(n), col(s"${n}_has_text"), col(s"${n}_has_null")).as(n)
      case "capital_social" =>
        // DECIMAL(18,2) back to the Brazilian comma form SQLite kept as TEXT
        regexp_replace(col("capital_social").cast("string"), "\\.", ",")
          .as("capital_social")
      case n => col(n)
    }
    withFlags.select(cols: _*)
  }
}
