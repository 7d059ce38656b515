package graft.functions

import java.math.BigDecimal
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate (SURVEY.md §2.4 X15): exact decimal summation as an
  * `Aggregator[IN, BUF, OUT]`, the Spark-idiomatic replacement for the
  * reference's reliance on SQLite's dynamic-affinity arithmetic
  * (ETLCNPJFinalEmpresaEstabelecimentos.py:118-163 declares NUMERIC columns
  * whose values like "195400,00" stay strings — our engine instead normalizes
  * to DecimalType and aggregates exactly).
  *
  * Exactness = associativity: partial (map-side) and final (reduce-side)
  * merges produce bit-identical results regardless of partitioning, which is
  * what makes the result reproducible on a 1000-executor cluster and
  * hash-comparable against the DuckDB oracle.
  */
object DecimalSumAgg extends Aggregator[BigDecimal, BigDecimal, BigDecimal] {
  override def zero: BigDecimal = BigDecimal.ZERO
  override def reduce(b: BigDecimal, a: BigDecimal): BigDecimal =
    if (a == null) b else b.add(a)
  override def merge(b1: BigDecimal, b2: BigDecimal): BigDecimal = b1.add(b2)
  override def finish(r: BigDecimal): BigDecimal = r
  override def bufferEncoder: Encoder[BigDecimal] = Encoders.DECIMAL
  override def outputEncoder: Encoder[BigDecimal] = Encoders.DECIMAL

  /** Column form: exact decimal sum; input is cast to DECIMAL(38,18). */
  def decimalSum(c: Column): Column =
    udaf(DecimalSumAgg, Encoders.DECIMAL).apply(c.cast("decimal(38,18)"))
}
