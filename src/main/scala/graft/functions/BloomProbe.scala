package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] — the map-side prefilter
  * of the Bloom-decontamination scale path (`q_bloom_decontaminate`,
  * ops/Curation.scala) as a native Catalyst expression instead of a
  * Scala UDF. Spark's own `might_contain` expression exists for exactly
  * this but is internal-only (Catalyst-injected runtime filters), so the
  * public shape is rebuilt here the same way: the filter bytes ride the
  * plan as a binary literal (a few MB regardless of the eval-corpus
  * size — the point of the sketch), each task deserializes once
  * lazily, and the probe compiles into the enclosing
  * WholeStageCodegen span as a single virtual call — no
  * row-at-a-time Scala-lambda boxing on the 100 TB side of the join
  * (r16 verdict task 6).
  *
  * One-sidedness as ever: a false positive only forwards a non-matching
  * row to the exact verify join, never a wrong answer. */
case class BloomMightContainLong(bloom: Expression, value: Expression)
    extends BinaryExpression with Predicate {

  override def left: Expression = bloom
  override def right: Expression = value

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (bloom.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("bloom side must be BINARY (a serialized " +
          s"BloomFilter), got ${bloom.dataType.sql}")
    else if (value.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"probe side must be BIGINT, got ${value.dataType.sql}")
    else if (!bloom.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("bloom side must be foldable — the filter is " +
          "built once driver-side and shipped as a literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess
  }

  /** Deserialized once per task (the expression tree is serialized with
    * the plan; the lazy val re-materializes executor-side). */
  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bloomBytes: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the materialized filter object goes into the codegen references
    // array (Spark's internal BloomFilterMightContain does the same) —
    // the generated code is one virtual call per row, fused into the
    // enclosing WholeStageCodegen span
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = $bf.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainLong =
    copy(bloom = newLeft, value = newRight)

  override def prettyName: String = "graft_bloom_might_contain"
}

object BloomMightContainLong {
  /** `mightContain(bf, col)` as a Column: serialize the driver-built
    * filter into a binary literal and wrap the probe expression. */
  def apply(bf: BloomFilter, value: Column): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    ColumnBridge.column(new BloomMightContainLong(
      Literal(out.toByteArray, BinaryType),
      ColumnBridge.expression(value)))
  }
}
