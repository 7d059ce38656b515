package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Strided byte downsample over a binary payload — the RESIZE stand-in
  * for the multimodal stack: a real implementation would box-filter
  * decoded pixels; the plumbing contract (binary in, smaller binary out,
  * deterministic, computed inside the scan stage) is identical, and with
  * the stub codec (payload bytes = "pixels") a stride-2 sample IS a
  * nearest-neighbor 2× downscale. Codegen'd like the other kernels. */
case class ByteStride(child: Expression, stride: Int)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any =
    ByteStride.compute(input.asInstanceOf[Array[Byte]], stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ByteStride$$.MODULE$$.compute($c, $stride)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
  override def prettyName: String = "graft_byte_stride"
}

object ByteStride {

  def compute(bytes: Array[Byte], stride: Int): Array[Byte] = {
    val n = (bytes.length + stride - 1) / stride
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = bytes(i * stride); i += 1 }
    out
  }

  def byteStride(c: Column, stride: Int): Column =
    ColumnBridge.column(ByteStride(ColumnBridge.expression(c), stride))
}
