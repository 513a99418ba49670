package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** Column bindings for the NPY codec: decode a `binary` artifact column
  * into (shape, flat float64 data), and encode array columns back to NPY
  * bytes — the bridge between the reference's on-disk artifacts (§1.3)
  * and the engine's array columns. */
case class NpyDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("shape", ArrayType(IntegerType, containsNull = false)),
    StructField("data", ArrayType(DoubleType, containsNull = false))))
  override def prettyName: String = "npy_decode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"npy_decode needs binary, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = Npy.read(input.asInstanceOf[Array[Byte]])
    InternalRow(new GenericArrayData(arr.shape),
      new GenericArrayData(arr.data))
  }
  override protected def withNewChildInternal(newChild: Expression): NpyDecode =
    copy(child = newChild)
}

/** Encode an array<double> (1-D) into NPY v1.0 bytes. */
case class NpyEncode1D(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "npy_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"npy_encode needs array<double>, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData].toDoubleArray()
    Npy.writeF8(Array(xs.length), xs)
  }
  override protected def withNewChildInternal(newChild: Expression): NpyEncode1D =
    copy(child = newChild)
}

object NpyColumns {
  def npy_decode(c: Column): Column = ExprBridge.column(NpyDecode(ExprBridge.expression(c)))
  def npy_encode(c: Column): Column = ExprBridge.column(NpyEncode1D(ExprBridge.expression(c)))
}
