package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Catalyst expressions for vector scoring.
  *
  * Capability mirror of the reference's scoring kernels
  * (reference: src/Pyrope.GarnetServer/Vector/VectorMath.cs;
  * score conventions at Vector/BruteForceVectorIndex.cs:350-356) expressed
  * as native expressions so they stay inside whole-stage codegen: the
  * generated code is a single static call into [[VectorKernels]].
  *
  * Inputs must already be `ARRAY<FLOAT>`; the Column wrappers in
  * [[graft.functions]] insert casts, so no implicit type coercion is needed.
  *
  * Element-null PRECONDITION (documented, deliberately unchecked): the
  * kernels read primitive float slots, so a null ELEMENT scores as 0.0
  * rather than propagating null. Rejecting `containsNull = true`
  * schemas is not an option — parquet-read vector columns are declared
  * nullable even when no null ever occurs — and a per-element null
  * branch would put a test in the hottest loop of every scan for a
  * shape the ingest paths (wire parse, payload decode, fvecs) cannot
  * produce. Library callers constructing vectors with null elements
  * own that contract (NULL whole-vector inputs DO propagate — the
  * expressions are null-safe at the value level).
  */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = ArrayType(FloatType, containsNull = true)
    def accepts(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (accepts(left.dataType) && accepts(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${ok.simpleString} inputs, " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  protected def kernelName: String
  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def kernel(a: ArrayData, b: ArrayData): Double
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.$kernelName($a, $b)")
}

case class VectorDot(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override protected def kernelName: String = "dot"
  override protected def kernel(a: ArrayData, b: ArrayData): Double =
    VectorKernels.dot(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "vector_dot"
}

case class VectorL2Sq(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override protected def kernelName: String = "l2sq"
  override protected def kernel(a: ArrayData, b: ArrayData): Double =
    VectorKernels.l2sq(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "vector_l2sq"
}

case class VectorCosine(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override protected def kernelName: String = "cosine"
  override protected def kernel(a: ArrayData, b: ArrayData): Double =
    VectorKernels.cosine(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "vector_cosine"
}

case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${dt.simpleString}")
  }
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.norm($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "vector_norm"
}
