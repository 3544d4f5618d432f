package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static vector kernels invoked by both the interpreted and generated
  * paths of [[CosineSim]]. Operating on Catalyst [[ArrayData]] directly
  * skips the UDF's encoder round-trip (UnsafeArrayData -> Seq[Float] ->
  * boxed result): the generated Java reads the packed primitives in
  * place. Arithmetic is IDENTICAL to `Similarity.cosineKernel` —
  * sequential double folds, zero-norm guard — so swapping the
  * implementation cannot move a hash-checked result. Element nulls are
  * outside the contract (embedding vectors are dense); null ARRAYS are
  * handled by the expression's null-safe wrapper. */
object VectorKernels {
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData,
             bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val sa = math.sqrt(na)
    val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
  }
}

/** Codegen'd cosine similarity over two float/double array columns —
  * the ANN hot loop as a native Catalyst expression (the
  * [[FuzzySimilarityExpression]] discipline applied to vectors): no
  * serialization boundary, participates in whole-stage codegen, and the
  * per-side element type is resolved at PLAN time so the inner loop has
  * no per-element dispatch beyond a constant boolean. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def floatSide(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"cosineSim needs array<float|double> operands, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], floatSide(left),
      b.asInstanceOf[ArrayData], floatSide(right))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.plans.VectorKernels.cosine(
         |  $a, ${floatSide(left)}, $b, ${floatSide(right)});""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression) =
    copy(left = l, right = r)
}

object VectorExpressions {
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
