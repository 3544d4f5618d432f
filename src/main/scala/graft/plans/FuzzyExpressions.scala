package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the fuzzy-similarity kernel (SURVEY
  * §7.3's "promote hot UDFs to codegen-friendly Expressions"): unlike a
  * Scala UDF there is no serialization/encoder boundary and the call
  * participates in whole-stage codegen — the generated Java invokes the
  * static JVM kernel directly on the decoded operands.
  */
abstract class FuzzySimilarityExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Fully-qualified static kernel, e.g.
    * "graft.functions.TextFunctions.tokenSetRatio". */
  protected def kernel: String

  protected def compute(a: String, b: String): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $kernel($a.toString(), $b.toString());")
}

case class TokenSetRatio(left: Expression, right: Expression)
    extends FuzzySimilarityExpression {
  override protected def kernel = "graft.functions.TextFunctions.tokenSetRatio"
  override protected def compute(a: String, b: String): Double =
    graft.functions.TextFunctions.tokenSetRatio(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class TokenSortRatio(left: Expression, right: Expression)
    extends FuzzySimilarityExpression {
  override protected def kernel = "graft.functions.TextFunctions.tokenSortRatio"
  override protected def compute(a: String, b: String): Double =
    graft.functions.TextFunctions.tokenSortRatio(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class NameSimilarity(left: Expression, right: Expression)
    extends FuzzySimilarityExpression {
  override protected def kernel = "graft.functions.TextFunctions.nameSimilarity"
  override protected def compute(a: String, b: String): Double =
    graft.functions.TextFunctions.nameSimilarity(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 1 - levenshtein/maxlen via the bit-parallel Myers kernel — value-
  * identical to the built-in levenshtein-based column form, much cheaper
  * per pair on blocked fuzzy joins. */
case class LevRatio(left: Expression, right: Expression)
    extends FuzzySimilarityExpression {
  override protected def kernel = "graft.functions.TextFunctions.levRatio"
  override protected def compute(a: String, b: String): Double =
    graft.functions.TextFunctions.levRatio(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class PartialRatio(left: Expression, right: Expression)
    extends FuzzySimilarityExpression {
  override protected def kernel = "graft.functions.TextFunctions.partialRatio"
  override protected def compute(a: String, b: String): Double =
    graft.functions.TextFunctions.partialRatio(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** The ER matcher's similarity blend (reference `etl/er.py:92-100`):
  * max(token_set, token_sort, partial) over `_norm`ed strings. */
case class ErNameSimilarity(left: Expression, right: Expression)
    extends FuzzySimilarityExpression {
  override protected def kernel = "graft.functions.TextFunctions.erNameSimilarity"
  override protected def compute(a: String, b: String): Double =
    graft.functions.TextFunctions.erNameSimilarity(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Column constructors for the codegen'd fuzzy expressions. */
object FuzzyExpressions {
  def tokenSetRatio(a: Column, b: Column): Column =
    GraftColumnBridge.column(TokenSetRatio(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def tokenSortRatio(a: Column, b: Column): Column =
    GraftColumnBridge.column(TokenSortRatio(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def nameSimilarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(NameSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def partialRatio(a: Column, b: Column): Column =
    GraftColumnBridge.column(PartialRatio(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def levRatio(a: Column, b: Column): Column =
    GraftColumnBridge.column(LevRatio(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def erNameSimilarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(ErNameSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
