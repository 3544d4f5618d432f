package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark extension wiring (SURVEY §7.3 extension point): exposes the
  * custom Catalyst fuzzy-similarity expressions as SQL functions, so
  * `spark.sql("SELECT token_set_ratio(a, b) ...")` works.
  *
  * Use either
  *   `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * at session build time, or `GraftExtensions.install(spark)` on a live
  * session (same registrations, via the session's function registry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => SpatialJoinRule)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans.FuzzyExpressions", null, name, usage, "")

  private def binary(name: String, make: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      info(name, s"$name(a, b) - fuzzy similarity in [0,1]"),
      { children: Seq[Expression] =>
        require(children.length == 2, s"$name expects 2 arguments")
        make(children(0), children(1))
      })

  /** The full registration list, shared by the extensions path and
    * install(). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    binary("token_set_ratio", TokenSetRatio.apply),
    binary("token_sort_ratio", TokenSortRatio.apply),
    binary("partial_ratio", PartialRatio.apply),
    binary("name_similarity", NameSimilarity.apply),
    binary("er_name_similarity", ErNameSimilarity.apply),
    binary("lev_ratio", LevRatio.apply),
    binary("cosine_sim", CosineSim.apply))

  /** Register the same functions + the spatial rewrite into an
    * already-built session. */
  def install(spark: SparkSession): Unit = {
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(SpatialJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SpatialJoinRule
  }
}
