package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Catalyst-expression builders mirroring GeoFunctions (which builds
  * Column/ColumnNode trees that only the analyzer can resolve; inside an
  * optimizer rule the trees must be resolved Catalyst nodes directly). */
private object GeoExpr {
  private def lit(d: Double) = Literal(d)

  /** haversine(lat1,lon1,lat2,lon2) <= radius — same op structure as
    * GeoFunctions.haversineM so results are identical. */
  def withinExpr(lat1: Expression, lon1: Expression, lat2: Expression,
                 lon2: Expression, radius: Expression): Expression = {
    val dLat2 = Divide(Subtract(ToRadians(lat2), ToRadians(lat1)), lit(2.0))
    val dLon2 = Divide(Subtract(ToRadians(lon2), ToRadians(lon1)), lit(2.0))
    val a = Add(
      Pow(Sin(dLat2), lit(2.0)),
      Multiply(Multiply(Cos(ToRadians(lat1)), Cos(ToRadians(lat2))),
        Pow(Sin(dLon2), lit(2.0))))
    LessThanOrEqual(
      Multiply(Multiply(Asin(Sqrt(a)), lit(2.0)), lit(6371000.0)), radius)
  }

  private def axisIdx(c: Expression, cellDeg: Double): Expression =
    Add(Floor(Divide(c, lit(cellDeg))), Literal(1800000L))

  /** Home-cell key — same encoding as GeoFunctions.cellKey. */
  def cellKey(lat: Expression, lon: Expression, cellDeg: Double): Expression =
    Add(Multiply(axisIdx(lat, cellDeg), Literal(4000000L)),
      axisIdx(lon, cellDeg))

  /** 3x3 neighborhood keys — same as GeoFunctions.neighborCellKeys. */
  def neighborCells(lat: Expression, lon: Expression,
                    cellDeg: Double): Expression = {
    val cy = axisIdx(lat, cellDeg)
    val cx = axisIdx(lon, cellDeg)
    CreateArray(for (dy <- -1 to 1; dx <- -1 to 1) yield
      Add(Multiply(Add(cy, Literal(dy.toLong)), Literal(4000000L)),
        Add(cx, Literal(dx.toLong))))
  }
}

/** The auto grid-join rewrite (SURVEY §4 "optional custom physical piece"):
  * a `WithinMeters(lat1, lon1, lat2, lon2, radius)` predicate in an inner
  * join condition is detected by [[SpatialJoinRule]] and the join is
  * rewritten into a grid-blocked EQUI-join — one side exploded over its 3x3
  * neighbor cells, the other keyed by its home cell — so Catalyst plans a
  * shuffle hash/sort-merge join instead of a cartesian product, with the
  * exact haversine predicate retained as a post-join filter.
  *
  * Registered through `GraftExtensions` (injectOptimizerRule /
  * experimental.extraOptimizations).
  */
case class WithinMeters(lat1: Expression, lon1: Expression,
                        lat2: Expression, lon2: Expression,
                        radius: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(lat1, lon1, lat2, lon2, radius)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override lazy val deterministic: Boolean = true

  /** The exact predicate this marker stands for. */
  lazy val exact: Expression = GeoExpr.withinExpr(lat1, lon1, lat2, lon2, radius)

  override def eval(input: InternalRow): Any = exact.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = exact.genCode(ctx)
    ev.copy(code = code.code, isNull = code.isNull, value = code.value)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lat1 = newChildren(0), lon1 = newChildren(1), lat2 = newChildren(2),
      lon2 = newChildren(3), radius = newChildren(4))
}

object WithinMeters {
  /** Column-API constructor: use in join conditions; the optimizer rule
    * turns the join into a grid-blocked equi-join automatically. */
  def apply(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
            radiusM: Double): Column =
    GraftColumnBridge.column(WithinMeters(
      GraftColumnBridge.expression(lat1), GraftColumnBridge.expression(lon1),
      GraftColumnBridge.expression(lat2), GraftColumnBridge.expression(lon2),
      Literal(radiusM)))
}

/** Optimizer rule: Join(..., Inner, cond containing WithinMeters) where the
  * marker's first point resolves from one side and the second from the
  * other -> grid-blocked equi-join. Cell size is chosen from the radius. */
object SpatialJoinRule extends Rule[LogicalPlan] {

  /** Longitude degrees shrink by cos(lat), so a cell chosen from the radius
    * alone silently drops matching pairs at high latitudes (0.01 deg covers
    * 400 m of longitude only below |lat|=69). The rule fires automatically
    * with no sight of the data, so it must be latitude-safe by
    * construction: pick the smallest decade cell whose GUARANTEED coverage
    * `0.25 * cellDeg * 111320 m` exceeds the radius — the 3x3 neighborhood
    * is then complete wherever cos(lat) >= 0.25, i.e. |lat| <= 75.5 deg,
    * beyond every populated place. Larger radii return None and the join is
    * left as the (correct) cartesian rather than silently losing pairs. */
  private def cellDegFor(radiusM: Double): Option[Double] =
    Seq(0.001, 0.01, 0.1, 1.0).find(c => radiusM <= 0.25 * c * 111320.0)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      conjuncts.collectFirst {
        case wm: WithinMeters
            if wm.lat1.references.subsetOf(left.outputSet) &&
              wm.lon1.references.subsetOf(left.outputSet) &&
              wm.lat2.references.subsetOf(right.outputSet) &&
              wm.lon2.references.subsetOf(right.outputSet) &&
              wm.radius.isInstanceOf[Literal] => wm
      } match {
        case Some(wm) if cellDegFor(
            wm.radius.asInstanceOf[Literal].value.toString.toDouble).isDefined =>
          val radius = wm.radius.asInstanceOf[Literal].value.toString.toDouble
          val cellDeg = cellDegFor(radius).get
          // left side: explode over the 3x3 neighborhood
          val lCell = AttributeReference("__graft_cell_l", LongType,
            nullable = true)()
          val gen = Generate(
            Explode(GeoExpr.neighborCells(wm.lat1, wm.lon1, cellDeg)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(lCell), child = left)
          // right side: home cell
          val rCellAlias = Alias(
            GeoExpr.cellKey(wm.lat2, wm.lon2, cellDeg), "__graft_cell_r")()
          val proj = Project(right.output :+ rCellAlias, right)
          val newCond = (EqualTo(lCell, rCellAlias.toAttribute) +:
            conjuncts.map(c => if (c eq wm) wm.exact else c)).reduce(And)
          Project(j.output, Join(gen, proj, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
