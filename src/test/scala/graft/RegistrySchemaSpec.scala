package graft

import org.apache.spark.sql.types._

/** Registry-wide harness compatibility gate.
  *
  * The driver's correctness harness canonicalizes every registry output by
  * sorting rows with pandas `sort_values` over ALL columns — which throws
  * (`unhashable type: numpy.ndarray`) on array/map/struct columns. The
  * round-11 `dq_quarantine` row was red for exactly this reason despite a
  * correct answer. This spec makes the contract explicit: every registry
  * row's TOP-LEVEL output columns must be harness-sortable scalar types.
  *
  * Operators are free to produce nested payloads internally (and several
  * do — `DataChecks.quarantine` keeps its `failed` array for routing); the
  * REGISTRY projection of the row is what must be scalar.
  *
  * Schema resolution only analyzes the plan — no job runs for the plain
  * declarative queries — but queries with construction-time driver work
  * (model fits, standing-index builds) do run it, so this spec doubles as
  * a "registry rows construct cleanly at sf0.001" smoke check.
  */
class RegistrySchemaSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def sortable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | _: BinaryType => false
    case _ => true
  }

  test("registry names are unique — a duplicate silently shadows an " +
    "older row (the map keeps the last entry)") {
    val names = SparkEntry.registryNames
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate registry names: ${dups.mkString(", ")}")
  }

  test("every registry row emits only harness-sortable scalar columns") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, dir).schema
        val offending = schema.fields.filterNot(f => sortable(f.dataType))
        if (offending.isEmpty) None
        else Some(s"$name: ${offending.map(f =>
          s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(bad.isEmpty,
      s"non-scalar registry output columns (harness cannot sort these):\n" +
        bad.mkString("\n"))
  }
}
