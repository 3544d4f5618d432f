package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checks (the Deequ-shaped surface):
  * uniqueness, completeness, and range constraints evaluated over a frame
  * in ONE aggregation pass — every constraint becomes one aggregate
  * expression inside a single partial-aggregatable `agg`, so a 100 TB
  * table is scanned once regardless of how many checks run, and the
  * result is a tiny (check, column, violations) report. */
object DataChecks {

  /** @param uniqueCols   violations = non-null rows minus distinct values
    *                     (nulls are completeness's concern, not uniqueness's)
    * @param nonNullCols  violations = null rows
    * @param ranges       column -> inclusive [lo, hi]; violations = non-null
    *                     rows outside the interval
    * @return DataFrame(check, column, violations) — one row per constraint */
  def checkReport(df: DataFrame, uniqueCols: Seq[String] = Nil,
                  nonNullCols: Seq[String] = Nil,
                  ranges: Seq[(String, (Double, Double))] = Nil): DataFrame = {
    val aggs =
      uniqueCols.map(c => (count(when(col(c).isNotNull, 1)) -
        countDistinct(col(c))).as(s"unique__$c")) ++
      nonNullCols.map(c =>
        count(when(col(c).isNull, 1)).as(s"non_null__$c")) ++
      ranges.map { case (c, (lo, hi)) =>
        count(when(col(c) < lo || col(c) > hi, 1)).as(s"range__$c") }
    require(aggs.nonEmpty, "no constraints given")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = wide.columns.map { n =>
      val Array(chk, c) = n.split("__", 2)
      struct(lit(chk).as("check"), lit(c).as("column"),
        col(s"`$n`").as("violations"))
    }
    wide.select(explode(array(rows.toSeq: _*)).as("r")).select("r.*")
  }
}
