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
    val exprs =
      uniqueCols.map(c => ("unique", c, count(when(col(c).isNotNull, 1)) -
        countDistinct(col(c)))) ++
      nonNullCols.map(c => ("non_null", c, count(when(col(c).isNull, 1)))) ++
      ranges.map { case (c, (lo, hi)) =>
        ("range", c, count(when(col(c) < lo || col(c) > hi, 1))) }
    require(exprs.nonEmpty, "no constraints given")
    // aliases are index-prefixed so the same (kind, column) pair can be
    // constrained twice (e.g. two ranges) without an ambiguous-column
    // AnalysisException when reading the wide row back
    val aggs = exprs.zipWithIndex.map { case ((chk, c, e), i) =>
      e.as(s"${i}__${chk}__$c")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = wide.columns.map { n =>
      val Array(_, chk, c) = n.split("__", 3)
      struct(lit(chk).as("check"), lit(c).as("column"),
        col(s"`$n`").as("violations"))
    }
    wide.select(explode(array(rows.toSeq: _*)).as("r")).select("r.*")
  }
}
