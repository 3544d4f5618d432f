package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join, Spark-first.
  *
  * `backward` attaches, to each left (probe) row, the right (reference) row
  * with the greatest time <= the probe's time within the same key group;
  * `forward` the smallest time >= the probe's (pandas `merge_asof`
  * direction semantics). The reference repo has no such operator — this is
  * part of the training-data-pipeline extension surface (event attribution,
  * slowly-changing-dimension lookup).
  *
  * Execution shape: instead of a range join (candidate explosion) or a
  * per-key collect (driver/memory bound), both sides are unioned with a
  * probe/quote tag and scanned once under a single `Window` partitioned by
  * the keys and ordered by (time, tag) — `last(payload, ignoreNulls)` over
  * the preceding frame carries the most recent quote to every probe row.
  * That is ONE shuffle on the key columns and a linear per-partition pass,
  * so the plan survives arbitrary time skew and billions of rows per side.
  * (At extreme per-key cardinality, pre-split keys by coarse time chunk and
  * stitch chunk boundaries with the last quote of the previous chunk.)
  *
  * Contract: right rows with a null time never match; left rows with a null
  * time get null payload (enforced explicitly — under the forward
  * direction's descending sort a null-time probe would otherwise sort
  * NULLS LAST with every quote in its prefix and pick up the earliest
  * quote's payload). If several right rows share (keys, time), an
  * arbitrary one wins — pre-aggregate the right side to one row per
  * (keys, time) for deterministic output.
  */
object AsOfJoin {

  /** Most recent right row with rightTime <= leftTime, per key.
    *
    * @param payload (rightColumn, outputName) pairs copied onto each left
    *                row; output names must not collide with left columns.
    * @param within  optional (leftTime, matchedRightTime) => keep predicate;
    *                matches failing it are nulled out (tolerance bound).
    */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[(String, String)],
               within: Option[(Column, Column) => Column] = None): DataFrame =
    asof(left, right, on, leftTime, rightTime, payload, within,
      isForward = false)

  /** Earliest right row with rightTime >= leftTime, per key. */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
              leftTime: String, rightTime: String,
              payload: Seq[(String, String)],
              within: Option[(Column, Column) => Column] = None): DataFrame =
    asof(left, right, on, leftTime, rightTime, payload, within,
      isForward = true)

  private def asof(left: DataFrame, right: DataFrame, on: Seq[String],
                   leftTime: String, rightTime: String,
                   payload: Seq[(String, String)],
                   within: Option[(Column, Column) => Column],
                   isForward: Boolean): DataFrame = {
    val T = "__asof_t"; val TAG = "__asof_tag"; val RT = "__asof_rt"
    val outNames = payload.map(_._2)
    require(outNames.toSet.intersect(left.columns.toSet).isEmpty,
      s"payload output names collide with left columns: " +
        outNames.filter(left.columns.contains).mkString(", "))

    // At equal time the quote must fall inside the probe's frame: backward
    // frames look back, so quotes sort first; forward frames look ahead, so
    // probes sort first.
    val probeTag = if (isForward) 0 else 1
    val quoteTag = 1 - probeTag

    val probe = left
      .withColumn(T, col(leftTime))
      .withColumn(TAG, lit(probeTag))
    val quote = right
      .where(col(rightTime).isNotNull)
      .select((on.map(col) :+ col(rightTime).as(T) :+ col(rightTime).as(RT))
        ++ payload.map { case (src, out) => col(src).as(out) }: _*)
      .withColumn(TAG, lit(quoteTag))

    val unioned = probe.unionByName(quote, allowMissingColumns = true)

    // Both directions run as a RUNNING prefix frame (last ignoreNulls):
    // forward reverses the sort instead of using a [current,
    // unboundedFollowing) frame, which WindowExec evaluates by
    // re-scanning from every row to partition end — O(n^2) per key.
    // The reversed running prefix is the linear form of the same scan;
    // at equal (T, TAG) the tie contract is unchanged (probe frames
    // include equal-time quotes in both directions).
    val frame = (if (isForward)
        Window.partitionBy(on.map(col): _*).orderBy(col(T).desc, col(TAG).desc)
      else Window.partitionBy(on.map(col): _*).orderBy(col(T).asc, col(TAG).asc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def pick(c: String): Column =
      last(col(c), ignoreNulls = true).over(frame)

    val carriedRaw = unioned.select(unioned.columns.map {
      case c if c == RT || outNames.contains(c) => pick(c).as(c)
      case c => col(c)
    }: _*).where(col(TAG) === probeTag)

    // Null-time probes never match (contract): backward's asc NULLS FIRST
    // sort gives them an empty prefix naturally, but forward's desc
    // NULLS LAST sort puts every quote in their prefix — null the carried
    // columns explicitly so both directions honor the contract.
    val carried = (outNames :+ RT).foldLeft(carriedRaw) { (df, out) =>
      df.withColumn(out, when(col(leftTime).isNotNull, col(out)))
    }

    val bounded = within match {
      case None => carried
      case Some(pred) =>
        val keep = pred(col(leftTime), col(RT))
        outNames.foldLeft(carried) { (df, out) =>
          df.withColumn(out, when(keep, col(out)))
        }
    }
    bounded.select(left.columns.map(col) ++ outNames.map(col): _*)
  }
}
