package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval × point range join via epoch bucketing, Spark-first.
  *
  * A raw range predicate (`point BETWEEN start AND end`) next to an equi key
  * plans as a sort-merge join on the key with a per-key quadratic filter —
  * fine for tiny key groups, hopeless when one key holds millions of rows.
  * This operator turns the range into an equi-join: both sides get a bucket
  * id `floor(value / width)`, each interval explodes to the buckets it
  * covers (`len/width + 1` rows), and the join runs as a plain shuffled
  * hash/sort-merge equi-join on (keys :+ bucket) that AQE can skew-split.
  * The exact range predicate is re-checked after the join, so results are
  * identical to the naive join while the candidate set per probe row is
  * bounded by the bucket population instead of the key population.
  *
  * Pick `bucketWidth` near the typical interval length: duplication factor
  * is `ceil(len/width) + 1` per interval, and candidate precision falls off
  * as buckets get wider than intervals.
  *
  * Contract: range columns must be integral (epoch micros, keys, offsets);
  * intervals must satisfy start <= end; null starts/ends/points never match.
  */
object RangeJoin {

  /** Pairs every interval row with every point row of the same keys whose
    * `pointCol` lies inside [startCol, endCol) (bounds configurable).
    * Output = interval columns ++ point columns (minus the join keys, which
    * appear once); non-key column names must be disjoint across sides. */
  def intervalPoint(intervals: DataFrame, points: DataFrame,
                    keys: Seq[String], startCol: String, endCol: String,
                    pointCol: String, bucketWidth: Long,
                    closedStart: Boolean = true,
                    closedEnd: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = (intervals.columns.toSet -- keys)
      .intersect(points.columns.toSet -- keys)
    require(overlap.isEmpty,
      s"non-key columns collide across sides: ${overlap.mkString(", ")}")

    // Exact floor-division for longs: subtract the positive mod before
    // dividing so the double division is over an exact multiple of the
    // width (a plain floor(col / W) can misbucket values divisible by W
    // through double rounding).
    def bucketOf(c: String) =
      ((col(c).cast("long") - pmod(col(c).cast("long"), lit(bucketWidth))) /
        lit(bucketWidth)).cast("long")

    val B = "__rj_bucket"
    val iv = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn(B, explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    val pt = points
      .where(col(pointCol).isNotNull)
      .withColumn(B, bucketOf(pointCol))

    val lo = if (closedStart) col(pointCol) >= col(startCol)
             else col(pointCol) > col(startCol)
    val hi = if (closedEnd) col(pointCol) <= col(endCol)
             else col(pointCol) < col(endCol)
    iv.join(pt, (keys :+ B).toSeq, "inner").where(lo && hi).drop(B)
  }
}
