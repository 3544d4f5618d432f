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
  * intervals must satisfy start <= end — malformed rows (end < start) are
  * dropped like nulls, not silently exploded through a descending bucket
  * sequence. Null starts/ends/points never match. One interval of length L
  * still fans out to L/bucketWidth candidate rows — keep bucketWidth near
  * the typical interval length, and cap pathological interval lengths
  * upstream if the domain allows them.
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
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
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

  /** Pairs every left interval with every right interval of the same keys
    * that OVERLAPS it (closed bounds: lStart <= rEnd AND rStart <= lEnd) —
    * the interval x interval sibling of [[intervalPoint]] (session
    * overlap, co-occurrence windows, genomic ranges). Both sides explode
    * to their covered buckets and join as a plain equi-join on
    * (keys :+ bucket); overlapping intervals always share at least one
    * bucket, and each pair is kept ONLY at the first bucket both cover
    * (`max` of the two start buckets) — exactly-once output with no
    * distinct pass over the pair set. The exact overlap predicate is
    * re-checked after the join, so results equal the naive inequality
    * join with the candidate set bounded per bucket. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collide = (left.columns.toSet -- keys)
      .intersect(right.columns.toSet -- keys)
    require(collide.isEmpty,
      s"non-key columns collide across sides: ${collide.mkString(", ")}")
    def bucketOf(c: String) =
      ((col(c).cast("long") - pmod(col(c).cast("long"), lit(bucketWidth))) /
        lit(bucketWidth)).cast("long")
    val B = "__rj_bucket"
    val l = left
      .where(col(leftStart).isNotNull && col(leftEnd).isNotNull &&
        col(leftStart) <= col(leftEnd))
      .withColumn(B,
        explode(sequence(bucketOf(leftStart), bucketOf(leftEnd))))
    val r = right
      .where(col(rightStart).isNotNull && col(rightEnd).isNotNull &&
        col(rightStart) <= col(rightEnd))
      .withColumn(B,
        explode(sequence(bucketOf(rightStart), bucketOf(rightEnd))))
    l.join(r, (keys :+ B).toSeq, "inner")
      .where(col(B) === greatest(bucketOf(leftStart), bucketOf(rightStart)) &&
        col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .drop(B)
  }
}
