package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Distributed exact global ranking primitives.
  *
  * SQL `NTILE(n) OVER (ORDER BY ...)` — or `ROW_NUMBER()` — with no
  * PARTITION BY funnels every row through ONE window task: correct at any
  * scale, executable at none. These primitives compute the identical
  * assignments with a range-partitioned sort (Spark's distributed sort
  * machinery, same as `orderBy`) plus one tiny per-partition-count job:
  * global rank = prefix offset of the partition + local position. Only
  * `numPartitions` counts ever reach the driver.
  */
object Ranking {

  /** SQL NTILE bucket for 1-based rank `r` of `total` rows in `n` buckets:
    * the first `total % n` buckets take `total / n + 1` rows each, the
    * rest take `total / n`. */
  def ntileOf(r: Long, total: Long, n: Int): Int = {
    require(r >= 1 && r <= total)
    val q = total / n
    val rem = total % n
    val headSpan = rem * (q + 1)
    if (r <= headSpan) ((r - 1) / (q + 1)).toInt + 1
    else rem.toInt + ((r - 1 - headSpan) / q).toInt + 1
  }

  /** Shared machinery: range-partition + in-partition sort, pin the layout
    * with `localCheckpoint`, count each partition (numPartitions longs to
    * the driver), and return the pinned frame with its prefix offsets. */
  private def rangeSorted(df: DataFrame, sortCols: Seq[Column],
                          numPartitions: Int): (DataFrame, Array[Long]) = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()
    val counts = sorted.rdd
      .mapPartitionsWithIndex { (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    (sorted, counts.scanLeft(0L)(_ + _))
  }

  private def appendRanked(sorted: DataFrame, offsets: Array[Long],
                           schema: StructType)(f: Long => Any): DataFrame = {
    val out = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row =>
        r += 1
        Row.fromSeq(row.toSeq :+ f(r))
      }
    }
    sorted.sparkSession.createDataFrame(out, schema)
  }

  /** Appends `rankCol` = ROW_NUMBER() (1-based, LongType) over the global
    * `sortCols` order, with no single-partition window. The sort keys must
    * be unique per row (add a tiebreak column) so the global order — and
    * therefore the rank — is well-defined and deterministic under any
    * partitioning. */
  def globalRank(df: DataFrame, sortCols: Seq[Column], rankCol: String,
                 numPartitions: Int = 0): DataFrame = {
    val (sorted, offsets) = rangeSorted(df, sortCols, numPartitions)
    appendRanked(sorted, offsets,
      sorted.schema.add(rankCol, LongType, nullable = false))(identity)
  }

  /** Appends `binCol` = NTILE(`n`) over the global `sortCols` order,
    * computed without a single-partition window. Same unique-sort-key
    * contract as [[globalRank]]. */
  def globalNtile(df: DataFrame, n: Int, sortCols: Seq[Column],
                  binCol: String, numPartitions: Int = 0): DataFrame = {
    require(n > 0)
    val (sorted, offsets) = rangeSorted(df, sortCols, numPartitions)
    val total = offsets.last
    appendRanked(sorted, offsets,
      sorted.schema.add(binCol, IntegerType, nullable = false))(
      r => ntileOf(r, total, n))
  }
}
