package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.IntegerType

/** Distributed exact global ranking primitives.
  *
  * SQL `NTILE(n) OVER (ORDER BY ...)` with no PARTITION BY funnels every
  * row through ONE window task — correct at any scale, executable at none.
  * `globalNtile` computes the identical bucket assignment with a
  * range-partitioned sort (Spark's distributed sort machinery, same as
  * `orderBy`) plus one tiny per-partition-count job: global rank = prefix
  * offset of the partition + local position, bucket = the NTILE formula on
  * that rank. Only `numPartitions` counts ever reach the driver.
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

  /** Appends `binCol` = NTILE(`n`) over the global `sortCols` order,
    * computed without a single-partition window. The sort keys must be
    * unique per row (add a tiebreak column) so the global order — and
    * therefore the bucket assignment — is well-defined and deterministic
    * under any partitioning.
    *
    * Plan shape: repartitionByRange + sortWithinPartitions (the same
    * sampled range exchange a global orderBy uses), `localCheckpoint` to
    * pin the partition layout, one count-per-partition job (numPartitions
    * longs to the driver), then a narrow per-partition pass assigning
    * rank = offset + local index. */
  def globalNtile(df: DataFrame, n: Int, sortCols: Seq[Column],
                  binCol: String, numPartitions: Int = 0): DataFrame = {
    require(n > 0)
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()
    val counts = sorted.rdd
      .mapPartitionsWithIndex { (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val out = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row =>
        r += 1
        Row.fromSeq(row.toSeq :+ ntileOf(r, total, n))
      }
    }
    df.sparkSession.createDataFrame(out,
      sorted.schema.add(binCol, IntegerType, nullable = false))
  }
}
