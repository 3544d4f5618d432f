package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: how rows are PLACED decides how much a
  * 100 TB scan can skip. Parquet scans prune at two granularities — file
  * (footer min/max) and row group — and both only bite when the writer
  * clustered related rows together.
  *
  * A single-column sort clusters one dimension perfectly and scatters
  * every other; Z-ordering interleaves the bits of several dimensions so
  * a small box in ANY of them touches a small fraction of files. This is
  * the standard lakehouse technique (Delta/Iceberg `OPTIMIZE ZORDER BY`)
  * re-expressed with plain Spark: a codegen'd bit-interleave expression,
  * one range exchange, a within-partition sort, and a parquet write —
  * no custom writer, no driver-side data beyond the per-column domain
  * bounds (two doubles each).
  */
object Layout {

  /** Morton (Z-curve) key: each column is scaled to a `bitsPerCol`-bit
    * integer rank over [lo, hi], then ranks are bit-interleaved
    * (column 0 owns bit positions 0, n, 2n, …). Pure shift/mask builtin
    * arithmetic — stays inside whole-stage codegen. */
  def zValue(cols: Seq[(Column, Double, Double)], bitsPerCol: Int = 16): Column = {
    require(cols.nonEmpty && cols.size * bitsPerCol <= 62,
      s"${cols.size} cols x $bitsPerCol bits exceeds a long")
    val n = cols.size
    val maxRank = (1L << bitsPerCol) - 1
    val ranks = cols.map { case (c, lo, hi) =>
      require(hi > lo, s"degenerate domain [$lo, $hi]")
      // clamp into the domain, scale to [0, maxRank]
      val unit = (least(greatest(c.cast("double"), lit(lo)), lit(hi)) - lo) /
        (hi - lo)
      least(floor(unit * (maxRank + 1)).cast("long"), lit(maxRank))
    }
    val terms = for {
      (rank, ci) <- ranks.zipWithIndex
      j <- 0 until bitsPerCol
    } yield shiftleft(shiftright(rank, j).bitwiseAND(1L), j * n + ci)
    terms.reduce(_ + _)
  }

  /** Rewrite `df` as `numFiles` parquet files clustered on the Z-curve of
    * `dims` (column name, domain lo, domain hi). One range exchange (the
    * same sampled partitioner a global orderBy uses) + local sort; the
    * z key never reaches the files. */
  def zorderWrite(df: DataFrame, dims: Seq[(String, Double, Double)],
                  outDir: String, numFiles: Int,
                  bitsPerCol: Int = 16): Unit = {
    val z = zValue(dims.map { case (c, lo, hi) => (col(c), lo, hi) }, bitsPerCol)
    df.withColumn("_graft_z", z)
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.mode("overwrite").parquet(outDir)
  }
}
