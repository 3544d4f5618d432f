package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Explicit bloom-filter semi-join pruning — the pattern Catalyst's
  * runtime-filter injection applies opportunistically, exposed as a
  * library operator the caller controls.
  *
  * Why it matters at 100 TB: an exact semi join ships EVERY fact row into
  * the join shuffle; a broadcast semi join needs the full distinct key set
  * on every executor. When the dim's key set is too large to broadcast
  * exactly but a compact sketch fits (100M keys ≈ tens of MB of bloom
  * bits), the bloom filter drops the vast majority of non-matching fact
  * rows BEFORE the shuffle, and the exact semi join afterwards touches
  * only survivors. False positives cost nothing but a little shuffle
  * (the exact join removes them); false negatives cannot happen, so the
  * result is exactly the plain semi join's.
  *
  * Both sides hash through Catalyst's `XxHash64`, the same scheme Spark's
  * own `InjectRuntimeFilter` uses; the filter is a native codegen
  * expression (`might_contain`), not a UDF. The driver holds only the
  * fixed-size sketch (like the k-means model — SCALE.md "no driver-side
  * data" rule).
  */
object Prune {

  /** Build the bloom sketch of a key column as one compact binary. */
  def bloomOf(keys: DataFrame, keyCol: String, expectedKeys: Long,
              numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftColumnBridge.expression(col(keyCol)))),
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression()
    keys.select(GraftColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a driver-held bloom sketch. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloom), new XxHash64(Seq(GraftColumnBridge.expression(key)))))

  /** EXACT semi join of `fact` against `dimKeys`, bloom-pruned before the
    * shuffle. `expectedKeys`/`numBits` size the sketch (fpp ≈
    * exp(-numBits/expectedKeys · ln2²)); an undersized sketch only costs
    * extra survivors, never correctness. */
  def bloomSemiJoin(fact: DataFrame, factKey: String, dimKeys: DataFrame,
                    dimKey: String, expectedKeys: Long = 1L << 20,
                    numBits: Long = 1L << 23): DataFrame = {
    val bf = bloomOf(dimKeys, dimKey, expectedKeys, numBits)
    if (bf == null) return fact.where(lit(false)) // empty dim: no matches
    fact.where(mightContain(bf, col(factKey)))
      .join(dimKeys.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }
}
