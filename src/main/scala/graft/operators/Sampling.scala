package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixing for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the selected set changes
  * with partitioning, retries, and cluster size — unacceptable when a
  * corpus must be reproducible. These operators decide membership from a
  * seeded md5 hash of the ROW KEY alone, so the same row makes the same
  * cut on any cluster, any partitioning, any engine (the DuckDB oracle
  * replays the identical arithmetic), and the op is a codegen'd filter —
  * no RNG state, no shuffle.
  */
object Sampling {

  private val Denom = 1000000L

  /** Keep-this-row predicate: md5-derived uniform in [0, 1) < fraction.
    * Deterministic in (key, seed); independent draws need distinct seeds. */
  def keyedCut(keyCol: Column, fraction: Double, seed: Int): Column =
    pmod(Dedup.md5Hash32(keyCol.cast("string"), lit(seed)), lit(Denom)) <
      lit((fraction * Denom).toLong)

  /** Deterministic uniform sample of `fraction` of the rows. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          seed: Int = 0): DataFrame =
    df.where(keyedCut(col(keyCol), fraction, seed))

  /** Dataset mixing: per-stratum sampling fractions (e.g. source/language
    * weights when composing a training corpus). Strata absent from
    * `fractions` are dropped — the mix IS the contract. */
  def mixBySource(df: DataFrame, keyCol: String, stratumCol: String,
                  fractions: Map[String, Double], seed: Int = 0): DataFrame = {
    // integer cut points ((f * 1e6).toLong), NOT a double compare: a float
    // boundary like 0.1 * 1e6 = 100000.0000...1 would admit the exact
    // boundary hash 1-in-a-million times and diverge from any integer
    // replay of the same arithmetic
    val cut = fractions.foldLeft(lit(-1L)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit((f * Denom).toLong)).otherwise(acc)
    }
    df.where(pmod(Dedup.md5Hash32(col(keyCol).cast("string"), lit(seed)),
      lit(Denom)) < cut)
  }
}
