package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-handling primitives (SURVEY §7.4.5 / the brief's "salting
  * for skew" bullet).
  *
  * AQE's runtime skew-join splitting is the first line of defense and needs
  * no code; these operators are for the cases AQE can't fix:
  *  - a broadcast-ineligible join where ONE key holds a double-digit
  *    percentage of the probe side (AQE splits partitions, but a single
  *    hot key still lands its build row in every split's hash table
  *    lookup path) -> [[saltedJoin]] spreads the hot key over
  *    `saltFactor` distinct join keys;
  *  - per-group state that grows with group size (collect_list/distinct
  *    buffers) where map-side combine doesn't bound the final reducer ->
  *    [[saltedDistinctCount]] makes the heavy dedup happen on (key, salt)
  *    groups before the final per-key merge.
  *
  * Both are RESULT-IDENTICAL to their unsalted forms (spec-asserted); the
  * salt only changes the physical distribution.
  */
object Skew {

  /** Join types for which build-side replication is sound: every probe row
    * carries exactly one salt and the build side carries ALL salts per
    * key, so probe-row match/no-match is unchanged. Right/full outer are
    * rejected — an unmatched build row would surface once per salt. */
  private val probeSidedJoins =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  /** Equi-join with the build side replicated over `saltFactor` salts and
    * the probe side salted deterministically — a hot probe key spreads
    * across `saltFactor` shuffle partitions. The salt hashes all probe
    * columns PLUS monotonically_increasing_id, so even byte-identical
    * duplicate probe rows (the worst skew case: one hot key, one hot
    * payload) spread instead of landing on a single salt; the id never
    * reaches the output, so results stay deterministic. Build-side rows
    * multiply by `saltFactor` — use for small-to-medium build sides that
    * exceed the broadcast threshold. Result-identical to
    * `probe.join(build, Seq(key), joinType)`. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(probeSidedJoins.contains(joinType.toLowerCase),
      s"saltedJoin supports probe-sided join types only, got $joinType")
    val salted = probe.withColumn("__salt",
      pmod(abs(hash(probe.columns.map(col) :+
        monotonically_increasing_id(): _*)), lit(saltFactor)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-stage distinct count: dedup on (key, salt-of-value) first — the
    * expensive distinct state is bounded per (key, salt) — then merge the
    * per-salt partial counts. Identical to countDistinct(valueCol). */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
                          saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    // salting by the VALUE keeps each distinct value in exactly one
    // (key, salt) group, so per-salt distinct counts add up exactly
    df.withColumn("__salt", pmod(abs(hash(col(valueCol))), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n_distinct"))
  }

  /** The measure-before-you-salt diagnostic: the `topK` heaviest values
    * of a prospective join/aggregation key, each with the two numbers
    * that decide the mitigation — its share of all rows and its skew
    * ratio (count ÷ the uniform per-key expectation). A ratio near 1
    * means AQE alone is fine; double digits on a broadcast-ineligible
    * join is the [[saltedJoin]] case. One partial-agg shuffle
    * (key-count-sized) + a 1-row total broadcast + a k-bounded
    * TakeOrdered — never a global sort. */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("total_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col(keyCol), col("cnt"),
        col("total_rows").cast("long").as("total_rows"), col("n_keys"),
        (round(col("cnt").cast("double") / col("total_rows"), 6) + 0.0)
          .as("share"),
        (round(col("cnt").cast("double") * col("n_keys") /
          col("total_rows"), 6) + 0.0).as("skew_ratio"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(topK)
  }
}
