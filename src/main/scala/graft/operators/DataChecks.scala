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

  /** The actionable complement of [[checkReport]]: the ROWS violating
    * any constraint, each with the ordered list of constraints it
    * failed (`failed`, built in declaration order: unique, non_null,
    * range — deterministic, no sort) — the quarantine side of a
    * validate-then-route ingest, with the clean side recoverable as an
    * anti-join on the same frame.
    *
    * Per-row semantics: a `unique` violation flags EVERY row of a key
    * group larger than one (the group needs resolution, not just the
    * stragglers); nulls are never unique violations (completeness's
    * concern, the [[checkReport]] convention); `range` flags non-null
    * out-of-interval values.
    *
    * Scale shape: non-null and range flags are codegen'd row-local
    * expressions on the scan; each unique constraint adds one keyed
    * join against its duplicated-KEYS frame (violation-sized build
    * side, usually tiny — AQE broadcasts it).
    *
    * @return the violating rows: all of `df`'s columns plus
    *         (failed: array&lt;string&gt;, n_failed: int) */
  def quarantine(df: DataFrame, uniqueCols: Seq[String] = Nil,
                 nonNullCols: Seq[String] = Nil,
                 ranges: Seq[(String, (Double, Double))] = Nil): DataFrame = {
    require(uniqueCols.nonEmpty || nonNullCols.nonEmpty || ranges.nonEmpty,
      "no constraints given")
    val joined = uniqueCols.foldLeft(df) { (acc, c) =>
      val dups = df.groupBy(col(c)).agg(count(lit(1)).as("__n"))
        .where(col("__n") > 1).select(col(c).as(s"__dupkey_$c"))
      acc.join(dups, acc(c) === col(s"__dupkey_$c"), "left")
    }
    val flags =
      uniqueCols.map(c =>
        when(col(s"__dupkey_$c").isNotNull, lit(s"unique:$c"))) ++
      nonNullCols.map(c => when(col(c).isNull, lit(s"non_null:$c"))) ++
      ranges.map { case (c, (lo, hi)) =>
        when(col(c).isNotNull && (col(c) < lo || col(c) > hi),
          lit(s"range:$c")) }
    joined
      .withColumn("failed", filter(array(flags: _*), x => x.isNotNull))
      .where(size(col("failed")) > 0)
      .withColumn("n_failed", size(col("failed")))
      .select(df.columns.map(col).toSeq :+ col("failed") :+
        col("n_failed"): _*)
  }

  /** k-anonymity by stepwise generalization (the release-readiness
    * audit for training data carrying quasi-identifiers): each row's
    * `level` is the smallest suffix-drop generalization of `qiCols`
    * under which its equivalence class reaches size ≥ k — level 0 keeps
    * every quasi-identifier, level i drops the last i, level
    * `qiCols.length` is fully generalized (the whole table, so every
    * row terminates). `group_n` is the class size at that level. A
    * release then publishes each row at its level (or suppresses rows
    * above a budget); the level histogram IS the privacy/utility
    * trade-off curve.
    *
    * Scale shape: one partial-agg shuffle per level for the class-size
    * frames (group-count-sized) plus one keyed join each; the
    * fully-generalized level is a 1-row broadcast. Levels = #QIs + 1,
    * a handful — never row-quadratic.
    *
    * @return (idCol, level: int, group_n: long) one row per input row */
  def kAnonymize(df: DataFrame, idCol: String, qiCols: Seq[String],
                 k: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier")
    require(k > 0, s"k must be positive, got $k")
    val withCounts = (0 until qiCols.length).foldLeft(df) { (acc, level) =>
      val qs = qiCols.dropRight(level)
      val cnt = df.groupBy(qs.map(col): _*)
        .agg(count(lit(1)).as(s"__n$level"))
      acc.join(cnt, qs)
    }
    val total = df.agg(count(lit(1)).as(s"__n${qiCols.length}"))
    val all = withCounts.crossJoin(broadcast(total))
    val levelCol = (0 to qiCols.length).foldRight(lit(qiCols.length)) {
      (l, acc) => when(col(s"__n$l") >= k, lit(l)).otherwise(acc)
    }
    val groupCol = (0 to qiCols.length)
      .foldRight(col(s"__n${qiCols.length}")) { (l, acc) =>
        when(col(s"__n$l") >= k, col(s"__n$l")).otherwise(acc)
      }
    all.select(col(idCol), levelCol.cast("int").as("level"),
      groupCol.cast("long").as("group_n"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the companion
    * check [[kAnonymize]] needs before release: a class of k identical
    * quasi-identifier rows is still a disclosure if they all share one
    * SENSITIVE value. Per equivalence class (the distinct `qiCols`
    * combination) this reports class size, the number of distinct
    * sensitive values (distinct l-diversity: `diverse` ⇔ ≥ l), the
    * largest single sensitive value's share, and the entropy of the
    * sensitive distribution via the one-pass identity
    * `H = ln(N) - Σ n·ln(n) / N` — so the whole audit is two stacked
    * partial-agg shuffles (class+value counts, then class rollup), never
    * a distinct-within-group scan, and the output is class-count-sized.
    *
    * @return (qiCols…, group_n, n_sensitive, max_frac, entropy, diverse) */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier")
    require(l > 0, s"l must be positive, got $l")
    val sv = df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    sv.groupBy(qiCols.map(col): _*)
      .agg(
        sum("__n").as("group_n"),
        count(lit(1)).as("n_sensitive"),
        max("__n").as("__maxn"),
        sum(col("__n") * log(col("__n"))).as("__snln"))
      .select(qiCols.map(col) ++ Seq(
        col("group_n").cast("long").as("group_n"),
        col("n_sensitive").cast("long").as("n_sensitive"),
        round(col("__maxn").cast("double") / col("group_n"), 6)
          .as("max_frac"),
        (round(log(col("group_n").cast("double")) -
          col("__snln") / col("group_n"), 6) + 0.0).as("entropy"),
        (col("n_sensitive") >= l).as("diverse")): _*)
  }
}
