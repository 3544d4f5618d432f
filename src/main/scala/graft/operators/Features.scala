package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular feature engineering for training-data preparation. */
object Features {

  /** K-fold leakage-safe target encoding (the Catboost/kaggle-standard
    * categorical encoder, done the only way that is honest): each row's
    * category is replaced by the target mean of OTHER folds' rows in
    * that category, smoothed toward the other-folds global mean by a
    * pseudo-count prior — so a row's own target never leaks into its
    * feature, and rare categories shrink to the prior instead of
    * memorizing noise:
    *
    *   enc = (S_c − S_cf + m·prior) / (N_c − N_cf + m),
    *   prior = (S − S_f) / (N − N_f)
    *
    * (S/N sums and counts of the target: per category, per
    * category×fold, global, per fold). A category seen only in the
    * row's own fold encodes exactly to the prior.
    *
    * Scale shape: everything derives from ONE partial-agg shuffle over
    * (category, fold) — category-count-sized; the global/fold frames are
    * nFolds-row broadcasts; the encode join is one keyed join back on
    * (category, fold). Nothing is row-quadratic, no window.
    *
    * Cross-engine parity: with an integer 0/1 target every sum is
    * exact, the encode is a single rational division rounded to 6 —
    * no accumulation-order tolerance needed.
    *
    * A NULL category is a category (the raw-data reality): the count
    * frames group it and the join-backs are null-safe, so null-category
    * rows encode like any other instead of silently vanishing through
    * an inner equi-join. A single-fold input has no other-fold evidence
    * by definition — every enc comes back null (the honest answer);
    * callers supply ≥ 2 folds.
    *
    * @param target numeric target column expression (0/1 indicator for
    *               exact parity; any numeric works)
    * @param fold   deterministic fold id expression in [0, nFolds)
    * @return input columns + (fold: int, enc: double) */
  def targetEncode(df: DataFrame, catCol: String, target: Column,
                   fold: Column, smoothing: Double = 20.0): DataFrame = {
    val base = df.withColumn("__t", target.cast("double"))
      .withColumn("fold", fold.cast("int"))
    val cf = base.groupBy(col(catCol), col("fold"))
      .agg(sum("__t").as("s_cf"), count(lit(1)).as("n_cf"))
    val c = cf.groupBy(col(catCol))
      .agg(sum("s_cf").as("s_c"), sum("n_cf").as("n_c"))
    val f = cf.groupBy(col("fold"))
      .agg(sum("s_cf").as("s_f"), sum("n_cf").as("n_f"))
    val g = f.agg(sum("s_f").as("s_g"), sum("n_f").as("n_g"))
    val prior = (col("s_g") - col("s_f")) / (col("n_g") - col("n_f"))
    val enc = (col("s_c") - col("s_cf") + lit(smoothing) * prior) /
      (col("n_c") - col("n_cf") + lit(smoothing))
    val ba = base.alias("ba")
    val cfa = cf.select(col(catCol).as("__cat_cf"), col("fold").as("__f_cf"),
      col("s_cf"), col("n_cf"))
    val ca = c.select(col(catCol).as("__cat_c"), col("s_c"), col("n_c"))
    ba
      .join(cfa, col(s"ba.$catCol") <=> col("__cat_cf") &&
        col("ba.fold") === col("__f_cf"))
      .join(ca, col(s"ba.$catCol") <=> col("__cat_c"))
      .join(broadcast(f), Seq("fold"))
      .crossJoin(broadcast(g))
      .select(df.columns.map(n => col(s"ba.$n")) ++ Seq(col("fold"),
        (round(enc, 6) + 0.0).as("enc")): _*)
  }

  /** Reliability (calibration) report — the audit a learned quality /
    * language filter needs BEFORE its confidences gate data at scale:
    * bin predicted confidence into `bins` equal-width bins and report
    * each bin's population, mean confidence, and empirical accuracy
    * (a calibrated model has mean_conf ≈ accuracy per bin; the gap is
    * the expected-calibration-error integrand). One partial
    * aggregation; output is bins-sized.
    *
    * @param preds rows with a [0, 1] confidence and a 0/1 correctness
    * @return (bin, n, mean_conf, accuracy) quantized 1e-6 */
  def calibrationReport(preds: DataFrame, confCol: String,
                        correctCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    preds.select(
        least(floor(col(confCol) * bins), lit(bins - 1)).cast("int")
          .as("bin"),
        col(confCol).as("conf"),
        col(correctCol).cast("double").as("ok"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        (floor(avg("conf") * 1e6 + 0.5) / 1e6).as("mean_conf"),
        (floor(avg("ok") * 1e6 + 0.5) / 1e6).as("accuracy"))
  }
}
