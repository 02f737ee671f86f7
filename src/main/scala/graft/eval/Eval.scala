package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evaluation harness (SURVEY.md A5/J7): strict span-match P/R/F1 and
  * confusion matrices, as DataFrame aggregations — the engine-side mirror
  * of the reference's metric scripts (eval.py:70-231,
  * joint_model.weighted_f1:517-566, crosstab report_per_class_accuracy).
  */
object Eval {

  /** Strict span(+label) precision/recall/F1: `pred` and `gold` are frames
    * of (key, start, end, label); a prediction is correct iff an identical
    * gold tuple exists (eval_ace strict tuples, eval.py:207-221). Returns
    * one row (n_corr, n_pred, n_true, precision, recall, f1). */
  def spanPRF(pred: DataFrame, gold: DataFrame,
      matchLabel: Boolean = true): DataFrame = {
    val keys = if (matchLabel) Seq("key", "start", "end", "label")
    else Seq("key", "start", "end")
    val p = pred.select(keys.map(col): _*).distinct()
    val g = gold.select(keys.map(col): _*).distinct()
    val corr = p.join(g, keys, "left_semi").count()
    val nPred = p.count()
    val nTrue = g.count()
    val precision = if (nPred == 0) 0.0 else corr.toDouble / nPred
    val recall = if (nTrue == 0) 0.0 else corr.toDouble / nTrue
    val f1 = if (precision + recall == 0) 0.0
    else 2 * precision * recall / (precision + recall)
    val spark = pred.sparkSession
    import spark.implicits._
    Seq((corr, nPred, nTrue, precision, recall, f1))
      .toDF("n_corr", "n_pred", "n_true", "precision", "recall", "f1")
  }

  /** Per-label weighted F1 excluding given labels (the MATRES weighted_f1
    * excluding VAGUE/NONE, joint_model.py:517-566). `pairs` has columns
    * (gold, pred). */
  def weightedF1(pairs: DataFrame, exclude: Seq[String] = Seq("VAGUE", "NONE")): Double = {
    val kept = pairs.filter(!col("gold").isin(exclude: _*))
    val labels = kept.select("gold").distinct().collect().map(_.getString(0))
    val total = kept.count().toDouble
    if (total == 0) return 0.0
    labels.map { l =>
      val tp = kept.filter(col("gold") === l && col("pred") === l).count().toDouble
      val nPred = pairs.filter(col("pred") === l &&
        !col("gold").isin(exclude: _*)).count().toDouble
      val nTrue = kept.filter(col("gold") === l).count().toDouble
      val p = if (nPred == 0) 0.0 else tp / nPred
      val r = if (nTrue == 0) 0.0 else tp / nTrue
      val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
      f1 * (nTrue / total)
    }.sum
  }

  /** Confusion matrix via stat.crosstab (A5/A7). */
  def confusion(pairs: DataFrame): DataFrame =
    pairs.stat.crosstab("gold", "pred")

  /** A8: per-row min-max normalization of a timeline value array
    * (timelinemodule.py:177-191 — row-wise, NOT a shuffle aggregation). */
  def minMaxNormalize(df: DataFrame, arrCol: String): DataFrame = {
    val a = col(arrCol)
    val lo = array_min(a)
    val span = array_max(a) - lo
    df.withColumn(s"${arrCol}_norm",
      when(span === 0, transform(a, _ => lit(0.0)))
        .otherwise(transform(a, x => (x - lo) / span)))
  }
}
