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

  /** Grouped strict-span P/R/F1 — the DISTRIBUTED shape of [[spanPRF]]
    * (J7 at scale): one row per group, computed with joins + groupBy only
    * (no driver-side count() actions), so a 10^12-span eval is three
    * shuffles on the match key instead of three jobs per corpus. `pred`
    * and `gold` both carry `grpCols ++ matchCols`; a prediction is correct
    * iff an identical gold tuple exists within its group
    * (eval.py:207-221 strict tuples, keyed). */
  def spanPRFByKey(pred: DataFrame, gold: DataFrame,
      grpCols: Seq[String], matchCols: Seq[String]): DataFrame = {
    val all = (grpCols ++ matchCols).map(col)
    val p = pred.select(all: _*).distinct()
    val g = gold.select(all: _*).distinct()
    val corr = p.join(g, grpCols ++ matchCols, "left_semi")
      .groupBy(grpCols.map(col): _*).agg(count(lit(1)).as("n_corr"))
    val nPred = p.groupBy(grpCols.map(col): _*)
      .agg(count(lit(1)).as("n_pred"))
    val nTrue = g.groupBy(grpCols.map(col): _*)
      .agg(count(lit(1)).as("n_true"))
    val joined = nPred.join(nTrue, grpCols, "full_outer")
      .join(corr, grpCols, "left_outer")
      .na.fill(0L, Seq("n_corr", "n_pred", "n_true"))
    val prec = when(col("n_pred") === 0, 0.0)
      .otherwise(col("n_corr").cast("double") / col("n_pred"))
    val rec = when(col("n_true") === 0, 0.0)
      .otherwise(col("n_corr").cast("double") / col("n_true"))
    joined
      .withColumn("precision", prec)
      .withColumn("recall", rec)
      .withColumn("f1", when(col("precision") + col("recall") === 0, 0.0)
        .otherwise(lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall"))))
  }

  /** Per-label weighted F1 excluding given labels (the MATRES weighted_f1
    * excluding VAGUE/NONE, joint_model.py:517-566). `pairs` has columns
    * (gold, pred). Distributed shape (the spanPRFByKey discipline): two
    * label-keyed aggregations + one label-vocabulary-bounded join instead
    * of three driver count() jobs per label — at 10^12 pairs this is two
    * shuffles on the label key, and the only driver action is the final
    * one-row reduce. */
  def weightedF1(pairs: DataFrame, exclude: Seq[String] = Seq("VAGUE", "NONE")): Double = {
    val kept = pairs.filter(!col("gold").isin(exclude: _*))
    val byGold = kept.groupBy("gold").agg(
      count(lit(1)).as("n_true"),
      sum(when(col("pred") === col("gold"), 1L).otherwise(0L)).as("tp"))
    val byPred = kept.groupBy(col("pred").as("gold"))
      .agg(count(lit(1)).as("n_pred"))
    val p = when(col("n_pred") === 0, 0.0)
      .otherwise(col("tp").cast("double") / col("n_pred"))
    val r = when(col("n_true") === 0, 0.0)
      .otherwise(col("tp").cast("double") / col("n_true"))
    val perLabel = byGold.join(byPred, Seq("gold"), "left")
      .na.fill(0L, Seq("n_pred"))
      .withColumn("p", p).withColumn("r", r)
      .withColumn("f1", when(col("p") + col("r") === 0, 0.0)
        .otherwise(lit(2.0) * col("p") * col("r") / (col("p") + col("r"))))
    val row = perLabel
      .agg(sum(col("f1") * col("n_true")).as("wsum"),
        sum(col("n_true")).as("total"))
      .collect()(0)
    if (row.isNullAt(1) || row.getLong(1) == 0L) 0.0
    else row.getDouble(0) / row.getLong(1)
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
