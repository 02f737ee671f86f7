package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a (small) held-out evaluation set — the standard guard
  * against eval leakage when assembling LLM training corpora (13-gram
  * overlap in GPT-3's appendix; 8-grams here, same mechanism).
  *
  * Scale shape: the EVAL side is tiny (benchmarks are MBs; the corpus is
  * 100 TB), so its distinct n-gram set is broadcast and the corpus side
  * never shuffles for the match — one narrow gram expansion, one
  * broadcast hash semi-join, then a groupBy(doc) over only the HIT rows
  * (hits are rare by construction: most training docs share nothing with
  * an eval set, so the post-join aggregate is orders of magnitude smaller
  * than the corpus). The gram expansion reuses `Dedup.shingles` — the
  * same distinct word-n-gram definition the near-dup family is
  * oracle-proven on.
  */
object Decontaminate {

  /** Per-document eval-overlap report: `(idCol, n_grams, eval_hits,
    * overlap_frac, contaminated)` for every row of `docs` — `eval_hits`
    * counts the doc's DISTINCT n-grams that occur anywhere in
    * `evalDocs`, and `contaminated` is 1 iff any gram collides (the
    * conservative decontamination rule: one shared n-gram of this length
    * is already evidence, not chance, for n >= 8 over a real vocabulary).
    * Deterministic: set semantics on both sides, no sampling. */
  def overlapReport(docs: DataFrame, evalDocs: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val corpus = docs
      .select(col(idCol), Dedup.shingles(col(textCol), n).as("grams"))
    val evalGrams = evalDocs
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    val hits = corpus
      .select(col(idCol), explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("eval_hits"))
    corpus
      .select(col(idCol), size(col("grams")).as("n_grams"))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_grams").cast("long").as("n_grams"),
        coalesce(col("eval_hits"), lit(0L)).as("eval_hits"),
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(round(
            coalesce(col("eval_hits"), lit(0L)) / col("n_grams").cast("double"),
            4)).as("overlap_frac"),
        (coalesce(col("eval_hits"), lit(0L)) > 0).cast("int").as("contaminated"))
  }
}
