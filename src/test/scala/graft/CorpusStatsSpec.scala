package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** corpusStats (q57): exact quantiles/distincts, plus the sketch twins
  * graded against the exact answers — the approx path a pipeline uses
  * when the length domain is unbounded. */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = TextAnalysis.withTokenCounts(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  test("exact stats: hand-checked on a crafted group") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 100L),
      ("b", 5L), ("b", 5L)).toDF("lang", "ws_tokens")
    val rows = TextAnalysis.corpusStats(df)
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val a = rows("a")
    assert(a._2 == 4 && a._3 == 4 && a._4 == 100L)
    assert(a._5 == 2.5) // p50 of 1,2,3,100: interpolate 2..3
    // p90: index 0.9*(4-1) = 2.7 -> 3 + 0.7*(100-3) = 70.9
    assert(a._6 == 70.9)
    val b = rows("b")
    assert(b._2 == 2 && b._3 == 1 && b._5 == 5.0 && b._7 == 5.0)
  }

  test("approx_percentile lands within 1 distinct step of exact p50/p90") {
    val exact = TextAnalysis.corpusStats(docs)
      .select("lang", "p50", "p90")
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    val approx = docs.groupBy("lang")
      .agg(expr("approx_percentile(ws_tokens, 0.5)").as("a50"),
        expr("approx_percentile(ws_tokens, 0.9)").as("a90"))
      .as[(String, Int, Int)].collect()
    // approx_percentile returns an ACTUAL value from the column; exact
    // interpolates between two neighbors — so the sketch must land
    // within the neighborhood of the exact answer
    for ((lang, a50, a90) <- approx) {
      val (_, p50, p90) = exact(lang)
      assert(math.abs(a50 - p50) <= math.max(2.0, p50 * 0.05),
        s"$lang p50: approx $a50 vs exact $p50")
      assert(math.abs(a90 - p90) <= math.max(2.0, p90 * 0.05),
        s"$lang p90: approx $a90 vs exact $p90")
    }
  }

  test("approx_count_distinct within 5% of exact distinct lengths") {
    val exact = TextAnalysis.corpusStats(docs)
      .select("lang", "n_distinct_len")
      .as[(String, Long)].collect().toMap
    val approx = docs.groupBy("lang")
      .agg(approx_count_distinct("ws_tokens").as("a"))
      .as[(String, Long)].collect()
    for ((lang, a) <- approx) {
      val e = exact(lang)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"$lang: approx $a vs exact $e")
    }
  }
}
