package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Bucketed, Dedup}

/** Incremental near-dup against a committed corpus index (q54's op):
  * values pinned by hand-computed Jaccard (including the rule that
  * corpus stop-shingles drop from BATCH sets too — the exactness
  * condition), and the scale mechanism pinned at plan level: the
  * corpus-index side of the shingle join reads its bucketed on-disk
  * partitioning with ZERO Exchange — only the batch side shuffles. */
class IncrementalDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case o                        => o.children
    }
    p +: kids.flatMap(allNodes)
  }

  test("batch joins committed index exchange-free on the index side; cross-pair Jaccard exact") {
    // own session: broadcast disabled so the SMJ bucket path (the shape
    // the 100-TB corpus side takes) is what the plan pin proves
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "one two three four five six"),
      (3L, "p q r s t u")).toDF("doc_id", "text")
    // batch doc 10 shares 3 of its 4 shingles with corpus doc 1:
    // J = 3 / (4 + 4 - 3) = 0.6
    val batch = Seq((10L, "a b c d e g")).toDF("doc_id", "text")
    try {
      Dedup.commitShingleIndex(corpus, "ispec_idx", n = 3,
        maxShingleDf = 100, buckets = 4)
      val out = Dedup.incrementalJaccardPairs(s, "ispec_idx", batch,
        n = 3, threshold = 0.5)
      val got = out.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq == Seq((10L, 1L, 0.6)))

      // the SMJ side holding the committed index scan must carry NO
      // shuffle — the bucketed layout IS its partitioning
      val plan = out.queryExecution.executedPlan
      val idxSides = allNodes(plan)
        .collect { case j: SortMergeJoinExec => j }
        .flatMap(_.children.filter(c => allNodes(c).exists {
          case f: FileSourceScanExec =>
            f.relation.location.rootPaths.mkString(",").contains("ispec_idx")
          case _ => false
        }))
      assert(idxSides.nonEmpty, s"no SMJ over the index scan;\n$plan")
      idxSides.foreach { side =>
        assert(!allNodes(side).exists(_.isInstanceOf[ShuffleExchangeLike]),
          s"corpus-index side must not shuffle;\n$side")
      }
    } finally {
      Bucketed.drop(s, "ispec_idx")
      Bucketed.drop(s, "ispec_idx_stop")
    }
  }

  test("corpus stop-shingles drop from batch sets too (capped-universe exactness)") {
    val s = spark.newSession()
    import s.implicits._
    // shingle "x y z" appears in all 3 corpus docs -> df 3 > cap 2 ->
    // stopped. Batch doc is IDENTICAL to corpus doc 1: over the capped
    // universe J must be exactly 1.0 (0.75 if the batch kept "x y z")
    val corpus = Seq(
      (1L, "x y z a b c"),
      (2L, "x y z d e f"),
      (3L, "x y z g h i")).toDF("doc_id", "text")
    val batch = Seq((10L, "x y z a b c")).toDF("doc_id", "text")
    try {
      Dedup.commitShingleIndex(corpus, "ispec_cap", n = 3,
        maxShingleDf = 2, buckets = 2)
      val got = Dedup.incrementalJaccardPairs(s, "ispec_cap", batch,
        n = 3, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq == Seq((10L, 1L, 1.0)))
    } finally {
      Bucketed.drop(s, "ispec_cap")
      Bucketed.drop(s, "ispec_cap_stop")
    }
  }
}
