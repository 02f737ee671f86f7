package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bucketed

/** Plan-level pin for the bucketed co-located join: after both sides are
  * committed bucketed on the join key, the join AND a groupBy on the key
  * must run with ZERO Exchange nodes — the scan carries the partitioning.
  * Values must be identical to the un-bucketed computation (bucketing is
  * pure physical layout). */
class BucketedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed join + agg on the bucket key are Exchange-free and value-identical") {
    val fact = (1L to 400L).map(i => (i % 37, i, (i % 7) + 0.25))
      .toDF("k", "v", "q")
    val dim = (0L until 37L).map(k => (k, s"dim_$k")).toDF("k", "name")
    try {
      Bucketed.write(fact, "bspec_fact", "k", 4)
      Bucketed.write(dim, "bspec_dim", "k", 4)

      // hint("merge") pins the sort-merge path (a small dim would
      // otherwise broadcast — valid, but it's the bucket-to-bucket SMJ
      // this spec exists to prove)
      val joined = spark.table("bspec_fact")
        .join(spark.table("bspec_dim").hint("merge"), "k")
        .groupBy("k")
        .agg(sum($"v").as("sv"),
          sum(round($"q" * 100).cast("long")).as("q_cents"),
          count(lit(1)).as("n"),
          max($"name").as("name"))
      val got = joined.collect()

      // executed (AQE-final) plan: no Exchange anywhere — the bucketed
      // scans satisfy both the join and the aggregation distribution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ; plan:\n${plan.take(1200)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg must not shuffle; plan:\n${plan.take(1200)}")

      // identical values to the un-bucketed formulation
      val want = fact.join(dim, "k").groupBy("k")
        .agg(sum($"v").as("sv"),
          sum(round($"q" * 100).cast("long")).as("q_cents"),
          count(lit(1)).as("n"),
          max($"name").as("name"))
        .collect()
      assert(got.sortBy(_.getLong(0)).toSeq == want.sortBy(_.getLong(0)).toSeq)
    } finally {
      Bucketed.drop(spark, "bspec_fact")
      Bucketed.drop(spark, "bspec_dim")
    }
  }

  test("mismatched bucket counts still compute correctly (Spark inserts the exchange it needs)") {
    val a = (1L to 100L).map(i => (i % 11, i)).toDF("k", "v")
    val b = (0L until 11L).map(k => (k, k * 10)).toDF("k", "w")
    try {
      Bucketed.write(a, "bspec_a", "k", 4)
      Bucketed.write(b, "bspec_b", "k", 3)
      val got = spark.table("bspec_a").join(spark.table("bspec_b"), "k")
        .agg(sum($"v" + $"w").as("s")).head.getLong(0)
      val want = a.join(b, "k").agg(sum($"v" + $"w")).head.getLong(0)
      assert(got == want)
    } finally {
      Bucketed.drop(spark, "bspec_a")
      Bucketed.drop(spark, "bspec_b")
    }
  }
}
