package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning (q53's mechanism), pinned at three levels:
  * the fact scan's PartitionFilters carry a dynamicpruningexpression
  * (plan), the executed scan reads ONLY the matching partitions' files
  * (execution metric), and the result is identical to the unpartitioned
  * computation (value — layout is a pure physical property). */
class DppSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Collect file scans through AQE wrappers (query stages are leaves to
    * the generic TreeNode collect, so recurse into them explicitly). */
  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val here = p match { case s: FileSourceScanExec => Seq(s); case _ => Nil }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case o                        => o.children
    }
    here ++ kids.flatMap(fileScans)
  }

  test("partition-pruned join: dynamicpruning in plan, only matching partition files read, values layout-invariant") {
    val root = Files.createTempDirectory("graft_dpp_spec").toString
    val ev = (1L to 200L).map(i => (i, s"t${i % 5}", (i % 13) * 0.5))
      .toDF("id", "ptype", "v")
    // one task writes all partitions -> exactly one data file per ptype dir
    ev.repartition(1).write.mode("overwrite").partitionBy("ptype").parquet(root)

    // the dim must come from a SOURCE so its Filter survives optimization
    // (a local Seq constant-folds to a LocalTableScan with no Filter node,
    // and DPP's selective-predicate check then never fires)
    val dimRoot = Files.createTempDirectory("graft_dpp_dim").toString
    Seq("t0", "t1", "t2", "t3", "t4").toDF("ptype")
      .write.mode("overwrite").parquet(dimRoot)
    val dim = spark.read.parquet(dimRoot)
      .filter($"ptype" < "t2") // selective predicate: the DPP trigger
    val out = spark.read.parquet(root)
      .join(dim, "ptype")
      .groupBy("ptype")
      .agg(sum(round($"v" * 100).cast("long")).as("v_cents"),
        count(lit(1)).as("n"))
      .orderBy("ptype")

    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"fact scan lost its pruning subquery; plan:\n${planStr.take(1500)}")

    val got = out.collect()

    // execution-level proof: of the 5 single-file partitions, the scan
    // read exactly the 2 the dim selects — pruned partitions never left disk
    val scans = fileScans(out.queryExecution.executedPlan)
      .filter(_.partitionFilters.exists(_.toString.contains("dynamicpruning")))
    assert(scans.nonEmpty, "no dynamically pruned scan in executed plan")
    assert(scans.head.metrics("numFiles").value == 2L,
      s"expected 2 files read, got ${scans.head.metrics("numFiles").value}")

    val want = ev.filter($"ptype" < "t2").groupBy("ptype")
      .agg(sum(round($"v" * 100).cast("long")).as("v_cents"),
        count(lit(1)).as("n"))
      .orderBy("ptype").collect()
    assert(got.toSeq == want.toSeq)
  }
}
