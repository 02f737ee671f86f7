package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.kg.Triples

/** Fixed-iteration PageRank (Triples.pageRank) — the power method behind
  * kg_pagerank. Reference values come from the same recurrence run in
  * plain Scala over an adjacency map (no Spark), so a distributed-shape
  * bug (join/groupBy/dangling handling) diverges from the local truth. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Local reference: r'(v) = (1-d)/N + d * sum over u->v of r(u)/deg(u),
    * identical double arithmetic to the operator. */
  private def localPr(edges: Seq[(String, String)], iters: Int,
      d: Double = 0.85): Map[String, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size
    val out = e.groupBy(_._1).map { case (k, v) => k -> v.size }
    val in = e.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      r = nodes.map { v =>
        val acc = in.getOrElse(v, Nil).map(u => r(u) / out(u)).sum
        v -> ((1.0 - d) / n + d * acc)
      }.toMap
    }
    r
  }

  private def distPr(edges: Seq[(String, String)], iters: Int,
      parts: Int = 1): Map[String, Double] = {
    val df = edges.toDF("s", "o")
    val in = if (parts > 1) df.repartition(parts) else df
    Triples.pageRank(in, iters)
      .as[(String, Double)].collect().toMap
  }

  test("matches the local power-method reference on a 4-node graph") {
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a")
    val got = distPr(edges, iters = 5)
    val want = localPr(edges, iters = 5)
    assert(got.keySet == want.keySet)
    for ((v, w) <- want)
      assert(math.abs(got(v) - w) < 1e-12, s"node $v: ${got(v)} vs $w")
    // c has two in-edges (a and b) and must outrank the single-fed b
    assert(got("c") > got("b"))
  }

  test("dangling sinks keep the base rank; mass leaks (sum <= 1)") {
    // d is a pure sink: nothing flows out of it, so total mass decays
    val edges = Seq("a" -> "d", "b" -> "d", "c" -> "d")
    val got = distPr(edges, iters = 5)
    val n = 4
    // sources receive no inflow: rank = (1-d)/N exactly after round 1
    for (src <- Seq("a", "b", "c"))
      assert(math.abs(got(src) - 0.15000000000000002 / n) < 1e-15)
    assert(got.values.sum <= 1.0 + 1e-12)
    assert(got("d") > got("a"))
  }

  test("result is independent of input partitioning (exact doubles up to fp-sum order)") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(60)((s"v${rnd.nextInt(15)}", s"v${rnd.nextInt(15)}"))
      .filter(p => p._1 != p._2).distinct
    val one = distPr(edges, iters = 5, parts = 1)
    val many = distPr(edges, iters = 5, parts = 7)
    val want = localPr(edges, iters = 5)
    assert(one.keySet == many.keySet && one.keySet == want.keySet)
    for (v <- want.keys) {
      assert(math.abs(one(v) - want(v)) < 1e-12)
      assert(math.abs(many(v) - want(v)) < 1e-12)
    }
  }

  test("iters is respected (5-round result differs from 1-round on a chain)") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    val r1 = distPr(edges, iters = 1)
    val r5 = distPr(edges, iters = 5)
    assert(r1("c") != r5("c")) // rank keeps propagating down the chain
    assert(math.abs(r5("d") - localPr(edges, 5)("d")) < 1e-12)
  }
}
