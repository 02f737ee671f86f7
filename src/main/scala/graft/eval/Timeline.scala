package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-document event timeline fitting — the full A8 analog.
  *
  * The reference (component/Duration/scripts/timelinemodule.py:72-245,
  * driven by run_model.py:113-150) fits per-document (begin, duration)
  * scalars with 5000 Adam epochs so pairwise positions match the
  * annotated relations, then min-max normalizes each timeline to [0,1].
  *
  * Spark-first re-expression: the same per-document problem is a
  * longest-path layering over the temporal-relation graph —
  * BEFORE(a,b) ⇒ t(b) ≥ t(a)+1, SIMULTANEOUS/INCLUDES ⇒ t equal —
  * solved as a deterministic fixpoint per document inside `mapGroups`
  * (the per-doc graph is document-bounded, so the local solve is O(V·E)
  * worst case and never grows with the corpus), then normalized to
  * [0,1]. ONE shuffle (groupByKey on doc), narrow everywhere else —
  * at 10^12 files this is a single repartition by doc key, with no
  * driver-side iteration at all (unlike the CC loop, the fixpoint here
  * is per-group local).
  */
object Timeline {

  /** relations: (sentKey, lAligned, rAligned, label) — the KG pipeline's
    * relation frame. Returns (doc, eventId, t) with t ∈ [0,1] per doc. */
  def fitDocTimelines(spark: SparkSession, relations: DataFrame): DataFrame =
    solve(spark, relations.select(
      // doc = repo/path prefix of the sentKey ("repo/path#Lx:Sy")
      substring_index(col("sentKey"), "#L", 1).as("doc"),
      concat(col("sentKey"), lit(":T"), col("lAligned")).as("a"),
      concat(col("sentKey"), lit(":T"), col("rAligned")).as("b"),
      col("label")))

  /** Same fit straight off the materialized triple table (relation triples
    * already carry full event ids) — lets callers reuse a cached KG run. */
  def fitFromTriples(spark: SparkSession, triples: DataFrame): DataFrame =
    solve(spark, triples
      .filter(col("pred").isin("BEFORE", "AFTER", "SIMULTANEOUS",
        "INCLUDES", "IS_INCLUDED"))
      .select(substring_index(col("subj"), "#L", 1).as("doc"),
        col("subj").as("a"), col("obj").as("b"), col("pred").as("label")))

  private def solve(spark: SparkSession, edgeDf: DataFrame): DataFrame = {
    import spark.implicits._
    val edges = edgeDf.as[(String, String, String, String)]
    edges.groupByKey(_._1)
      .flatMapGroups { (doc, it) =>
        val es = it.map { case (_, a, b, l) => (a, b, l) }.toArray
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val idx = nodes.zipWithIndex.toMap
        val t = Array.fill(nodes.length)(0.0)
        // longest-path relaxation; iteration cap = |V| bounds cycles
        // (contradictory annotations) without divergence
        var changed = true
        var iter = 0
        while (changed && iter < nodes.length) {
          changed = false
          var i = 0
          while (i < es.length) {
            val (a, b, l) = es(i)
            val (ia, ib) = (idx(a), idx(b))
            l match {
              case "BEFORE" =>
                if (t(ib) < t(ia) + 1) { t(ib) = t(ia) + 1; changed = true }
              case "AFTER" =>
                if (t(ia) < t(ib) + 1) { t(ia) = t(ib) + 1; changed = true }
              case "SIMULTANEOUS" | "INCLUDES" | "IS_INCLUDED" =>
                val m = math.max(t(ia), t(ib))
                if (t(ia) != m || t(ib) != m) {
                  t(ia) = m; t(ib) = m; changed = true
                }
              case _ => ()
            }
            i += 1
          }
          iter += 1
        }
        // A8 min-max normalize to [0,1] (timelinemodule.py:177-191)
        val lo = if (t.isEmpty) 0.0 else t.min
        val span = (if (t.isEmpty) 0.0 else t.max) - lo
        nodes.map { n =>
          val v = if (span == 0) 0.0 else (t(idx(n)) - lo) / span
          (doc, n, math.rint(v * 10000) / 10000)
        }
      }.toDF("doc", "eventId", "t")
  }
}
