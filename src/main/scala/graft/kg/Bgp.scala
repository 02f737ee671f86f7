package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Basic-graph-pattern (BGP) matching over the constructed KG — the
  * conjunctive-query core of SPARQL, compiled to Spark equi-joins. This
  * is the downstream query surface the construction pipeline exists to
  * feed (the reference's demo renders exactly such bindings —
  * event/argument/relation views over extracted triples): patterns like
  * `(?e1 BEFORE ?e2) (?e1 hasEntity ?ent) (?e2 hasEntity ?ent)` bind
  * variables across triples and return one column per variable.
  *
  * Compilation, Spark-first: each pattern becomes a constant-filtered
  * projection of the triple frame — the `pred = 'BEFORE'` filters reach
  * the scan as pushed predicates, so each pattern reads only its slice —
  * and patterns fold left joined on their shared variables (plain
  * equi-joins: Catalyst broadcasts selective sides, AQE re-plans and
  * skew-splits the rest). A repeated variable WITHIN a pattern compiles
  * to a within-row equality filter. Patterns sharing no variable with
  * the accumulated prefix compile to a crossJoin — legal BGP semantics;
  * order patterns so that never happens unintentionally at scale.
  *
  * Bag semantics over a SET triple store (the committed KG snapshot is
  * distinct), so binding multiplicity is exactly the join multiplicity —
  * deterministic, and reproducible by any relational engine.
  */
object Bgp {

  /** One triple pattern; each term is either a `?variable` or a
    * constant that must match exactly. */
  case class TriplePattern(s: String, p: String, o: String) {
    def terms: Seq[(String, String)] = Seq("subj" -> s, "pred" -> p, "obj" -> o)
  }

  private def isVar(t: String): Boolean = t.startsWith("?")

  /** One pattern → a constant-filtered projection with one column per
    * distinct variable (first-appearance order, `?` stripped); repeated
    * variables within the pattern become within-row equalities. */
  private def bind(triples: DataFrame, pt: TriplePattern): DataFrame = {
    val withConsts = pt.terms.filter { case (_, t) => !isVar(t) }
      .foldLeft(triples) { case (df, (c, t)) => df.filter(col(c) === t) }
    val varTerms = pt.terms.filter { case (_, t) => isVar(t) }
    val varOrder = varTerms.map(_._2).distinct
    val byVar = varTerms.groupBy(_._2)
    val eq = varOrder.flatMap { v =>
      byVar(v).tail.map(extra => col(extra._1) === col(byVar(v).head._1))
    }
    val filtered = eq.foldLeft(withConsts)(_.filter(_))
    filtered.select(varOrder.map(v => col(byVar(v).head._1).as(v.drop(1))): _*)
  }

  private def conjoin(acc: DataFrame, next: DataFrame): DataFrame = {
    val shared = acc.columns.filter(next.columns.contains).toSeq
    if (shared.nonEmpty) acc.join(next, shared) else acc.crossJoin(next)
  }

  /** Match a conjunction of patterns against `triples(subj, pred, obj)`.
    * Returns one column per distinct variable (in first-appearance
    * order, `?` stripped); one row per satisfying binding. */
  def matchPatterns(triples: DataFrame, patterns: Seq[TriplePattern]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    patterns.map(bind(triples, _)).reduceLeft(conjoin)
  }

  /** SPARQL OPTIONAL: extend each existing binding with the optional
    * pattern's variables where it matches, null columns where it
    * doesn't — a left outer join on the shared variables. The optional
    * pattern must share at least one variable with the bindings (an
    * unshared OPTIONAL would be a meaningless cross product).
    * Compositional: `bindings` is any frame produced by this object. */
  def optionalJoin(triples: DataFrame, bindings: DataFrame,
      optional: TriplePattern): DataFrame = {
    val opt = bind(triples, optional)
    val shared = bindings.columns.filter(opt.columns.contains).toSeq
    require(shared.nonEmpty, "OPTIONAL pattern shares no variable")
    bindings.join(opt, shared, "left")
  }

  /** SPARQL FILTER NOT EXISTS: drop bindings for which the negated
    * pattern has any match — a left anti join on the shared variables
    * (never a row explosion, whatever the negated side's multiplicity). */
  def notExistsJoin(triples: DataFrame, bindings: DataFrame,
      negated: TriplePattern): DataFrame = {
    val neg = bind(triples, negated)
    val shared = bindings.columns.filter(neg.columns.contains).toSeq
    require(shared.nonEmpty, "NOT EXISTS pattern shares no variable")
    bindings.join(neg, shared, "left_anti")
  }

  /** Convenience: required conjunction + one OPTIONAL pattern. */
  def matchOptional(triples: DataFrame, required: Seq[TriplePattern],
      optional: TriplePattern): DataFrame =
    optionalJoin(triples, matchPatterns(triples, required), optional)

  /** Convenience: required conjunction + one NOT EXISTS pattern. */
  def matchNotExists(triples: DataFrame, required: Seq[TriplePattern],
      negated: TriplePattern): DataFrame =
    notExistsJoin(triples, matchPatterns(triples, required), negated)
}
