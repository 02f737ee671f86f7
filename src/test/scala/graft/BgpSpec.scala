package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kg.Bgp
import graft.kg.Bgp.TriplePattern

/** BGP conjunctive-query matching over a hand-built triple set: variable
  * binding, constant filters, shared-variable joins, within-pattern
  * repeated variables, and bag multiplicity. */
class BgpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a tiny KG: events a,b,c ordered a<b<c; entities; one self-loop node
  def kg = Seq(
    ("a", "BEFORE", "b"),
    ("b", "BEFORE", "c"),
    ("a", "BEFORE", "c"),
    ("a", "hasEntity", "alice"),
    ("b", "hasEntity", "alice"),
    ("c", "hasEntity", "bob"),
    ("a", "hasType", "Conflict:Attack"),
    ("b", "hasType", "Movement:Transport"),
    ("loop", "sameAs", "loop")
  ).toDF("subj", "pred", "obj")

  test("single pattern: constants filter, variables project in order") {
    val r = Bgp.matchPatterns(kg, Seq(TriplePattern("?x", "BEFORE", "?y")))
    assert(r.columns.toSeq == Seq("x", "y"))
    assert(r.as[(String, String)].collect().toSet ==
      Set(("a", "b"), ("b", "c"), ("a", "c")))
    val c = Bgp.matchPatterns(kg, Seq(TriplePattern("a", "BEFORE", "?y")))
    assert(c.columns.toSeq == Seq("y"))
    assert(c.as[String].collect().toSet == Set("b", "c"))
  }

  test("conjunction joins on shared variables") {
    // ordered pairs sharing an entity: only (a,b) via alice
    val r = Bgp.matchPatterns(kg, Seq(
      TriplePattern("?e1", "BEFORE", "?e2"),
      TriplePattern("?e1", "hasEntity", "?ent"),
      TriplePattern("?e2", "hasEntity", "?ent")))
    assert(r.select("e1", "e2", "ent").as[(String, String, String)]
      .collect().toSet == Set(("a", "b", "alice")))
    // 2-hop chain: (?x BEFORE ?y)(?y BEFORE ?z) -> a,b,c
    val chain = Bgp.matchPatterns(kg, Seq(
      TriplePattern("?x", "BEFORE", "?y"), TriplePattern("?y", "BEFORE", "?z")))
    assert(chain.select("x", "y", "z").as[(String, String, String)]
      .collect().toSet == Set(("a", "b", "c")))
  }

  test("repeated variable within a pattern = within-row equality") {
    val r = Bgp.matchPatterns(kg, Seq(TriplePattern("?n", "sameAs", "?n")))
    assert(r.columns.toSeq == Seq("n"))
    assert(r.as[String].collect().toSeq == Seq("loop"))
  }

  test("patterns with no shared variable cross-join (legal BGP)") {
    val r = Bgp.matchPatterns(kg, Seq(
      TriplePattern("?x", "hasType", "Conflict:Attack"),
      TriplePattern("?y", "sameAs", "?y")))
    assert(r.select("x", "y").as[(String, String)].collect().toSet ==
      Set(("a", "loop")))
  }

  test("OPTIONAL: left join binds where present, nulls where absent") {
    val r = Bgp.matchOptional(kg,
      Seq(TriplePattern("?e", "BEFORE", "?o")),
      TriplePattern("?e", "hasType", "?t"))
    val rows = r.select("e", "o", "t").collect()
      .map(x => (x.getString(0), x.getString(1), Option(x.getString(2)))).toSet
    assert(rows == Set(
      ("a", "b", Some("Conflict:Attack")),
      ("a", "c", Some("Conflict:Attack")),
      ("b", "c", Some("Movement:Transport"))))
    // an event with NO optional match keeps its row with null
    val r2 = Bgp.matchOptional(kg,
      Seq(TriplePattern("?e", "hasEntity", "?ent")),
      TriplePattern("?e", "hasType", "?t"))
    val cRow = r2.filter(r2("e") === "c").collect()
    assert(cRow.length == 1 && cRow.head.isNullAt(cRow.head.fieldIndex("t")))
    intercept[IllegalArgumentException] {
      Bgp.matchOptional(kg, Seq(TriplePattern("?e", "BEFORE", "?o")),
        TriplePattern("?x", "sameAs", "?y"))
    }
  }

  test("NOT EXISTS: anti join drops matched bindings, never multiplies") {
    // events with a type but no outgoing BEFORE: only b? a has, b has, c hasn't
    val r = Bgp.matchNotExists(kg,
      Seq(TriplePattern("?e", "hasEntity", "?ent")),
      TriplePattern("?e", "BEFORE", "?later"))
    assert(r.select("e").as[String].collect().toSet == Set("c"))
    // negated side multiplicity (a BEFORE b AND c) must not duplicate rows
    val kept = Bgp.matchNotExists(kg,
      Seq(TriplePattern("?e", "hasType", "?t")),
      TriplePattern("?e", "sameAs", "?x"))
    assert(kept.count() == 2) // a and b, each exactly once
  }

  test("N-Triples serialization: IRI space-encoding + literal escape set") {
    val hostile = Seq(
      ("ev 1", "hasEntity", "LOC:the border"),
      ("ev2", "says", "a\\b\"c\nd\te\rf")
    ).toDF("subj", "pred", "obj")
    val lines = graft.kg.Triples.toNTriples(hostile)
      .orderBy("ntriple").as[String].collect()
    assert(lines(0) == "<urn:g:ev%201> <urn:g:hasEntity> \"LOC:the border\" .")
    // escape order: backslash first, then quote, then control chars
    assert(lines(1) == "<urn:g:ev2> <urn:g:says> \"a\\\\b\\\"c\\nd\\te\\rf\" .")
  }

  test("bag multiplicity equals join multiplicity over the set store") {
    // (?e hasEntity ?ent)(?e BEFORE ?o): e=a matches twice (b, c)
    val r = Bgp.matchPatterns(kg, Seq(
      TriplePattern("?e", "hasEntity", "?ent"),
      TriplePattern("?e", "BEFORE", "?o")))
    val rows = r.select("e", "ent", "o").as[(String, String, String)].collect()
    assert(rows.count(_._1 == "a") == 2)
    assert(rows.length == 3) // a->b, a->c, b->c (c has no BEFORE out-edge)
  }
}
