package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.corpus.Synth
import graft.kg.Triples

/** integrityAudit (q58): clean pipeline output audits empty; each planted
  * violation class is caught, and nothing else rides along. */
class AuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clean pipeline triples audit to zero violations") {
    val tri = Triples.fromFilesDistinctCommitted(spark,
      Synth.corpus(spark, 40L, 6))
    assert(Triples.integrityAudit(tri).isEmpty)
  }

  test("each violation class is caught exactly once on planted rows") {
    val planted = Seq(
      ("a#L1:S0:T1", "BEFORE", "a#L2:S0:T2"),
      ("a#L1:S0:T1", "hasDuration", "eons"),
      ("a#L1:S0:T1", "speculated", "false"),
      ("x1", "sameAs", "x2"), ("x2", "sameAs", "x3"),
      ("doc", "hasEntity", "ROBOT:r2d2"),
      // and clean rows that must NOT be flagged
      ("a#L1:S0:T1", "BEFORE", "a#L1:S0:T9"),
      ("a#L1:S0:T1", "hasDuration", "days"),
      ("a#L1:S0:T1", "speculated", "true"),
      ("y1", "sameAs", "y9"),
      ("doc", "hasEntity", "PER:Mary Jones")
    ).toDF("subj", "pred", "obj")
    val got = Triples.integrityAudit(planted)
      .as[(String, String, String, String)].collect().toSet
    assert(got == Set(
      ("rel_cross_sentence", "a#L1:S0:T1", "BEFORE", "a#L2:S0:T2"),
      ("bad_duration_class", "a#L1:S0:T1", "hasDuration", "eons"),
      ("bad_speculation_flag", "a#L1:S0:T1", "speculated", "false"),
      ("sameas_not_flattened", "x1", "sameAs", "x2"),
      ("bad_entity_label", "doc", "hasEntity", "ROBOT:r2d2")))
  }
}
