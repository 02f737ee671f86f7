package graft

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.expressions.{Expression, Lower, StringTrim, StringTrimLeft, StringTrimRight}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.ops.RollingFingerprint

/** Optimizer rule (injected by [[GraftExtensions]]): elide `lower`/`trim`
  * wrappers under `rolling_fingerprint` — the fingerprint's internal
  * normalization (`RollingFingerprint.normalize`: lowercase, collapse
  * whitespace, trim) makes them exact no-ops, so a SQL consumer writing
  * the defensive `rolling_fingerprint(lower(trim(text)))` pays a full
  * extra pass + copy of every string in the hot path for nothing. At
  * 100 TB of document text that is 100 TB of avoided allocations.
  *
  * Deliberately NOT elided: `upper` (ß→"SS"→"ss" ≠ lowercase ß — not
  * idempotent through the internal toLowerCase) and any `trim` with an
  * explicit trim-character set (may remove non-whitespace the
  * normalization keeps).
  */
object FingerprintNormalizeElision extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case rf @ RollingFingerprint(child, w) =>
        val stripped = strip(child)
        if (stripped eq child) rf else RollingFingerprint(stripped, w)
    }

  /** Peel redundant wrappers; `lower` is idempotent through the internal
    * toLowerCase, and end-of-string space trimming is subsumed by the
    * internal whitespace collapse + trim. */
  @tailrec private def strip(e: Expression): Expression = e match {
    case Lower(c) => strip(c)
    case StringTrim(c, None) => strip(c)
    case StringTrimLeft(c, None) => strip(c)
    case StringTrimRight(c, None) => strip(c)
    case _ => e
  }
}
