package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tag.Viterbi

class ViterbiSpec extends AnyFunSuite {

  // labels: 0=O, 1=B-X, 2=I-X
  val labels = Array("O", "B-X", "I-X")
  val trans = Viterbi.bioTransitions(labels)

  test("decode picks the highest-scoring path") {
    val em = Array(
      Array(0.0, 5.0, Viterbi.NegInf),
      Array(0.0, -1.0, 5.0),
      Array(1.0, 0.0, 0.0))
    assert(Viterbi.decode(em, trans).toSeq == Seq(1, 2, 0))
  }

  test("BIO transition matrix blocks orphan I- (mask semantics)") {
    // emissions want I-X at position 0 and after O, transitions forbid it
    val em = Array(
      Array(0.0, Viterbi.NegInf, 5.0),
      Array(5.0, Viterbi.NegInf, Viterbi.NegInf),
      Array(0.0, Viterbi.NegInf, 5.0))
    val path = Viterbi.decode(em, trans).toSeq
    assert(path(0) != 2, "I-X must not start a sequence")
    assert(path(2) != 2, "I-X must not follow O")
  }

  test("-inf emission masks a label out entirely (P11 masked_fill analog)") {
    val em = Array(
      Array(0.0, Viterbi.NegInf, Viterbi.NegInf),
      Array(0.0, Viterbi.NegInf, Viterbi.NegInf))
    assert(Viterbi.decode(em, trans).toSeq == Seq(0, 0))
  }

  test("k-best returns distinct paths in score order (CRF_util k>1 path)") {
    val em = Array(
      Array(1.0, 0.9, Viterbi.NegInf),
      Array(1.0, 0.2, 0.8))
    val paths = Viterbi.decodeK(em, trans, 3)
    assert(paths.length == 3)
    assert(paths.map(_._1.toSeq) == Seq(Seq(0, 0), Seq(1, 0), Seq(1, 2)))
    val expected = Seq(2.0, 1.9, 1.7)
    for ((s, e) <- paths.map(_._2).zip(expected)) assert(math.abs(s - e) < 1e-9)
    val scores = paths.map(_._2)
    assert(scores == scores.sortBy(-(_: Double)))
  }

  test("empty input decodes to empty path") {
    assert(Viterbi.decode(Array.empty, trans).isEmpty)
  }
}
