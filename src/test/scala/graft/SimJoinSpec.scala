package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, EditJoin}

/** q73/q74 — the two exact similarity-join candidate-generation schemes:
  * segment-pigeonhole edit-distance join (PassJoin) and prefix-filtered
  * set-similarity join (AllPairs/PPJoin). Both claim EXACTNESS (no false
  * negatives from candidate generation, no false positives after verify),
  * so every test here compares against an independent brute force. */
class SimJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force reference: all unordered pairs within levenshtein d,
    * computed via a plain cross join — a different algorithm (no
    * segmenting, no banding) over the same levenshtein expression. */
  private def bruteEdit(names: Seq[String], d: Int): Set[(String, String, Long)] = {
    val n = names.distinct.toDF("s")
    n.select(col("s").as("a")).crossJoin(n.select(col("s").as("b")))
      .filter(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .filter(col("dist") <= d)
      .as[(String, String, Long)].collect().toSet
  }

  private def segPairs(rows: Seq[(String, Int)], d: Int): Set[(String, String, Long, Long, Long)] =
    EditJoin.editDistancePairs(
      rows.flatMap { case (s, k) => Seq.fill(k)(s) }.toDF("p_name"), d = d)
      .as[(String, String, Long, Long, Long)].collect().toSet

  test("editDistancePairs: hand-computed pairs, weights, and exclusions") {
    // cat~cap (1), cat~cart (1), cap~cart (2), scarts~cart (2, len diff 2),
    // dog isolated (>2 from all), cat appears 3x, cap 2x
    val out = segPairs(Seq(("cat", 3), ("cap", 2), ("cart", 1),
      ("scarts", 1), ("dog", 1)), d = 2)
    assert(out === Set(
      ("cap", "cat", 1L, 2L, 3L),
      ("cart", "cat", 1L, 1L, 3L),
      ("cap", "cart", 2L, 2L, 1L),
      ("cart", "scarts", 2L, 1L, 1L)))
  }

  test("editDistancePairs: short-string path (length <= d) pairs exactly once") {
    // "a"(1) and "ab"(2) are below the d+1=3 segment minimum; "abc" is on
    // it. a~ab 1, a~abc 2, ab~abc 1, ab~b 1, a~b 1 — and no duplicates
    // from the short-path cross join overlapping the segment path.
    val out = segPairs(Seq(("a", 1), ("ab", 1), ("abc", 1), ("b", 1)), d = 2)
    assert(out.map(p => (p._1, p._2, p._3)) === Set(
      ("a", "ab", 1L), ("a", "abc", 2L), ("ab", "abc", 1L),
      ("ab", "b", 1L), ("a", "b", 1L), ("abc", "b", 2L), ("b", "ab", 1L)
    ).map { case (a, b, x) => if (a < b) (a, b, x) else (b, a, x) })
  }

  test("editDistancePairs: randomized brute-force equivalence, d = 1 and 2") {
    val rnd = new scala.util.Random(4242)
    val alpha = "abc"
    val names = (0 until 60).map { _ =>
      val len = rnd.nextInt(9) // 0..8, exercises empty + short + segment
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.filter(_.nonEmpty).distinct
    for (d <- Seq(1, 2)) {
      val got = segPairs(names.map((_, 1)), d = d).map(p => (p._1, p._2, p._3))
      val want = bruteEdit(names, d)
      assert(got === want, s"d=$d mismatch")
    }
  }

  test("editDistancePairs: partitioning-independent") {
    val base = Seq("cold bolt", "old bolt", "red plate", "old plate",
      "new gizmo", "red gizmo").flatMap(s => Seq.fill(3)(s))
    val one = EditJoin.editDistancePairs(base.toDF("p_name").repartition(1))
      .collect().toSet
    val many = EditJoin.editDistancePairs(base.toDF("p_name").repartition(7))
      .collect().toSet
    assert(one === many && one.nonEmpty)
  }

  test("hotSegmentKeys: hottest key is the shared segment") {
    // "xx bolt" / "yy bolt" / "zz bolt" share the tail; with d=2 the
    // 7-char strings split 3/2/2 — segments "xx ", "bo", "lt" etc.
    val df = Seq("xx bolt", "yy bolt", "zz bolt").toDF("p_name")
    val top = EditJoin.hotSegmentKeys(df, d = 2).limit(2)
      .select("kseg", "n_strings").as[(String, Long)].collect().toList
    assert(top === List(("bo", 3L), ("lt", 3L)))
  }

  // ---- q74: prefix-filtered exact Jaccard ----

  /** Brute-force reference over the same shingle definition: inverted
    * index WITHOUT any cap, full aggregation — no prefixes involved. */
  private def bruteJaccard(docs: Seq[(Long, String)], tNum: Int, tDen: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val inv = docs.toDF("doc_id", "text")
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("g"))
    val n = inv.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    inv.select(col("g"), col("doc_id").as("a"))
      .join(inv.select(col("g"), col("doc_id").as("b")), Seq("g"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
      .join(n.select(col("doc_id").as("a"), col("nsh").as("na")), Seq("a"))
      .join(n.select(col("doc_id").as("b"), col("nsh").as("nb")), Seq("b"))
      .withColumn("uni", col("na") + col("nb") - col("common"))
      .filter(col("common") * tDen >= col("uni") * tNum)
      .select(col("a"), col("b"), col("common"), col("na"), col("nb"),
        expr("(common * 10000) div uni").as("j_bp"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  test("prefixJaccardPairs: hand case with an exact-threshold pair") {
    // doc1/doc2: 4 shingles each, 3 shared -> J = 3/5 >= 1/2 (j_bp 6000);
    // doc3 disjoint; doc4 == doc1 -> J = 1 (j_bp 10000).
    val docs = Seq(
      (1L, "a b c d e f"),           // shingles: abc bcd cde def
      (2L, "a b c d e zz"),          // abc bcd cde de-zz -> common 3
      (3L, "p q r s"),
      (4L, "a b c d e f"))
    val out = Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 2L, 3L, 4L, 4L, 6000L),
      (1L, 4L, 4L, 4L, 4L, 10000L),
      (2L, 4L, 3L, 4L, 4L, 6000L)))
  }

  test("prefixJaccardPairs: randomized brute-force equivalence at two thresholds") {
    val rnd = new scala.util.Random(777)
    val words = Vector("red", "old", "new", "big", "bolt", "gear", "rod")
    val docs = (1L to 40L).map { id =>
      val len = 3 + rnd.nextInt(8)
      (id, (0 until len).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    for ((tn, td) <- Seq((1, 2), (4, 5))) {
      val got = Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"),
        tNum = tn, tDen = td)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === bruteJaccard(docs, tn, td), s"t=$tn/$td mismatch")
    }
  }

  test("prefixJaccardPairs: partitioning-independent") {
    val docs = (1L to 30L).map(i =>
      (i, if (i % 3 == 0) "x y z w v u" else "x y z q r s"))
    val a = Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text").repartition(1))
      .collect().toSet
    val b = Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text").repartition(11))
      .collect().toSet
    assert(a === b && a.nonEmpty)
  }
}
