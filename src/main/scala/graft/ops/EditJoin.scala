package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact edit-distance (Levenshtein) similarity self-join — the string
  * half of the entity-resolution matching toolkit (q74/ngramJaccard cover
  * the token-set half): find every pair of distinct surface forms within
  * edit distance `d`, each with its row support, without ever going
  * quadratic in the number of distinct strings.
  *
  * Candidate generation is the segment pigeonhole (PassJoin, Li/Deng/Feng
  * VLDB'11 — same family as the SimHash band trick in [[Dedup]]): partition
  * each string into `d+1` contiguous segments; if ed(s, r) <= d, an optimal
  * alignment spends <= d edits, so at least one segment of s survives
  * UNEDITED and therefore occurs verbatim in r, shifted by at most d
  * positions (insertions/deletions preceding it net to <= d). So:
  *
  *   - index side: each string s of length l emits its d+1 segments keyed
  *     (l, i, segment);
  *   - probe side: each string r of length m emits, for every candidate
  *     indexed length l in [m-d, m] and segment index i, the substrings of
  *     r of segment-i length starting within +-d of segment i's start —
  *     O((d+1)^2 (2d+1)) bounded keys per row (75 at d=2, vs m substrings
  *     for a naive gram index);
  *   - equi-join on the key, then verify candidates with the codegen
  *     `levenshtein` expression. Probing only l <= m (ties broken
  *     lexicographically) emits each unordered pair once.
  *
  * The pigeonhole guarantees NO false negatives, verification removes all
  * false positives — the result is exactly "every pair at distance <= d",
  * which is what makes a full DuckDB hash oracle possible (brute-force
  * levenshtein over the distinct strings re-derives it).
  *
  * Strings too short to carry d+1 non-empty segments (length <= d) pair
  * only with strings of length <= 2d (ed >= length difference), a
  * bounded-universe set handled by a tiny banded cross join.
  *
  * 100-TB shape: the expensive object is the DISTINCT surface-form table
  * (vocabulary-sized, not corpus-sized — the groupBy collapses row
  * support first, one shuffle on the string). The candidate join is keyed
  * on (length, segment-index, segment-text): rare segments make rare
  * keys, and [[hotSegmentKeys]] is the audit view for corpora where a hot
  * segment key would go quadratic (the q13 df-cap discipline; cap
  * OUTSIDE the exact query so the oracle stays brute-force-equal).
  */
object EditJoin {

  /** Segment start/length of segment `i` of an `l`-length string: the
    * first `l mod (d+1)` segments get the extra character. Shared by the
    * index and probe sides (both sides must agree on the scheme). */
  private def segStart(d: Int, l: String, i: String) =
    s"cast($i * ($l div ${d + 1}) + least($i, $l % ${d + 1}) as int)"
  private def segLen(d: Int, l: String, i: String) =
    s"cast(($l div ${d + 1}) + (case when $i < $l % ${d + 1} then 1 else 0 end) as int)"

  /** All unordered pairs of distinct `nameCol` values within Levenshtein
    * distance `d`, with per-value row counts:
    * `(a, b, dist, wa, wb)`, a < b lexicographically, all-integer metrics
    * (full hash oracle). */
  def editDistancePairs(rows: DataFrame, d: Int = 2,
      nameCol: String = "p_name"): DataFrame = {
    require(d >= 1, s"maxDist must be >= 1: $d")
    // eager snapshot: the distinct-vocabulary aggregate feeds six
    // consumers (index, probe, both short-path sides, both weight
    // joins) — snapshot once instead of re-scanning + re-aggregating
    // the corpus per consumer. Vocabulary-sized, not corpus-sized.
    val names = rows.filter(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("s")).agg(count(lit(1)).as("w"))
      .withColumn("l", length(col("s")))
      .localCheckpoint(true)

    // ---- segment path: both sides of a pair have length >= d+1 ----
    val indexed = names.filter(col("l") >= d + 1)
      .select(col("s").as("is"),
        explode(expr(
          s"""transform(sequence(0, $d), i -> named_struct(
             |  'kl', l, 'ki', i,
             |  'kseg', substring(s, ${segStart(d, "l", "i")} + 1,
             |                       ${segLen(d, "l", "i")})))""".stripMargin))
          .as("k"))
      .select(col("is"), col("k.kl"), col("k.ki"), col("k.kseg"))

    val probed = names.filter(col("l") >= d + 1)
      .select(col("s").as("rs"), col("l").as("m"),
        explode(expr(
          s"""flatten(flatten(
             |  transform(sequence(greatest(${d + 1}, l - $d), l), il ->
             |    transform(sequence(0, $d), i ->
             |      transform(
             |        sequence(greatest(0, ${segStart(d, "il", "i")} - $d),
             |                 least(l - ${segLen(d, "il", "i")},
             |                       ${segStart(d, "il", "i")} + $d)),
             |        p -> named_struct('pkl', il, 'pki', i,
             |               'pkseg', substring(s, p + 1,
             |                 ${segLen(d, "il", "i")})))))))"""
            .stripMargin)).as("k"))
      .select(col("rs"), col("m"), col("k.pkl"), col("k.pki"), col("k.pkseg"))

    val segCand = indexed.join(probed,
        col("kl") === col("pkl") && col("ki") === col("pki") &&
          col("kseg") === col("pkseg"))
      // probe covers only l <= m; equal lengths tie-break lexicographically
      // so each unordered pair surfaces exactly once before the distinct
      .filter(col("kl") < col("m") ||
        (col("kl") === col("m") && col("is") < col("rs")))
      .select(least(col("is"), col("rs")).as("a"),
        greatest(col("is"), col("rs")).as("b"))

    // ---- short path: one side shorter than d+1 chars forces the other
    // to <= 2d (ed >= |len diff|) — a bounded-universe banded cross join
    val tiny = names.filter(col("l") <= d).select(col("s").as("is"))
    val near = names.filter(col("l") <= 2 * d).select(col("s").as("rs"))
    val shortCand = tiny.crossJoin(near).filter(col("is") =!= col("rs"))
      .select(least(col("is"), col("rs")).as("a"),
        greatest(col("is"), col("rs")).as("b"))

    val verified = segCand.unionByName(shortCand).distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .filter(col("dist") <= d)

    verified
      .join(names.select(col("s").as("a"), col("w").as("wa")), Seq("a"))
      .join(names.select(col("s").as("b"), col("w").as("wb")), Seq("b"))
      .select(col("a"), col("b"), col("dist"), col("wa"), col("wb"))
  }

  /** Audit view: index-side segment keys by number of distinct strings
    * carrying them, hottest first — the skew monitor for the candidate
    * join (a key shared by k strings contributes O(k^2) candidates; on a
    * corpus where this grows, cap on this view's tail the q13 way). */
  def hotSegmentKeys(rows: DataFrame, d: Int = 2,
      nameCol: String = "p_name"): DataFrame = {
    val names = rows.filter(col(nameCol).isNotNull)
      .select(col(nameCol).as("s")).distinct()
      .withColumn("l", length(col("s")))
    names.filter(col("l") >= d + 1)
      .select(explode(expr(
        s"""transform(sequence(0, $d), i -> named_struct(
           |  'kl', l, 'ki', i,
           |  'kseg', substring(s, ${segStart(d, "l", "i")} + 1,
           |                       ${segLen(d, "l", "i")})))""".stripMargin))
        .as("k"))
      .groupBy(col("k.kl"), col("k.ki"), col("k.kseg"))
      .agg(count(lit(1)).as("n_strings"))
      .orderBy(col("n_strings").desc, col("kl"), col("ki"), col("kseg"))
  }
}
