package graft.tag

import graft.model._
import graft.text.Text
import graft.text.Text.SpanLabel

/** Deterministic tagging stages — the engine's stand-ins for the five
  * neural components (SURVEY.md §2.10), each built as emission scores +
  * constraint masks + Viterbi decode so the stage interface is identical to
  * a weights-backed scorer (SURVEY.md §7.4 item 1). All functions here are
  * pure; they run inside `mapPartitions` over broadcast lexicons.
  */
object Taggers {

  // ---- label spaces (reference event_pipeline_demo.py:62-117) ----

  /** NER tag space: O + (B-,I-)×7 entity types. */
  val NerLabels: Array[String] =
    "O" +: Ontology.EntTypes.flatMap(t => Seq(s"B-$t", s"I-$t")).toArray
  val NerB2I: Map[String, String] =
    Ontology.EntTypes.map(t => s"B-$t" -> s"I-$t").toMap

  /** Trigger tag space: O + B-×33 (B-only; I mapped back to B,
    * event_pipeline_demo.py:71-78 — single-token triggers). Note the
    * decode consequence (pinned by the q39 oracle): with B2I[B]=B,
    * bioDecode's B-reset nets a run of adjacent same-type B tags to ONE
    * span at the run's LAST token (plus iob_to_obj's end-of-sequence
    * double-emission when the run reaches the final token). */
  val TriggerLabels: Array[String] =
    "O" +: Ontology.EventTypes.map(t => s"B-$t").toArray
  val TriggerB2I: Map[String, String] =
    Ontology.EventTypes.map(t => s"B-$t" -> s"B-$t").toMap

  /** Argument tag space: O + (B-,I-)×22 roles. */
  val ArgLabels: Array[String] =
    "O" +: Ontology.ArgRoles.flatMap(r => Seq(s"B-$r", s"I-$r")).toArray
  val ArgB2I: Map[String, String] =
    Ontology.ArgRoles.map(r => s"B-$r" -> s"I-$r").toMap

  private val nerTrans = Viterbi.bioTransitions(NerLabels)
  private val trigTrans = Viterbi.bioTransitions(TriggerLabels)
  private val argTrans = Viterbi.bioTransitions(ArgLabels)

  private val nerLabelIdx: Map[String, Int] = NerLabels.zipWithIndex.toMap
  private val trigLabelIdx: Map[String, Int] = TriggerLabels.zipWithIndex.toMap
  private val argLabelIdx: Map[String, Int] = ArgLabels.zipWithIndex.toMap

  private val maxGazLen: Int = Ontology.Gazetteer.keys.map(_.length).max

  /** First tokens of the compiled-in gazetteer — lets the default NER
    * path skip the slice-and-probe loop at every position whose token
    * cannot start any entry (the common case), one Set probe instead of
    * maxLen list allocations + map lookups. */
  private val gazHeads: Set[String] = Ontology.Gazetteer.keys.map(_.head).toSet

  // ---- NER stage ----

  /** Gazetteer longest-match emissions → Viterbi → BIO tags → spans.
    * Mirrors the reference NER CRF decode path
    * (EventPipeline.py:323-330 + JsonBuilder.iob_to_obj). */
  def nerSpans(tokens: Seq[String]): Seq[NerSpan] =
    nerSpansImpl(tokens, Ontology.Gazetteer, maxGazLen, gazHeads)

  /** Same decode with an EXTERNALLY SUPPLIED gazetteer — the S8 surface:
    * the caller loads a model checkpoint (tag.Checkpoint) and broadcasts
    * the tables; this closure reads the broadcast instead of the
    * compiled-in bootstrap. */
  def nerSpansWith(tokens: Seq[String], gazetteer: Map[Seq[String], String],
      maxLen: Int): Seq[NerSpan] =
    nerSpansImpl(tokens, gazetteer, maxLen, null)

  private def nerSpansImpl(tokens: Seq[String],
      gazetteer: Map[Seq[String], String], maxLen: Int,
      heads: Set[String]): Seq[NerSpan] = {
    val n = tokens.length
    if (n == 0) return Seq.empty
    // emissions allocate lazily: a sentence with no gazetteer hit decodes
    // to the all-O path (zero emissions, first-index tie-break — the
    // exact Viterbi result), i.e. no spans, so skip decode entirely
    var em: Array[Array[Double]] = null
    var i = 0
    while (i < n) {
      if (heads == null || heads.contains(tokens(i))) {
        // longest gazetteer match starting at i
        var len = math.min(maxLen, n - i)
        var matched = false
        while (len >= 1 && !matched) {
          gazetteer.get(tokens.slice(i, i + len).toList) match {
            case Some(tpe) =>
              matched = true
              if (em == null) em = Array.fill(n, NerLabels.length)(0.0)
              em(i)(nerLabelIdx(s"B-$tpe")) = 10.0
              em(i)(0) = -1.0
              for (j <- i + 1 until i + len) {
                em(j)(nerLabelIdx(s"I-$tpe")) = 10.0
                em(j)(0) = -1.0
              }
              i += len - 1
            case None => len -= 1
          }
        }
      }
      i += 1
    }
    if (em == null) return Seq.empty
    val path = Viterbi.decode(em, nerTrans)
    val tags = path.map(NerLabels(_)).toSeq
    Text.bioDecode(tags, NerB2I).map(s => NerSpan(s.start, s.end, s.label))
  }

  // ---- trigger stage ----

  /** Trigger tagging with the P11a mask (entity positions can't be
    * triggers, EventPipeline.make_trigger_mask:169-187). B-only tags. */
  def triggerSpans(tokens: Seq[String], ner: Seq[NerSpan]): Seq[Trigger] = {
    val n = tokens.length
    if (n == 0) return Seq.empty
    val inEntity = Array.fill(n)(false)
    for (s <- ner; i <- s.start to s.end if i < n) inEntity(i) = true
    val em = Array.fill(n, TriggerLabels.length)(0.0)
    var boosted = false
    for (i <- 0 until n) {
      if (inEntity(i)) {
        // mask: only O reachable (masked_fill -1e7 analog)
        for (l <- 1 until TriggerLabels.length) em(i)(l) = Viterbi.NegInf
      } else {
        val lemma = Ontology.lemmaOf(tokens(i))
        Ontology.TriggerLexicon.get(lemma).foreach { case (tpe, _) =>
          em(i)(trigLabelIdx(s"B-$tpe")) = 10.0
          em(i)(0) = -1.0
          boosted = true
        }
      }
    }
    // no lexicon hit anywhere → the decode is the all-O path (zero/masked
    // emissions, first-index tie-break) → no spans; skip the O(n·L²) decode
    if (!boosted) return Seq.empty
    val path = Viterbi.decode(em, trigTrans)
    val tags = path.map(TriggerLabels(_)).toSeq
    Text.bioDecode(tags, TriggerB2I).map { s =>
      Trigger(s.label, Text.spanText(tokens, s.start, s.end), s.start, s.end)
    }
  }

  // ---- clause segmentation (shared by argument + relation stages) ----

  private val Delimiters: Set[String] =
    Ontology.Connectives.keySet ++ Set("that", ".", "!", "?")

  /** Segment bounds [start, end) containing position `idx`. */
  def segmentOf(tokens: Seq[String], idx: Int): (Int, Int) = {
    var s = idx
    while (s > 0 && !Delimiters.contains(tokens(s - 1).toLowerCase)) s -= 1
    var e = idx + 1
    while (e < tokens.length && !Delimiters.contains(tokens(e).toLowerCase)) e += 1
    (s, e)
  }

  // ---- argument stage (per expanded event — X1) ----

  /** Argument tagging for ONE event (the reference runs the argument model
    * once per expanded sentence-event pair, EventPipeline.py:396-416), with
    * masks P11b (only entity positions take non-O roles,
    * make_argu_cands_mask:189-214) and P11c (only roles valid for the
    * trigger type, make_valid_argu_roles_mask_by_tri:244-279 — our validity
    * table is Ontology.RoleMap). */
  def argumentSpans(tokens: Seq[String], ner: Seq[NerSpan], trigger: Trigger): Seq[Argument] = {
    val n = tokens.length
    if (n == 0) return Seq.empty
    val (segS, segE) = segmentOf(tokens, trigger.start)
    val ents = ner.filter(s => s.start >= segS && s.end < segE)
    val (subjRole, objRole) =
      Ontology.RoleMap.getOrElse(trigger.eventType, ("Entity", "Entity"))
    val locRole = Ontology.locRoleOf(trigger.eventType)
    // deterministic role assignment with ACE-style entity-type constraints
    // (Ontology.RoleEntityTypes — reproduces the reference's documented
    // demo outputs, BETTER/joint/README.md:17 + views.py:20-52):
    //   subject: LAST type-compatible entity before the trigger;
    //   object:  FIRST type-compatible entity after the trigger that is
    //            not a preposition-marked location ("in X"/"at X");
    //   location: LAST {GPE,LOC,FAC} entity after the trigger (excluding
    //            the chosen object) — the head of a trailing locative NP
    //            ("the Persian Gulf region" -> "region").
    val subj = ents.filter(s => s.end < trigger.start &&
      Ontology.compatible(subjRole, s.label)).lastOption
    val isPrepLoc = (s: NerSpan) =>
      s.start > 0 && {
        val p = tokens(s.start - 1).toLowerCase
        p == "in" || p == "at"
      }
    val obj = ents.find(s => s.start > trigger.end &&
      Ontology.compatible(objRole, s.label) && !isPrepLoc(s))
    val loc = ents.filter(s => s.start > trigger.end &&
      Ontology.compatible(locRole, s.label) && !obj.contains(s)).lastOption

    val wanted: Seq[(NerSpan, String)] =
      subj.map(_ -> subjRole).toSeq ++
        obj.map(_ -> objRole).toSeq ++
        loc.map(_ -> locRole).toSeq

    // no role assignment → zero/masked emissions decode to the all-O path
    // (first-index tie-break) → no argument spans; skip the O(n·L²)
    // decode and its n×L emission/backpointer allocations — this runs
    // once per EXPANDED event, the pipeline's hottest inner call
    if (wanted.isEmpty) return Seq.empty

    // emissions with masks
    val em = Array.fill(n, ArgLabels.length)(0.0)
    val inEntity = Array.fill(n)(false)
    for (s <- ner; i <- s.start to s.end if i < n) inEntity(i) = true
    val validRoles = Set(subjRole, objRole, locRole)
    for (i <- 0 until n) {
      if (!inEntity(i)) {
        for (l <- 1 until ArgLabels.length) em(i)(l) = Viterbi.NegInf // P11b
      } else {
        for (l <- 1 until ArgLabels.length) {
          val role = ArgLabels(l).substring(2)
          if (!validRoles.contains(role)) em(i)(l) = Viterbi.NegInf // P11c
        }
      }
    }
    for ((s, role) <- wanted) {
      em(s.start)(argLabelIdx(s"B-$role")) = 10.0
      em(s.start)(0) = -1.0
      for (i <- s.start + 1 to s.end) {
        em(i)(argLabelIdx(s"I-$role")) = 10.0
        em(i)(0) = -1.0
      }
    }
    val path = Viterbi.decode(em, argTrans)
    val tags = path.map(ArgLabels(_)).toSeq
    Text.bioDecode(tags, ArgB2I).map { s =>
      Argument(s.label, Text.spanText(tokens, s.start, s.end), s.start, s.end)
    }
  }

  /** Event assembly (P5, JsonBuilder.convert_out_dicts_to_event_dicts:54-84):
    * event_type := FIRST trigger's label; events with no trigger dropped.
    * Duration left blank here — the reference blanks durations then joins
    * them back (main.py:173-175, 209-215 — J2). */
  def assembleEvents(tokens: Seq[String], ner: Seq[NerSpan],
      triggers: Seq[Trigger]): Seq[Event] =
    triggers.map { t =>
      Event(t.eventType, Seq(t), argumentSpans(tokens, ner, t), "", speculation = false)
    }

  // ---- TempRel stage pieces ----

  /** Per-token event-head evidence channels; downstream A1 aggregates
    * mean(prob) > 0.5 (joint_model.py:342-369). Two channels mirror the
    * duplicate-key structure of the reference's per-batch probability
    * lists. */
  def headEvidence(token: String): Seq[Double] = {
    val lemma = Ontology.lemmaOf(token)
    val lower = token.toLowerCase
    val lexical =
      if (Ontology.TriggerLexicon.contains(lemma) ||
        Ontology.TempRelOnlyVerbs.contains(lemma)) 0.9
      else 0.1
    val morphological =
      if (Ontology.SurfaceToLemma.contains(lower)) 0.8
      else if (lower.endsWith("ed") && lower.length > 4) 0.6
      else 0.2
    Seq(lexical, morphological)
  }

  /** Relation label for an ordered head pair: the first temporal connective
    * strictly between them decides (stand-in for the relation head,
    * joint_model.py:164-181); no connective => NONE
    * (the NONE seed label, joint_model.py:431). */
  def relationLabel(tokens: Seq[String], left: Int, right: Int): String = {
    var i = left + 1
    while (i < right) {
      val c = tokens(i).toLowerCase
      Ontology.Connectives.get(c) match {
        case Some(l) => return l
        case None =>
      }
      i += 1
    }
    "NONE"
  }

  // ---- negation stage ----

  /** Cue labels per token: 0=affix, 1=normal cue, 2=multiword part,
    * 3=not a cue (NegationDetection/README.md:5-9), including the manual
    * ['not'] override (P8, train.py:1777,1798-1805). */
  def negationCues(tokens: Seq[String]): Seq[Int] = {
    val n = tokens.length
    val out = Array.fill(n)(3)
    // multiword cues first
    for (mw <- Ontology.MultiwordCues) {
      val L = mw.length
      var i = 0
      while (i + L <= n) {
        if (tokens.slice(i, i + L).map(_.toLowerCase) == mw) {
          for (j <- i until i + L) out(j) = 2
          i += L
        } else i += 1
      }
    }
    for (i <- 0 until n if out(i) == 3) {
      val lower = tokens(i).toLowerCase
      if (Ontology.NegationCues.contains(lower)) out(i) = 1
      else if (Ontology.AffixNegations.contains(lower)) out(i) = 0
    }
    // P8 manual override
    for (i <- 0 until n if Ontology.ManualCueOverride.contains(tokens(i).toLowerCase))
      out(i) = 1
    out.toSeq
  }

  /** Scope: binary per token; from the first cue to sentence end, excluding
    * terminal punctuation (rule-based stand-in for the XLNet scope model,
    * train.py:893-909). */
  def negationScope(tokens: Seq[String], cues: Seq[Int]): Seq[Int] = {
    val first = cues.indexWhere(c => c == 1 || c == 2 || c == 0)
    if (first < 0) Seq.fill(tokens.length)(0)
    else tokens.indices.map { i =>
      if (i >= first && tokens(i) != "." && tokens(i) != "!" && tokens(i) != "?") 1 else 0
    }
  }

  /** Duration classification per trigger (stand-in for DurationAPI.pred,
    * inference_api.py:70-101): lexicon lookup on the trigger lemma; idx →
    * label via the fixed 11-array (P10, utils_duration.py:9). Returns ""
    * (blank) when the lexicon has no entry — matching the reference's
    * unmatched-duration blank (main.py:173-175). */
  def durationOf(triggerText: String): String = {
    val lemma = Ontology.lemmaOf(triggerText.split(" ").head)
    Ontology.TriggerLexicon.get(lemma).map { case (_, d) =>
      val idx = Ontology.DurationClasses.indexOf(d)
      Ontology.DurationClasses(idx) // idx→label projection (P10)
    }.getOrElse("")
  }
}
