package graft.corpus

import scala.util.Random
import scala.util.hashing.MurmurHash3
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model._
import graft.tag.Ontology

/** Deterministic synthetic corpus of source-code files whose comments carry
  * natural-language event sentences (FIXTURES.md §1).
  *
  * The north-rule input is an Iceberg-style table `(repo, path, commit,
  * lang, content)` of source-code repositories (BASELINE.json input_hint);
  * the reference's NLP material is raw English text
  * (/root/reference/project/APIs/test_on_raw_text.py:76-95). This generator
  * bridges the two: each synthetic file embeds sentences shaped like the
  * reference demo cases (main.py:246-252, event_pipeline_demo.py:177-183)
  * in its comment lines.
  *
  * Everything is seeded per (repo, path) — content is a pure function of
  * the key, independent of partitioning, so the same corpus can be
  * regenerated for golden tests (`goldSentences`) and the two-parallelism
  * benchmark runs see byte-identical input.
  */
object Synth {

  /** Gold annotation for one generated sentence — same shape as the
    * reference's per-sentence record (SURVEY.md §1.1). */
  case class GoldSentence(
      lineNum: Int,
      senNum: Int,
      tokens: Vector[String],
      events: Seq[Event],
      ner: Seq[NerSpan],
      relations: Seq[Relation],
      negationCue: Seq[Int],
      negationScope: Seq[Int])

  // ---- vocabulary pools (all tokenizer-stable surface forms) ----

  private val TimeAdverbs = Vector(
    "Yesterday", "Today", "Meanwhile", "Later", "Earlier", "Eventually",
    "Recently", "Finally")

  /** (tokens, entType). Subjects: PER/ORG; objects: PER/ORG/VEH/WEA/FAC;
    * places: GPE/LOC. All present in Ontology.Gazetteer. */
  private val Subjects: Vector[(Vector[String], String)] = Vector(
    (Vector("George", "Pataki"), "PER"),
    (Vector("Mary", "Jones"), "PER"),
    (Vector("John", "Smith"), "PER"),
    (Vector("Elena", "Garcia"), "PER"),
    (Vector("Wei", "Chen"), "PER"),
    (Vector("Amir", "Hassan"), "PER"),
    (Vector("the", "president"), "PER"),
    (Vector("the", "governor"), "PER"),
    (Vector("the", "senator"), "PER"),
    (Vector("the", "Army"), "ORG"),
    (Vector("the", "Senate"), "ORG"),
    (Vector("Acme", "Corp"), "ORG"),
    (Vector("Globex", "Inc"), "ORG"),
    (Vector("the", "court"), "ORG"),
    (Vector("the", "police"), "ORG"))

  private val Objects: Vector[(Vector[String], String)] = Vector(
    (Vector("Mary", "Jones"), "PER"),
    (Vector("John", "Smith"), "PER"),
    (Vector("Wei", "Chen"), "PER"),
    (Vector("Amir", "Hassan"), "PER"),
    (Vector("Acme", "Corp"), "ORG"),
    (Vector("Globex", "Inc"), "ORG"),
    (Vector("the", "convoy"), "VEH"),
    (Vector("a", "truck"), "VEH"),
    (Vector("a", "rifle"), "WEA"),
    (Vector("the", "missile"), "WEA"),
    (Vector("the", "airport"), "FAC"),
    (Vector("the", "bridge"), "FAC"),
    (Vector("the", "hospital"), "FAC"))

  /** Short-form coreferent mentions (exercise canonicalization): last names
    * of the PER pool. Must also be in the gazetteer so the P11b mask admits
    * them as arguments. */
  private val ShortForms: Map[String, Vector[String]] = Map(
    "George Pataki" -> Vector("Pataki"),
    "Mary Jones" -> Vector("Jones"),
    "John Smith" -> Vector("Smith"),
    "Elena Garcia" -> Vector("Garcia"),
    "Wei Chen" -> Vector("Chen"),
    "Amir Hassan" -> Vector("Hassan"))

  private val Places: Vector[(Vector[String], String)] = Vector(
    (Vector("New", "York"), "GPE"),
    (Vector("Baghdad"), "GPE"),
    (Vector("France"), "GPE"),
    (Vector("Texas"), "GPE"),
    (Vector("Kabul"), "GPE"),
    (Vector("California"), "GPE"),
    (Vector("the", "river"), "LOC"),
    (Vector("the", "border"), "LOC"))

  /** Trigger lemmas usable in generation (past form exists). The hot lemma
    * "attack" is over-sampled via `skew` — the adversarial head-trigger
    * distribution the salted blocking join must survive (SURVEY.md §7.4). */
  private val TriggerPool: Vector[String] =
    Ontology.TriggerLexicon.keys.filter(Ontology.PastForms.contains).toVector.sorted

  private val TempRelVerbPool: Vector[String] =
    Ontology.TempRelOnlyVerbs.filter(Ontology.PastForms.contains).toVector.sorted

  private val RelConnectives = Vector("before", "after", "while", "during", "when", "and")

  /** Fraction of trigger draws forced to the hot lemma. */
  val HotLemma = "attack"
  val SkewFraction = 0.25

  // ---- clause composer ----

  private case class Clause(
      tokens: Vector[String],
      trigIdx: Int,
      trigLemma: String,
      eventType: String, // "" => TempRel-only head
      args: Seq[Argument],
      ner: Seq[NerSpan],
      cueIdx: Int, // -1 if not negated
      cueLabel: Int) // 1 = normal cue, 0 = affixal (README.md:5-9)

  private def pickTrigger(rng: Random): String =
    if (rng.nextDouble() < SkewFraction) HotLemma
    else TriggerPool(rng.nextInt(TriggerPool.length))

  /** Pool filtered to entity types admissible for `role`
    * (Ontology.RoleEntityTypes) — keeps gold args reproducible by the
    * engine's type-constrained role assigner. */
  private def poolFor(pool: Vector[(Vector[String], String)],
      role: String): Vector[(Vector[String], String)] = {
    val f = pool.filter { case (_, t) => Ontology.compatible(role, t) }
    if (f.nonEmpty) f else pool
  }

  private def composeClause(rng: Random, offset: Int, negated: Boolean,
      tempRelOnly: Boolean): Clause = {
    // role-aware pool selection must not disturb the draw sequence for
    // tempRelOnly clauses, so draw AFTER the branch for typed clauses
    if (tempRelOnly) {
      val (subjToks, _) = Subjects(rng.nextInt(Subjects.length))
      // "<subj> <temprelVerbPast>" — an event head BETTER won't type
      val lemma = TempRelVerbPool(rng.nextInt(TempRelVerbPool.length))
      val verb = Ontology.PastForms(lemma)
      val tokens = subjToks ++ Vector(verb)
      val trigIdx = offset + subjToks.length
      val ner = Seq(NerSpan(offset, offset + subjToks.length - 1,
        entTypeOf(subjToks)))
      Clause(tokens, trigIdx, lemma, "", Seq.empty, ner, -1, 3)
    } else {
      val lemma = pickTrigger(rng)
      val (eventType, _) = Ontology.TriggerLexicon(lemma)
      val (subjRole, objRole) = Ontology.RoleMap(eventType)
      val locRole = Ontology.locRoleOf(eventType)
      // pools restricted to role-admissible entity types, mirroring the
      // engine's type-constrained assigner (Taggers.argumentSpans)
      val subjPool = poolFor(Subjects, subjRole)
      val (subjToks, _) = subjPool(rng.nextInt(subjPool.length))
      val subjFull = subjToks.mkString(" ")
      // sometimes use a short coreferent form for PER objects
      val objPool = poolFor(Objects, objRole)
      val (objToksFull, _) = objPool(rng.nextInt(objPool.length))
      val objToks =
        ShortForms.get(objToksFull.mkString(" ")) match {
          case Some(sf) if rng.nextDouble() < 0.4 => sf
          case _ => objToksFull
        }
      val usePlace = rng.nextDouble() < 0.5
      val place = if (usePlace) Some(Places(rng.nextInt(Places.length))) else None
      // two negation shapes: a normal cue ("did not <base>", label 1) and
      // an affixal cue ("was unable to <base>", label 0)
      val affixal = negated && rng.nextDouble() < 0.4
      val verbToks: Vector[String] =
        if (affixal) Vector("was", "unable", "to", lemma)
        else if (negated) Vector("did", "not", lemma) // base form after "not"
        else Vector(Ontology.PastForms(lemma))
      val trigLocal = subjToks.length + (if (affixal) 3 else if (negated) 2 else 0)
      val pre = subjToks ++ verbToks
      val afterVerb = pre.length
      val placePart: Vector[String] =
        place.map { case (pt, _) => Vector("in") ++ pt }.getOrElse(Vector.empty)
      val tokens = pre ++ objToks ++ placePart
      val trigIdx = offset + trigLocal
      val objStart = offset + afterVerb
      val objEnd = objStart + objToks.length - 1
      val args = Seq(
        Argument(subjRole, subjFull, offset, offset + subjToks.length - 1),
        Argument(objRole, objToks.mkString(" "), objStart, objEnd)) ++
        place.toSeq.map { case (pt, _) =>
          val ps = objEnd + 2 // skip "in"
          Argument(locRole, pt.mkString(" "), ps, ps + pt.length - 1)
        }
      val ner = Seq(
        NerSpan(offset, offset + subjToks.length - 1, entTypeOf(subjToks)),
        NerSpan(objStart, objEnd, entTypeOf(objToks))) ++
        place.toSeq.map { case (pt, tpe) =>
          val ps = objEnd + 2
          NerSpan(ps, ps + pt.length - 1, tpe)
        }
      val cueIdx = if (negated) offset + subjToks.length + 1 else -1
      val cueLabel = if (affixal) 0 else 1
      Clause(tokens, trigIdx, lemma, eventType, args, ner, cueIdx, cueLabel)
    }
  }

  private def entTypeOf(toks: Vector[String]): String =
    Ontology.Gazetteer.getOrElse(toks.toList, "PER")

  // ---- sentence composer ----

  /** Compose one gold sentence. Shapes (SURVEY.md §5 fixture plan):
    * 0: time + clause;
    * 1: time + clause1 + connective + clause2 (temporal relation);
    * 2: time + negated clause (cue/scope/speculation);
    * 3: time + temprel-only clause + clause2 (U1 union path). */
  def composeSentence(rng: Random, lineNum: Int, senNum: Int): GoldSentence = {
    val shape = {
      val r = rng.nextDouble()
      if (r < 0.40) 0 else if (r < 0.70) 1 else if (r < 0.85) 2 else 3
    }
    val time = TimeAdverbs(rng.nextInt(TimeAdverbs.length))
    var tokens = Vector(time)
    var events = Vector.empty[Event]
    var ner = Vector.empty[NerSpan]
    var relations = Vector.empty[Relation]
    var cueIdx = -1
    var cueLabel = 3
    var trigIdxs = Vector.empty[(Int, String, String)] // (idx, lemma, type)

    def addClause(c: Clause): Unit = {
      tokens = tokens ++ c.tokens
      ner = ner ++ c.ner
      trigIdxs = trigIdxs :+ ((c.trigIdx, c.trigLemma, c.eventType))
      if (c.eventType.nonEmpty) {
        val dur = Ontology.TriggerLexicon(c.trigLemma)._2
        val speculated = c.cueIdx >= 0
        val trigText = tokens(c.trigIdx)
        events = events :+ Event(c.eventType,
          Seq(Trigger(c.eventType, trigText, c.trigIdx, c.trigIdx)),
          c.args, dur, speculated)
      }
      if (c.cueIdx >= 0) { cueIdx = c.cueIdx; cueLabel = c.cueLabel }
    }

    shape match {
      case 0 =>
        addClause(composeClause(rng, tokens.length, negated = false, tempRelOnly = false))
      case 1 =>
        val c1 = composeClause(rng, tokens.length, negated = false, tempRelOnly = false)
        addClause(c1)
        val conn = RelConnectives(rng.nextInt(RelConnectives.length))
        tokens = tokens :+ conn
        val c2 = composeClause(rng, tokens.length, negated = false, tempRelOnly = false)
        addClause(c2)
        val label = Ontology.Connectives(conn)
        relations = relations :+ Relation(c1.trigIdx, c2.trigIdx, label)
      case 2 =>
        addClause(composeClause(rng, tokens.length, negated = true, tempRelOnly = false))
      case 3 =>
        // TempRel-only head + real connective + typed clause: the U1-injected
        // typeless event becomes an observable relation endpoint
        val c1 = composeClause(rng, tokens.length, negated = false, tempRelOnly = true)
        addClause(c1)
        val conn = RelConnectives(rng.nextInt(4)) // before/after/while/during
        tokens = tokens :+ conn
        val c2 = composeClause(rng, tokens.length, negated = false, tempRelOnly = false)
        addClause(c2)
        relations = relations :+ Relation(c1.trigIdx, c2.trigIdx,
          Ontology.Connectives(conn))
    }
    tokens = tokens :+ "."

    // TempRel-only heads with no type: injected as typeless events by U1
    // (reference main.py:152-167) — gold mirrors that injection.
    for ((idx, _, tpe) <- trigIdxs if tpe.isEmpty) {
      events = events :+ Event("",
        Seq(Trigger("", tokens(idx), idx, idx)), Seq.empty, "", speculation = false)
    }

    // negation cue/scope arrays (cue labels: README.md:5-9; scope binary)
    val n = tokens.length
    val cue = Vector.tabulate(n)(i => if (i == cueIdx) cueLabel else 3)
    val scope =
      if (cueIdx < 0) Vector.fill(n)(0)
      else Vector.tabulate(n)(i => if (i >= cueIdx && tokens(i) != ".") 1 else 0)

    // relations: keep only VAGUE-or-better gold labels; the P6 filter
    // (drop VAGUE/NONE) is applied by the PIPELINE, so gold keeps them here
    // and the triple derivation filters identically.
    GoldSentence(lineNum, senNum, tokens, events, ner, relations, cue, scope)
  }

  // ---- detokenizer (inverse of Text.tokenize for our vocabulary) ----

  def detokenize(tokens: Seq[String]): String = {
    val sb = new StringBuilder
    for (t <- tokens) {
      if (sb.nonEmpty && (t == "." || t == "," || t == "!" || t == "?")) sb.append(t)
      else {
        if (sb.nonEmpty) sb.append(' ')
        sb.append(t)
      }
    }
    sb.toString
  }

  // ---- file-level generation ----

  /** Bump whenever the deterministic corpus CONTENT changes for the same
    * arguments (e.g. the round-4 fileSeed separator change): the resume
    * signature (Main.inputSignature) folds this in, so checkpointed
    * stages committed by an older generator are invalidated instead of
    * silently resuming with stale content. */
  val GeneratorVersion = 2

  def fileSeed(repo: String, path: String): Long = {
    val h1 = MurmurHash3.stringHash(repo + "\u0000" + path, 0x9747b28c)
    val h2 = MurmurHash3.stringHash(path + "\u0000" + repo, 0x85ebca6b)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  private val Langs = Vector("scala", "python", "markdown")

  def commentPrefix(lang: String): String = lang match {
    case "scala" => "// "
    case "python" => "# "
    case _ => ""
  }

  /** Gold sentences for one file — the generator AND the test goldens call
    * this; it is a pure function of (repo, path, sentsPerFile). */
  def goldSentences(repo: String, path: String, sentsPerFile: Int): Seq[GoldSentence] = {
    val rng = new Random(fileSeed(repo, path))
    // sentences are grouped 1-2 per comment line (exercises sentSplit)
    var line = 0
    var produced = 0
    val out = Vector.newBuilder[GoldSentence]
    while (produced < sentsPerFile) {
      val perLine = math.min(1 + rng.nextInt(2), sentsPerFile - produced)
      for (s <- 0 until perLine) {
        out += composeSentence(rng, line, s)
        produced += 1
      }
      line += 2 // each comment line is followed by one code line
    }
    out.result()
  }

  /** Assemble file content: comment lines with the sentences, interleaved
    * with code lines (per lang). Pure function of the key. */
  def contentFor(repo: String, path: String, lang: String, sentsPerFile: Int): String = {
    val golds = goldSentences(repo, path, sentsPerFile)
    val byLine = golds.groupBy(_.lineNum).toSeq.sortBy(_._1)
    val prefix = commentPrefix(lang)
    val sb = new StringBuilder
    var nextCode = 0
    var emitted = 0
    for ((lineNum, sents) <- byLine) {
      while (emitted < lineNum) {
        // filler code line (never sentence material)
        lang match {
          case "scala" => sb.append(s"def f$nextCode(x: Int): Int = x + $nextCode\n")
          case "python" => sb.append(s"def f$nextCode(x): return x + $nextCode\n")
          case _ => sb.append(s"    code_block_$nextCode\n")
        }
        nextCode += 1
        emitted += 1
      }
      val text = sents.sortBy(_.senNum).map(g => detokenize(g.tokens)).mkString(" ")
      sb.append(prefix).append(text).append('\n')
      emitted += 1
    }
    sb.toString
  }

  def repoOf(i: Long): String = s"repo${i % 50}"
  def pathOf(i: Long): String = {
    val dir = (i / 50) % 20
    s"src/dir$dir/file$i"
  }

  def sourceFile(i: Long, sentsPerFile: Int): SourceFile = {
    val repo = repoOf(i)
    val lang = Langs((i % Langs.length).toInt)
    val ext = lang match {
      case "scala" => ".scala"; case "python" => ".py"; case _ => ".md"
    }
    val path = pathOf(i) + ext
    val content = contentFor(repo, path, lang, sentsPerFile)
    val commit = f"${fileSeed(repo, path) & Long.MaxValue}%016x"
    SourceFile(repo, path, commit, lang, content)
  }

  /** Distributed deterministic corpus: `spark.range` → pure map. Scales to
    * any nFiles without driver-side materialization. */
  def corpus(spark: SparkSession, nFiles: Long, sentsPerFile: Int): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(nFiles).map(i => sourceFile(i, sentsPerFile))
  }

  /** Corpus size per driver scale-factor directory (TESTDATA.md scheme). */
  def sizeForSfDir(sfDir: String): (Long, Int) = {
    if (sfDir.contains("0.001")) (60L, 6)
    else if (sfDir.contains("0.01")) (600L, 6)
    else if (sfDir.contains("0.1")) (6000L, 8)
    else (600L, 6)
  }
}
