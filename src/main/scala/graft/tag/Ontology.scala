package graft.tag

/** The fixed label vocabulary of the KG (SURVEY.md §1.4) plus the
  * deterministic lexicons that stand in for the reference's (absent) model
  * checkpoints — see SURVEY.md §7.4 item 1: the reference's weights are not
  * in its repo, so each tagger is a deterministic featurized scorer whose
  * DECODE semantics (BIO rules, masks, merges, filters) exactly mirror the
  * reference code, with lexicons playing the role of weights. The lexicons
  * are broadcast to executors (reference loads checkpoints once per process,
  * EventPipeline.py:635-665 → SURVEY.md S8).
  */
object Ontology {

  /** 33 ACE event types — reference
    * generate_data/uw_json_to_pkl_ace.py:11-43. */
  val EventTypes: Seq[String] = Seq(
    "Business:Declare-Bankruptcy", "Business:End-Org", "Business:Merge-Org",
    "Business:Start-Org", "Conflict:Attack", "Conflict:Demonstrate",
    "Contact:Meet", "Contact:Phone-Write", "Justice:Acquit",
    "Justice:Appeal", "Justice:Arrest-Jail", "Justice:Charge-Indict",
    "Justice:Convict", "Justice:Execute", "Justice:Extradite",
    "Justice:Fine", "Justice:Pardon", "Justice:Release-Parole",
    "Justice:Sentence", "Justice:Sue", "Justice:Trial-Hearing",
    "Life:Be-Born", "Life:Die", "Life:Divorce", "Life:Injure", "Life:Marry",
    "Movement:Transport", "Personnel:Elect", "Personnel:End-Position",
    "Personnel:Nominate", "Personnel:Start-Position",
    "Transaction:Transfer-Money", "Transaction:Transfer-Ownership")

  /** 22 argument roles — uw_json_to_pkl_ace.py:45-66. */
  val ArgRoles: Seq[String] = Seq(
    "Vehicle", "Attacker", "Prosecutor", "Victim", "Beneficiary", "Entity",
    "Org", "Adjudicator", "Target", "Artifact", "Instrument", "Giver",
    "Origin", "Defendant", "Buyer", "Agent", "Person", "Place", "Plaintiff",
    "Destination", "Seller", "Recipient")

  /** 7 entity types — uw_json_to_pkl_ace.py:68-74. */
  val EntTypes: Seq[String] = Seq("ORG", "WEA", "VEH", "GPE", "LOC", "FAC", "PER")

  /** 11 duration classes — component/Duration/utils_duration.py:9. */
  val DurationClasses: Seq[String] = Seq(
    "inst", "secs", "mins", "hours", "days", "weeks", "months", "years",
    "decades", "cents", "forever")

  /** Temporal relation labels — joint_model.py:18-30; demo config is MATRES
    * (VAGUE/BEFORE/AFTER/SIMULTANEOUS + NONE), with VAGUE/NONE filtered out
    * downstream (main.py:184-186). */
  val TempRelLabels: Seq[String] =
    Seq("VAGUE", "BEFORE", "AFTER", "SIMULTANEOUS", "INCLUDES", "IS_INCLUDED", "NONE")

  /** Trigger lexicon: lemma -> (ACE event type, duration class).
    * Stand-in for the BETTER trigger tagger weights + the Duration model.
    * Each lemma is unambiguous (always a trigger when outside an entity —
    * the P11a mask), which is what makes the fixture-level P/R bound
    * achievable by construction (SURVEY.md §7.4). */
  val TriggerLexicon: Map[String, (String, String)] = Map(
    "tour" -> ("Movement:Transport", "days"),
    "travel" -> ("Movement:Transport", "days"),
    "deploy" -> ("Movement:Transport", "weeks"),
    "arrive" -> ("Movement:Transport", "hours"),
    "attack" -> ("Conflict:Attack", "mins"),
    "bomb" -> ("Conflict:Attack", "secs"),
    "invade" -> ("Conflict:Attack", "weeks"),
    "protest" -> ("Conflict:Demonstrate", "hours"),
    "march" -> ("Conflict:Demonstrate", "hours"),
    "meet" -> ("Contact:Meet", "hours"),
    "visit" -> ("Contact:Meet", "days"),
    "call" -> ("Contact:Phone-Write", "mins"),
    "write" -> ("Contact:Phone-Write", "mins"),
    "acquit" -> ("Justice:Acquit", "inst"),
    "appeal" -> ("Justice:Appeal", "months"),
    "arrest" -> ("Justice:Arrest-Jail", "mins"),
    "jail" -> ("Justice:Arrest-Jail", "years"),
    "indict" -> ("Justice:Charge-Indict", "inst"),
    "charge" -> ("Justice:Charge-Indict", "inst"),
    "convict" -> ("Justice:Convict", "inst"),
    "execute" -> ("Justice:Execute", "inst"),
    "extradite" -> ("Justice:Extradite", "days"),
    "fine" -> ("Justice:Fine", "inst"),
    "pardon" -> ("Justice:Pardon", "inst"),
    "parole" -> ("Justice:Release-Parole", "inst"),
    "sentence" -> ("Justice:Sentence", "inst"),
    "sue" -> ("Justice:Sue", "months"),
    "testify" -> ("Justice:Trial-Hearing", "hours"),
    "born" -> ("Life:Be-Born", "inst"),
    "die" -> ("Life:Die", "inst"),
    "perish" -> ("Life:Die", "inst"),
    "divorce" -> ("Life:Divorce", "inst"),
    "injure" -> ("Life:Injure", "inst"),
    "wound" -> ("Life:Injure", "inst"),
    "marry" -> ("Life:Marry", "hours"),
    "wed" -> ("Life:Marry", "hours"),
    "elect" -> ("Personnel:Elect", "inst"),
    "resign" -> ("Personnel:End-Position", "inst"),
    "retire" -> ("Personnel:End-Position", "inst"),
    "nominate" -> ("Personnel:Nominate", "inst"),
    "appoint" -> ("Personnel:Start-Position", "inst"),
    "hire" -> ("Personnel:Start-Position", "inst"),
    "pay" -> ("Transaction:Transfer-Money", "inst"),
    "donate" -> ("Transaction:Transfer-Money", "inst"),
    "buy" -> ("Transaction:Transfer-Ownership", "inst"),
    "sell" -> ("Transaction:Transfer-Ownership", "inst"),
    "acquire" -> ("Transaction:Transfer-Ownership", "weeks"),
    "found" -> ("Business:Start-Org", "years"),
    "launch" -> ("Business:Start-Org", "months"),
    "merge" -> ("Business:Merge-Org", "months"),
    "dissolve" -> ("Business:End-Org", "inst"),
    "bankrupt" -> ("Business:Declare-Bankruptcy", "inst"))

  /** Verbs the TempRel stage detects as event heads that the BETTER-style
    * trigger lexicon does NOT cover — these exercise the U1 union path
    * (non-contained TempRel events injected as typeless events,
    * main.py:152-167). */
  val TempRelOnlyVerbs: Set[String] = Set(
    "say", "announce", "report", "begin", "continue", "end", "happen",
    "expect", "plan", "decide", "return", "leave",
    // "considering" — the speculation demo head (main.py:249-252 input,
    // speculation rule main.py:226-230). Deliberately NOT in PastForms,
    // so the synthetic-corpus verb pool (which filters on PastForms) is
    // unchanged.
    "consider")

  /** Subject / object / place role per event type — the deterministic
    * stand-in for the trigger-type→valid-roles map the reference loads from
    * `all_uw.comb.pkl` (event_pipeline_demo.py:120-140, mask P11c). */
  val RoleMap: Map[String, (String, String)] = Map(
    // eventType -> (subjectRole, objectRole); the location role (LocRole)
    // is valid everywhere. Transport binds Artifact on BOTH sides: the
    // reference's own documented outputs assign Artifact to the moved
    // entity whether it sits in subject position ("George Pataki toured",
    // views.py:32-36) or object position ("deploy ... soldiers",
    // BETTER/joint/README.md:17).
    "Movement:Transport" -> ("Artifact", "Artifact"),
    "Conflict:Attack" -> ("Attacker", "Target"),
    "Conflict:Demonstrate" -> ("Entity", "Place"),
    "Contact:Meet" -> ("Entity", "Entity"),
    "Contact:Phone-Write" -> ("Entity", "Entity"),
    "Justice:Acquit" -> ("Adjudicator", "Defendant"),
    "Justice:Appeal" -> ("Defendant", "Adjudicator"),
    "Justice:Arrest-Jail" -> ("Agent", "Person"),
    "Justice:Charge-Indict" -> ("Prosecutor", "Defendant"),
    "Justice:Convict" -> ("Adjudicator", "Defendant"),
    "Justice:Execute" -> ("Agent", "Person"),
    "Justice:Extradite" -> ("Agent", "Person"),
    "Justice:Fine" -> ("Adjudicator", "Entity"),
    "Justice:Pardon" -> ("Adjudicator", "Defendant"),
    "Justice:Release-Parole" -> ("Entity", "Person"),
    "Justice:Sentence" -> ("Adjudicator", "Defendant"),
    "Justice:Sue" -> ("Plaintiff", "Defendant"),
    "Justice:Trial-Hearing" -> ("Prosecutor", "Defendant"),
    "Life:Be-Born" -> ("Person", "Place"),
    "Life:Die" -> ("Agent", "Victim"),
    "Life:Divorce" -> ("Person", "Person"),
    "Life:Injure" -> ("Agent", "Victim"),
    "Life:Marry" -> ("Person", "Person"),
    "Personnel:Elect" -> ("Entity", "Person"),
    "Personnel:End-Position" -> ("Person", "Entity"),
    "Personnel:Nominate" -> ("Agent", "Person"),
    "Personnel:Start-Position" -> ("Entity", "Person"),
    "Transaction:Transfer-Money" -> ("Giver", "Recipient"),
    "Transaction:Transfer-Ownership" -> ("Buyer", "Artifact"),
    "Business:Start-Org" -> ("Agent", "Org"),
    "Business:Merge-Org" -> ("Org", "Org"),
    "Business:End-Org" -> ("Agent", "Org"),
    "Business:Declare-Bankruptcy" -> ("Org", "Place"))

  /** Role -> admissible entity types (ACE-style argument-type constraints,
    * the public ACE2005 annotation-guideline restrictions the reference's
    * argument model learns implicitly). Roles absent from the table are
    * unrestricted. Drives both the deterministic role assigner
    * (Taggers.argumentSpans) and the synthetic-corpus composer, so gold
    * and engine agree by construction. */
  val RoleEntityTypes: Map[String, Set[String]] = Map(
    "Artifact" -> Set("PER", "VEH", "WEA"),
    "Destination" -> Set("GPE", "LOC", "FAC"),
    "Origin" -> Set("GPE", "LOC", "FAC"),
    "Place" -> Set("GPE", "LOC", "FAC"))

  def compatible(role: String, entType: String): Boolean =
    RoleEntityTypes.get(role).forall(_.contains(entType))

  /** Location role per event type (default "Place"): Transport events
    * take a Destination (BETTER/joint/README.md:17 — "region" ->
    * Destination; views.py:37-41 — "counties" -> Destination). */
  val LocRole: Map[String, String] = Map(
    "Movement:Transport" -> "Destination")

  def locRoleOf(eventType: String): String =
    LocRole.getOrElse(eventType, "Place")

  /** Entity gazetteer: multi-token phrase -> entity type. Stand-in for the
    * NER tagger weights (bert-large-cased+CRF, event_pipeline_demo.py:142-
    * 150). Longest-match-wins at tagging time. */
  val Gazetteer: Map[Seq[String], String] = Map(
    Seq("George", "Pataki") -> "PER",
    Seq("Mary", "Jones") -> "PER",
    Seq("John", "Smith") -> "PER",
    Seq("Elena", "Garcia") -> "PER",
    Seq("Wei", "Chen") -> "PER",
    Seq("Amir", "Hassan") -> "PER",
    Seq("the", "president") -> "PER",
    Seq("the", "governor") -> "PER",
    Seq("the", "senator") -> "PER",
    Seq("New", "York") -> "GPE",
    Seq("Baghdad") -> "GPE",
    Seq("France") -> "GPE",
    Seq("Texas") -> "GPE",
    Seq("Kabul") -> "GPE",
    Seq("California") -> "GPE",
    Seq("the", "Army") -> "ORG",
    Seq("the", "Senate") -> "ORG",
    Seq("Acme", "Corp") -> "ORG",
    Seq("Globex", "Inc") -> "ORG",
    Seq("the", "court") -> "ORG",
    Seq("the", "police") -> "ORG",
    Seq("the", "airport") -> "FAC",
    Seq("the", "bridge") -> "FAC",
    Seq("the", "hospital") -> "FAC",
    Seq("the", "river") -> "LOC",
    Seq("the", "border") -> "LOC",
    Seq("a", "truck") -> "VEH",
    Seq("the", "convoy") -> "VEH",
    Seq("a", "rifle") -> "WEA",
    Seq("the", "missile") -> "WEA",
    // demo-sentence vocabulary (the reference's documented expected
    // outputs: BETTER/joint/README.md:17 ner + views.py:45-50 ner)
    Seq("U.S.") -> "GPE",
    Seq("Army") -> "ORG",
    Seq("soldiers") -> "PER",
    Seq("Persian", "Gulf") -> "LOC",
    Seq("region") -> "LOC",
    Seq("governor") -> "PER",
    Seq("counties") -> "GPE",
    // short coreferent forms (canonicalization material) — must be entity
    // positions so the P11b argument mask admits them
    Seq("Pataki") -> "PER",
    Seq("Jones") -> "PER",
    Seq("Smith") -> "PER",
    Seq("Garcia") -> "PER",
    Seq("Chen") -> "PER",
    Seq("Hassan") -> "PER")

  /** Temporal connectives -> MATRES-style relation label for the pair
    * (leftEvent, rightEvent) around the connective. Stand-in for the
    * TempRel relation head (joint_model.py:164-181). */
  val Connectives: Map[String, String] = Map(
    "before" -> "BEFORE",
    "until" -> "BEFORE",
    "after" -> "AFTER",
    "once" -> "AFTER",
    "while" -> "SIMULTANEOUS",
    "during" -> "SIMULTANEOUS",
    "as" -> "SIMULTANEOUS",
    "when" -> "VAGUE", // exercises the P6 VAGUE filter
    "and" -> "NONE") //   and the NONE filter

  /** Negation / speculation cue lexicon. Cue labels mirror
    * NegationDetection/README.md:5-9: 0=affix, 1=normal cue,
    * 2=multiword-cue part, 3=not a cue. */
  val NegationCues: Set[String] = Set("not", "n't", "never", "no", "without", "cannot")

  /** Affixal negation cues (label 0). An explicit lexicon, NOT a prefix
    * heuristic: prefix rules misfire on ordinary verbs ("indicted",
    * "injured", "dissolved" all start with a negation-looking prefix and
    * end in -ed). */
  val AffixNegations: Set[String] = Set(
    "unable", "unlikely", "unavailable", "unconfirmed", "unverified",
    "impossible", "improbable", "disallowed", "disabled", "disproved")
  val MultiwordCues: Set[Seq[String]] = Set(Seq("by", "no", "means"), Seq("not", "at", "all"))

  /** The reference forces tokens in ['not'] to cue label 1 post-model
    * (train.py:1777,1798-1805) — P8. */
  val ManualCueOverride: Set[String] = Set("not")

  /** Duration lexicon accessor (P10 analog). */
  def durationOf(lemma: String): Option[String] =
    TriggerLexicon.get(lemma).map(_._2)

  /** Past-tense surface form per lemma (trigger lexicon + TempRel verbs).
    * The taggers lemmatize via this table first (irregulars), then fall
    * back to rule-based suffix stripping (Text.normLemma). */
  val PastForms: Map[String, String] = Map(
    "tour" -> "toured", "travel" -> "traveled", "deploy" -> "deployed",
    "arrive" -> "arrived", "attack" -> "attacked", "bomb" -> "bombed",
    "invade" -> "invaded", "protest" -> "protested", "march" -> "marched",
    "meet" -> "met", "visit" -> "visited", "call" -> "called",
    "write" -> "wrote", "acquit" -> "acquitted", "appeal" -> "appealed",
    "arrest" -> "arrested", "jail" -> "jailed", "indict" -> "indicted",
    "charge" -> "charged", "convict" -> "convicted", "execute" -> "executed",
    "extradite" -> "extradited", "fine" -> "fined", "pardon" -> "pardoned",
    "parole" -> "paroled", "sentence" -> "sentenced", "sue" -> "sued",
    "testify" -> "testified", "die" -> "died", "perish" -> "perished",
    "divorce" -> "divorced", "injure" -> "injured", "wound" -> "wounded",
    "marry" -> "married", "wed" -> "wed", "elect" -> "elected",
    "resign" -> "resigned", "retire" -> "retired", "nominate" -> "nominated",
    "appoint" -> "appointed", "hire" -> "hired", "pay" -> "paid",
    "donate" -> "donated", "buy" -> "bought", "sell" -> "sold",
    "acquire" -> "acquired", "found" -> "founded", "merge" -> "merged",
    "dissolve" -> "dissolved",
    "say" -> "said", "announce" -> "announced", "report" -> "reported",
    "begin" -> "began", "continue" -> "continued", "end" -> "ended",
    "happen" -> "happened", "expect" -> "expected", "plan" -> "planned",
    "decide" -> "decided", "return" -> "returned", "leave" -> "left")

  /** Inverse of PastForms: surface -> lemma. */
  val SurfaceToLemma: Map[String, String] =
    PastForms.map { case (lemma, past) => past -> lemma }

  /** Lemmatize a token: irregular table first, then rule suffix-strip. */
  def lemmaOf(token: String): String = {
    val lower = token.toLowerCase
    SurfaceToLemma.getOrElse(lower, graft.text.Text.normLemma(lower))
  }

  /** WordPiece vocabulary — the deterministic stand-in for the
    * `bert-large-uncased` subword vocab file the reference tokenizes
    * against (component/BETTER/joint/generate_data/
    * contextualized_features_bert.py:9-34 calls
    * `tokenizer.tokenize(orig_token)` per word; saved_args.json pins
    * `bert_model_type: bert-large-uncased`, i.e. lowercased input). Like
    * the tagger lexicons above, the vocab plays the role of the absent
    * model asset (SURVEY.md §7.4 item 1); the SEGMENTATION ALGORITHM
    * (greedy longest-match-first with `##` continuations, whole-word
    * `[UNK]` on any unmatchable position) is HuggingFace WordPiece
    * semantics exactly. ASCII-only by construction so per-char codes
    * agree between the JVM and the SQL oracle.
    */
  object WordpieceVocab {
    /** Single characters tokenizable standalone AND as continuations. */
    val Charset: String =
      "abcdefghijklmnopqrstuvwxyz0123456789.,;:!?'\"()-$%&/@#*+=<>_~[]{}"

    /** Multi-char word-initial pieces (no `##`), effective length 2-7. */
    val NcMulti: Seq[String] = Seq(
      "the", "an", "and", "of", "to", "in", "on", "at", "is", "was",
      "were", "be", "been", "for", "with", "that", "this", "not", "no",
      "from", "by", "as", "he", "she", "it", "they", "we", "but", "his",
      "her", "their", "un", "re", "de", "pre", "dis", "mis", "non",
      "over", "under", "out", "up", "anti", "fore", "inter", "sub",
      "trans", "meet", "break", "announc", "attack", "elect", "charg",
      "sentenc", "marri", "travel", "arriv", "deploy", "protest",
      "report", "visit", "expect", "happen", "continu", "begin", "end",
      "start", "work", "play", "govern", "presid", "minist", "polic",
      "court", "war", "city", "army", "week", "year", "month", "day",
      "hour", "said", "say", "time", "people", "state", "nation")

    /** Multi-char continuation pieces (stored WITH the `##` prefix;
      * effective length 2-7). */
    val CMulti: Seq[String] = Seq(
      "##ing", "##ed", "##es", "##er", "##ers", "##ly", "##ion",
      "##tion", "##ation", "##ment", "##ness", "##ity", "##al", "##ant",
      "##ent", "##ate", "##able", "##ible", "##ous", "##ive", "##ist",
      "##ism", "##ful", "##less", "##ship", "##hood", "##est", "##en",
      "##an", "##in", "##on", "##or", "##ar", "##ia", "##ic", "##ts",
      "##th", "##nd", "##st", "##ry", "##ty", "##cy", "##le", "##ce",
      "##se", "##ne", "##te", "##re", "##ge", "##ve", "##me", "##de")

    /** Longest effective (un-prefixed) piece text. */
    val MaxPieceLen: Int =
      (NcMulti.map(_.length) ++ CMulti.map(_.length - 2)).max

    private[tag] val charSet: Set[Char] = Charset.toSet
    private[tag] val ncSet: Set[String] = NcMulti.toSet
    // continuation pieces keyed by their effective text (## stripped)
    private[tag] val cEffSet: Set[String] = CMulti.map(_.substring(2)).toSet

    /** Is `sub` (effective text, no ##) in the vocab at a word-initial
      * (isCont=false) or continuation (isCont=true) position? */
    def matches(sub: String, isCont: Boolean): Boolean =
      if (sub.length == 1) charSet.contains(sub.charAt(0))
      else if (isCont) cEffSet.contains(sub)
      else ncSet.contains(sub)
  }
}
