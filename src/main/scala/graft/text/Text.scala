package graft.text

import scala.collection.mutable.ArrayBuffer

/** Deterministic, pure-Scala text primitives shared by every stage.
  *
  * The reference tokenizes with spaCy `en_core_web_sm` in THREE places
  * (project/APIs/main.py:71-75, event_pipeline_demo.py:185-189,
  * joint_model.py:197-199) and sentence-splits with nltk
  * (test_on_raw_text.py:84-95). We replace both with deterministic
  * rule-based functions so outputs are identical across stages and across
  * any partitioning of the data — a requirement for the two-parallelism
  * scaling benchmark to be a valid comparison (SURVEY.md §4).
  */
object Text {

  /** Common abbreviations that do NOT end a sentence. */
  private val Abbrev: Set[String] = Set(
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc",
    "gov", "gen", "sgt", "lt", "capt", "u.s",
    "u.k", "u.n", "e.g", "i.e", "jan", "feb", "mar", "apr", "jun", "jul",
    "aug", "sep", "sept", "oct", "nov", "dec")

  /** Sentence segmentation (reference: nltk.sent_tokenize,
    * test_on_raw_text.py:84-95). Splits on `.`, `!`, `?` followed by
    * whitespace + an uppercase/digit start, honoring the abbreviation list
    * and decimal points. Deterministic by construction. */
  def sentSplit(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = ArrayBuffer.empty[String]
    val n = text.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        // lookahead: whitespace then sentence-initial char (or end)
        var j = i + 1
        // consume closing quotes/parens attached to the terminator
        while (j < n && (text.charAt(j) == '"' || text.charAt(j) == '\'' ||
            text.charAt(j) == ')')) j += 1
        var k = j
        while (k < n && Character.isWhitespace(text.charAt(k))) k += 1
        val boundaryCandidate = k > j || k == n
        val nextOk = k == n || Character.isUpperCase(text.charAt(k)) ||
          Character.isDigit(text.charAt(k)) || text.charAt(k) == '"'
        val isAbbrev = c == '.' && {
          // word immediately before the period
          var w = i - 1
          while (w >= 0 && !Character.isWhitespace(text.charAt(w))) w -= 1
          val word = text.substring(w + 1, i).toLowerCase
            .stripPrefix("(").stripPrefix("\"")
          Abbrev.contains(word) ||
            (word.length == 1 && word.charAt(0) >= 'a' && word.charAt(0) <= 'z') ||
            (word.nonEmpty && Character.isDigit(word.charAt(word.length - 1)))
        }
        val isDecimal = c == '.' && i + 1 < n && Character.isDigit(text.charAt(i + 1))
        if (boundaryCandidate && nextOk && !isAbbrev && !isDecimal) {
          val s = text.substring(start, j).trim
          if (s.nonEmpty) out += s
          start = k
          i = k - 1
        }
      }
      i += 1
    }
    val tail = text.substring(start).trim
    if (tail.nonEmpty) out += tail
    out.toSeq
  }

  /** Penn-style word tokenizer, replacing spaCy (main.py:71-75). Newlines
    * are mapped to spaces first, mirroring `text.replace('\n',' ')`
    * (main.py:72). Rules:
    *   - split on whitespace;
    *   - split off leading/trailing punctuation (.,;:!?"'()[]{});
    *   - keep numbers with internal commas/periods together ("17,000",
    *     "3.5");
    *   - keep dotted acronyms together ("U.S.");
    *   - split contractions: "don't" -> "do" "n't", "'s" off;
    *   - keep hyphenated words together.
    */
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")
  private val AcronymRe = java.util.regex.Pattern.compile("([A-Za-z]\\.)+")
  // a chunk that IS a clitic ('s / 're / 've / 'll / 'd / 'm, any case)
  // keeps its apostrophe: it is the token the contraction split below
  // emits, so re-tokenizing it must be the identity (idempotence)
  private val CliticRe =
    java.util.regex.Pattern.compile("(?i)'(s|re|ve|ll|d|m)")

  def tokenize(raw: String): Seq[String] = {
    if (raw == null) return Seq.empty
    val text = raw.replace('\n', ' ')
    val out = ArrayBuffer.empty[String]
    for (chunk0 <- Whitespace.split(text) if chunk0.nonEmpty) {
      var chunk = chunk0
      val lead = ArrayBuffer.empty[String]
      val trail = ArrayBuffer.empty[String]
      // leading punctuation
      var done = false
      while (!done && chunk.nonEmpty) {
        val c = chunk.charAt(0)
        if ("\"'([{“”‘’«".indexOf(c.toInt) >= 0 &&
            !CliticRe.matcher(chunk).matches()) {
          lead += c.toString; chunk = chunk.substring(1)
        } else done = true
      }
      // ITERATED PEEL: trailing punctuation and clitic splits interact —
      // the pre part of a clitic split can end with punctuation that must
      // strip ("Qd\"'s" → Qd " 's), and can itself end in another clitic
      // ("x's's" → x 's 's) — so loop until stable. Every emitted token
      // is then a FIXED POINT of tokenize (the idempotence property).
      // Trailing-punct rules: final period always splits unless part of
      // an acronym like "U.S."; `trail` holds peeled pieces in-string
      // order (each peel prepends, strips walk right-to-left).
      var peeling = true
      while (peeling) {
        peeling = false
        // trailing punctuation (repeatedly)
        val tp = ArrayBuffer.empty[String]
        done = false
        while (!done && chunk.nonEmpty) {
          val c = chunk.charAt(chunk.length - 1)
          val isPunct = ".,;:!?\"')]}“”‘’»".indexOf(c.toInt) >= 0
          if (isPunct) {
            val isAcronym = c == '.' && AcronymRe.matcher(chunk).matches()
            if (isAcronym) done = true
            else { tp.prepend(c.toString); chunk = chunk.dropRight(1) }
          } else done = true
        }
        trail.prependAll(tp)
        // contractions (the clitic peels, the loop re-checks the pre part)
        val lower = chunk.toLowerCase
        if (lower.endsWith("n't") && chunk.length > 3) {
          trail.prepend(chunk.takeRight(3)); chunk = chunk.dropRight(3)
          peeling = true
        } else if ((lower.endsWith("'s") || lower.endsWith("'re") ||
            lower.endsWith("'ve") || lower.endsWith("'ll") ||
            lower.endsWith("'d") || lower.endsWith("'m")) &&
            chunk.lastIndexOf('\'') > 0) {
          val idx = chunk.lastIndexOf('\'')
          trail.prepend(chunk.substring(idx)); chunk = chunk.substring(0, idx)
          peeling = true
        }
      }
      out ++= lead
      if (chunk.nonEmpty) out += chunk
      out ++= trail
    }
    out.toSeq
  }

  /** Decoded BIO span: (label, startToken, endToken) inclusive. */
  final case class SpanLabel(label: String, start: Int, end: Int)

  /** BIO tag-sequence -> spans, an EXACT mirror of the reference's
    * `iob_to_obj` (component/BETTER/joint/JsonBuilder.py:8-34), including
    * its quirks:
    *   - a span opens only at a tag present in `b2i` (a B- tag);
    *   - it continues only through tags equal to `b2i(openingTag)`;
    *   - orphan I- tags (no preceding B-) are DROPPED;
    *   - a label change closes the current span at the previous token;
    *   - a span reaching the last position closes there.
    * For triggers the reference maps B2I[B]=B (event_pipeline_demo.py:71-78),
    * i.e. runs of the same B- tag merge into one span — the same map works
    * here unchanged.
    */
  def bioDecode(tags: Seq[String], b2i: Map[String, String]): Seq[SpanLabel] = {
    val obj = ArrayBuffer.empty[SpanLabel]
    var inObj = false
    var currLabel: String = null
    var currStart = -1
    var currI: String = null
    val n = tags.length
    var i = 0
    while (i < n) {
      val y = tags(i)
      if (inObj) {
        if (y != currI) {
          obj += SpanLabel(currLabel, currStart, i - 1)
          currLabel = null; currStart = -1; currI = null; inObj = false
        } else if (i == n - 1) {
          obj += SpanLabel(currLabel, currStart, i)
        }
      }
      if (b2i.contains(y)) {
        currLabel = y.substring(2)
        currStart = i
        currI = b2i(y)
        inObj = true
        if (i == n - 1) obj += SpanLabel(currLabel, currStart, i)
      }
      i += 1
    }
    obj.toSeq
  }

  /** Inverse helper for tests: spans -> BIO tags (B-/I- form). */
  def bioEncode(n: Int, spans: Seq[SpanLabel]): Seq[String] = {
    val tags = Array.fill(n)("O")
    for (s <- spans; i <- s.start to s.end if i >= 0 && i < n)
      tags(i) = (if (i == s.start) "B-" else "I-") + s.label
    tags.toSeq
  }

  /** `' '.join(tokens[l..r])` — reference JsonBuilder.py:92-93. */
  def spanText(tokens: Seq[String], start: Int, end: Int): String =
    tokens.slice(start, end + 1).mkString(" ")

  /** Token normalization used by the alignment join (J1): the reference
    * strips '.' from tokens before matching (main.py:126). */
  def cleanTok(t: String): String = t.replace(".", "")

  /** Extract natural-language material from a source file: comment lines
    * for code langs, prose lines for markup. The engine's analog of the
    * reference's raw-text scan (S1, test_on_raw_text.py:76-95) adapted to
    * the north-rule input table of source files. Returns (lineNum, text). */
  def naturalText(lang: String, content: String): Seq[(Int, String)] = {
    if (content == null) return Seq.empty
    val lines = content.split("\n", -1)
    val out = ArrayBuffer.empty[(Int, String)]
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val trimmed = line.trim
      val text: String = lang match {
        case "python" | "ruby" | "shell" | "bash" =>
          if (trimmed.startsWith("#")) trimmed.dropWhile(_ == '#').trim else null
        case "markdown" | "md" | "text" | "txt" | "" | null =>
          if (trimmed.nonEmpty && !line.startsWith("    ")) trimmed else null
        case _ => // C-family comment markers (scala, java, js, go, c, ...)
          if (trimmed.startsWith("//")) trimmed.dropWhile(_ == '/').trim
          else if (trimmed.startsWith("*")) trimmed.dropWhile(_ == '*').trim
          else if (trimmed.startsWith("/*"))
            trimmed.stripPrefix("/*").stripSuffix("*/").trim
          else if (trimmed.startsWith("#")) trimmed.dropWhile(_ == '#').trim
          else null
      }
      if (text != null && text.nonEmpty) out += ((i, text))
      i += 1
    }
    out.toSeq
  }

  /** Hex sha256 — the per-row content invariant (BASELINE.json input_hint).
    * Must agree with Spark's sha2(col, 256) (it does: lowercase hex). */
  def sha256(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** Copular-predicate span extension + 5-word text cap (P13 + K4, aux
    * path — Duration's PredPatt preprocessing, preprocess.py:28-76; the
    * live path bypasses PredPatt, preprocess.py:114-135, so this feeds
    * only the duration-side text view, never the core trigger spans).
    *
    * Reference rule: when the predicate root is NOT verbal and a copula
    * ("cop" dependency) occurs among the predicate tokens, the predicate
    * text starts at the copula and runs to the end of the predicate
    * phrase (preprocess.py:40-47); the root token index is kept for the
    * it-happened linkage either way. The stand-in without a dependency
    * parse: the copula is the nearest BE-form before the root inside the
    * same clause. Text is capped at 5 words with a "..." suffix
    * (preprocess.py:70-74 — K4).
    *
    * Returns (predText, spanTokenIdxs, rootIdx). */
  def copularPredicate(tokens: Seq[String], rootIdx: Int,
      clauseEnd: Int = -1): (String, Seq[Int], Int) = {
    val Copulas = Set("is", "are", "was", "were", "be", "been", "being",
      "am", "'s", "'re", "'m")
    val isVerbal = {
      val lower = tokens(rootIdx).toLowerCase
      // verbal heuristic mirroring predicate.root.tag in {VERB, AUX}:
      // BE-forms themselves, or -ed/-ing/-s inflected forms of a known
      // lemma (normLemma hit implies an inflection was stripped)
      Copulas.contains(lower) ||
        ((lower.endsWith("ed") || lower.endsWith("ing")) && lower.length > 4)
    }
    val copIdx =
      if (isVerbal) -1
      else (rootIdx - 1 to 0 by -1)
        .takeWhile(i => !Set(",", ".", ";", "that").contains(tokens(i).toLowerCase))
        .find(i => Copulas.contains(tokens(i).toLowerCase)).getOrElse(-1)
    val end = if (clauseEnd >= 0) clauseEnd else {
      var e = rootIdx
      while (e + 1 < tokens.length &&
        !Set(",", ".", "!", "?", ";").contains(tokens(e + 1))) e += 1
      e
    }
    val span = if (copIdx >= 0) (copIdx to end).toSeq else Seq(rootIdx)
    val words = span.map(tokens(_))
    val text =
      if (words.length > 5) words.take(5).mkString(" ") + "..."
      else words.mkString(" ")
    (text, span, rootIdx)
  }

  /** Greedy WordPiece segmentation of one (already-tokenized) word — the
    * P2 subword re-tokenization the reference applies per original token
    * (`tokenizer.tokenize(orig_token)`,
    * component/BETTER/joint/generate_data/contextualized_features_bert.py:
    * 25-27). HuggingFace WordPiece semantics: lowercase (uncased model),
    * longest-match-first against the vocab at each position, continuation
    * pieces carry a `##` prefix, and if ANY position has no match — or the
    * word exceeds 100 chars (HF `max_input_chars_per_word`) — the WHOLE
    * word becomes a single `[UNK]`. Lowercasing is ASCII-only (A-Z):
    * full-Unicode lowering is locale- and engine-dependent, the vocab is
    * ASCII by construction, and any non-ASCII character forces `[UNK]`
    * either way. Vocabulary: [[graft.tag.Ontology.WordpieceVocab]] (the
    * model-asset stand-in). */
  def wordpiece(word: String): Seq[String] = {
    import graft.tag.Ontology.{WordpieceVocab => V}
    val w = word.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
    if (w.isEmpty || w.length > 100) return Seq("[UNK]")
    val out = ArrayBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      val isCont = pos > 0
      var len = math.min(V.MaxPieceLen, w.length - pos)
      var found = -1
      while (len >= 1 && found < 0) {
        if (V.matches(w.substring(pos, pos + len), isCont)) found = len
        else len -= 1
      }
      if (found < 0) return Seq("[UNK]")
      out += (if (isCont) "##" + w.substring(pos, pos + found)
              else w.substring(pos, pos + found))
      pos += found
    }
    out.toSeq
  }

  /** Sentence-level subword expansion + alignment map — an exact mirror of
    * the reference's `bert_token` (contextualized_features_bert.py:9-34):
    * the piece stream opens with `[CLS]` and closes with `[SEP]`, and
    * `origToTokMap(i)` records the piece index where word `i`'s first
    * piece landed (the map value is taken BEFORE extending, so word 0 maps
    * to 1 — after `[CLS]`). The reference's empty-tokenization fallback
    * (its lines 28-31) is unreachable here because [[wordpiece]] never
    * returns an empty list (`[UNK]` at minimum).
    *
    * Returns (pieces incl. CLS/SEP, origToTokMap). */
  def wordpieceAlign(tokens: Seq[String]): (Seq[String], Seq[Int]) = {
    val pieces = ArrayBuffer[String]("[CLS]")
    val map = ArrayBuffer.empty[Int]
    for (t <- tokens) {
      map += pieces.length
      pieces ++= wordpiece(t)
    }
    pieces += "[SEP]"
    (pieces.toSeq, map.toSeq)
  }

  /** Deterministic scalar "representation" of a subword piece, shared with
    * the SQL oracle: sum over characters of `code * (1-based position)`.
    * Pieces are ASCII by construction (charset + literal markers), so JVM
    * char codes and SQL `ascii()` agree. */
  def pieceVal(p: String): Long = {
    var acc = 0L
    var i = 0
    while (i < p.length) { acc += p.charAt(i).toLong * (i + 1); i += 1 }
    acc
  }

  /** Subword→word pooling over one word's pieces — the scalar analog of
    * `get_repre_from_align` (component/BETTER/joint/neural_model.py:
    * 322-342) in the three modes the reference actually runs: `head`
    * (index_select at origToTokMap — the trigger/argument models,
    * EventPipeline.py:359), `average` (its `pooling='average'` branch),
    * and `max` (the NER model, EventPipeline.py:324). The selected range
    * is exactly the word's own pieces: `[map(i), map(i+1))`, and for the
    * last word `[map(i), bertLength-1)` — which excludes `[SEP]` and is
    * again the word's own pieces.
    *
    * Returns (head, average, max) over [[pieceVal]]s. The average is
    * rounded half-up at 4 decimals with the same integer-anchored formula
    * the SQL oracle uses (`floor(sum * 10000 / n + 0.5) / 10000`) so the
    * two sides agree bit-for-bit on repeating thirds. */
  def poolWord(pieces: Seq[String]): (Long, Double, Long) = {
    val vals = pieces.map(pieceVal)
    val avg =
      math.floor(vals.sum.toDouble * 10000.0 / vals.length + 0.5) / 10000.0
    (vals.head, avg, vals.max)
  }

  /** Lemma-ish normalization for canonicalization blocking: lowercase,
    * strip possessives and plural/verbal suffixes. Deterministic. */
  def normLemma(t: String): String = {
    var s = t.toLowerCase
    s = s.stripSuffix("'s")
    if (s.length > 4 && s.endsWith("ies")) s = s.dropRight(3) + "y"
    else if (s.length > 4 && s.endsWith("ing")) s = s.dropRight(3)
    else if (s.length > 3 && s.endsWith("ed")) s = s.dropRight(2)
    else if (s.length > 3 && s.endsWith("es")) s = s.dropRight(2)
    else if (s.length > 3 && s.endsWith("s") && !s.endsWith("ss")) s = s.dropRight(1)
    s
  }
}
