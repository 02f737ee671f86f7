package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Synth
import graft.text.Text
import graft.text.Text.SpanLabel

class TextSpec extends AnyFunSuite {

  // ---- bioDecode: exact mirror of JsonBuilder.iob_to_obj:8-34 ----

  val b2i = Map("B-PER" -> "I-PER", "B-GPE" -> "I-GPE")

  test("bioDecode: simple span") {
    assert(Text.bioDecode(Seq("O", "B-PER", "I-PER", "O"), b2i) ==
      Seq(SpanLabel("PER", 1, 2)))
  }

  test("bioDecode: span at sequence end closes at last token (iob_to_obj:25-33)") {
    assert(Text.bioDecode(Seq("O", "B-PER", "I-PER"), b2i) ==
      Seq(SpanLabel("PER", 1, 2)))
    assert(Text.bioDecode(Seq("O", "B-PER"), b2i) == Seq(SpanLabel("PER", 1, 1)))
  }

  test("bioDecode: orphan I- tags are dropped (reference drops them)") {
    assert(Text.bioDecode(Seq("I-PER", "I-PER", "O"), b2i) == Seq.empty)
    assert(Text.bioDecode(Seq("O", "I-GPE", "O"), b2i) == Seq.empty)
  }

  test("bioDecode: label change closes span at previous token") {
    assert(Text.bioDecode(Seq("B-PER", "I-PER", "B-GPE", "I-GPE"), b2i) ==
      Seq(SpanLabel("PER", 0, 1), SpanLabel("GPE", 2, 3)))
    // I of a DIFFERENT label after B: closes, I is orphan -> dropped
    assert(Text.bioDecode(Seq("B-PER", "I-GPE"), b2i) == Seq(SpanLabel("PER", 0, 0)))
  }

  test("bioDecode: B-only trigger convention — each B RESETS the span start " +
    "(faithful iob_to_obj quirk: curr_obj is overwritten at every B)") {
    val trigB2i = Map("B-X" -> "B-X")
    // reference trace: i=1 continues (B==curr_I) but then reopens at i=1;
    // the close at i=2 emits the REOPENED span (1,1), not (0,1)
    assert(Text.bioDecode(Seq("B-X", "B-X", "O"), trigB2i) == Seq(SpanLabel("X", 1, 1)))
    assert(Text.bioDecode(Seq("B-X", "O", "B-X"), trigB2i) ==
      Seq(SpanLabel("X", 0, 0), SpanLabel("X", 2, 2)))
    // quirk at sequence end: continue-branch emits (0,1) AND the reopen
    // emits (1,1) — mirrored exactly from JsonBuilder.py:16-33
    assert(Text.bioDecode(Seq("B-X", "B-X"), trigB2i) ==
      Seq(SpanLabel("X", 0, 1), SpanLabel("X", 1, 1)))
  }

  test("bioDecode property: decode(encode(spans)) == spans over 500 random cases") {
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val n = 1 + rng.nextInt(20)
      var pos = 0
      val spans = Vector.newBuilder[SpanLabel]
      while (pos < n) {
        if (rng.nextDouble() < 0.4) {
          val len = 1 + rng.nextInt(math.min(3, n - pos))
          spans += SpanLabel(if (rng.nextBoolean()) "PER" else "GPE", pos, pos + len - 1)
          pos += len + 1 // gap so adjacent same-label spans can't merge
        } else pos += 1
      }
      val expected = spans.result()
      val tags = Text.bioEncode(n, expected)
      assert(Text.bioDecode(tags, b2i) == expected, s"tags=$tags")
    }
  }

  // ---- tokenizer ----

  test("tokenizer: punctuation, numbers, acronyms, contractions") {
    assert(Text.tokenize("Orders went out today to deploy 17,000 U.S. soldiers.") ==
      Seq("Orders", "went", "out", "today", "to", "deploy", "17,000", "U.S.", "soldiers", "."))
    assert(Text.tokenize("He didn't go (yet).") ==
      Seq("He", "did", "n't", "go", "(", "yet", ")", "."))
    assert(Text.tokenize("Pataki's plan, a 3.5 percent cut.") ==
      Seq("Pataki", "'s", "plan", ",", "a", "3.5", "percent", "cut", "."))
    assert(Text.tokenize("line\nbreak") == Seq("line", "break"))
  }

  test("tokenizer is idempotent on clitic tokens (standalone 's keeps its quote)") {
    // re-tokenizing the "'s" the contraction split emits must be identity
    for (t <- Seq("'s", "'S", "'re", "'ve", "'ll", "'d", "'m"))
      assert(Text.tokenize(t) == Seq(t), s"clitic $t")
    assert(Text.tokenize("wu'S") == Seq("wu", "'S"))
    assert(Text.tokenize("''s") == Seq("'", "'s")) // strip stops AT the clitic
    assert(Text.tokenize("'hello") == Seq("'", "hello")) // non-clitic unchanged
    assert(Text.tokenize("'so") == Seq("'", "so")) // prefix of no clitic rule
  }

  test("tokenizer iterated peel: punct/clitic interactions emit only fixed points") {
    // pre part of a clitic split ending with punctuation re-strips
    assert(Text.tokenize("""Qd"'s""") == Seq("Qd", "\"", "'s"))
    // chained clitics peel one at a time
    assert(Text.tokenize("x's's") == Seq("x", "'s", "'s"))
    // acronym guard still holds for the peeled pre part
    assert(Text.tokenize("U.S.'s") == Seq("U.S.", "'s"))
    // clitic then trailing punct (in-string order preserved)
    assert(Text.tokenize("Bob's.") == Seq("Bob", "'s", "."))
    // n't pre part with punctuation
    assert(Text.tokenize("do,n't") == Seq("do", ",", "n't"))
    // apostrophe after the peel strips as trailing punct
    assert(Text.tokenize("x''s") == Seq("x", "'", "'s"))
    // every emitted token is a fixed point
    for (s <- Seq("""E?,,Qd"'s""", "x's's", "Bob's.", "do,n't", "a\"'s's"))
      for (t <- Text.tokenize(s))
        assert(Text.tokenize(t) == Seq(t), s"token $t of $s not fixed")
  }

  test("tokenizer round-trips every generated gold sentence") {
    for (i <- 0L until 80L) {
      val repo = Synth.repoOf(i)
      val path = Synth.pathOf(i)
      for (g <- Synth.goldSentences(repo, path, 6)) {
        val detok = Synth.detokenize(g.tokens)
        assert(Text.tokenize(detok) == g.tokens,
          s"round-trip failed for: $detok")
      }
    }
  }

  // ---- sentence splitter ----

  test("sentSplit: basic splits and abbreviation guards") {
    assert(Text.sentSplit("First sentence. Second one here.") ==
      Seq("First sentence.", "Second one here."))
    assert(Text.sentSplit("Dr. Smith arrived. He left.") ==
      Seq("Dr. Smith arrived.", "He left."))
    assert(Text.sentSplit("Pi is 3.14 roughly. Next.") ==
      Seq("Pi is 3.14 roughly.", "Next."))
    assert(Text.sentSplit("No terminator here") == Seq("No terminator here"))
  }

  test("sentSplit recovers multi-sentence comment lines from generated corpus") {
    for (i <- 0L until 40L) {
      val repo = Synth.repoOf(i)
      val path = Synth.pathOf(i)
      val golds = Synth.goldSentences(repo, path, 6)
      val byLine = golds.groupBy(_.lineNum)
      for ((_, sents) <- byLine) {
        val joined = sents.sortBy(_.senNum).map(g => Synth.detokenize(g.tokens)).mkString(" ")
        val split = Text.sentSplit(joined)
        assert(split.length == sents.length, s"splitting: $joined -> $split")
      }
    }
  }

  // ---- misc ----

  test("cleanTok strips periods (J1 normalization, main.py:126)") {
    assert(Text.cleanTok("U.S.") == "US")
    assert(Text.cleanTok("end.") == "end")
  }

  test("sha256 agrees with a known vector") {
    assert(Text.sha256("abc") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("copularPredicate: extension from copula + 5-word cap " +
      "(preprocess.py:28-76, P13/K4 aux path)") {
    // non-verbal root with a preceding copula -> span starts AT the copula
    val t1 = Text.tokenize("the system is ready for deployment now")
    val (txt1, span1, root1) = Text.copularPredicate(t1, t1.indexOf("ready"))
    assert(span1.head == t1.indexOf("is"))
    assert(root1 == t1.indexOf("ready"))
    assert(txt1 == "is ready for deployment now")
    // cap: >5 words truncates to 5 + "..." (preprocess.py:70-74)
    val t2 = Text.tokenize("the plan is ready for immediate global deployment tomorrow morning")
    val (txt2, _, _) = Text.copularPredicate(t2, t2.indexOf("ready"))
    assert(txt2 == "is ready for immediate global...")
    assert(txt2.split(" ").length == 5 && txt2.endsWith("..."))
    // verbal root (inflected): no extension, span = root alone
    val t3 = Text.tokenize("the team deployed the fix quickly")
    val (txt3, span3, _) = Text.copularPredicate(t3, t3.indexOf("deployed"))
    assert(span3 == Seq(t3.indexOf("deployed")) && txt3 == "deployed")
    // copula search must not cross a clause delimiter
    val t4 = Text.tokenize("it was late , the patch ready for review")
    val (_, span4, _) = Text.copularPredicate(t4, t4.indexOf("ready"))
    assert(span4 == Seq(t4.indexOf("ready"))) // "was" is behind the comma
  }

  test("wordpiece: greedy longest-match, ## continuations, [UNK] (P2)") {
    assert(Text.wordpiece("announced") == Seq("announc", "##ed"))
    assert(Text.wordpiece("meeting") == Seq("meet", "##ing"))
    assert(Text.wordpiece("The") == Seq("the")) // uncased
    // greedy = longest FIRST piece, not fewest pieces overall
    assert(Text.wordpiece("unhappy") ==
      Seq("un", "##h", "##a", "##p", "##p", "##y"))
    // punctuation + digits are single-char pieces
    assert(Text.wordpiece("U.S.") == Seq("u", "##.", "##s", "##."))
    assert(Text.wordpiece("1,000") == Seq("1", "##,", "##0", "##0", "##0"))
    // any unmatchable char -> WHOLE word [UNK] (HF semantics)
    assert(Text.wordpiece("víctor") == Seq("[UNK]"))
    assert(Text.wordpiece("") == Seq("[UNK]"))
    assert(Text.wordpiece("a" * 101) == Seq("[UNK]")) // max_input_chars
    // a continuation-only piece can't open a word and vice versa
    assert(Text.wordpiece("ed").head != "##ed")
  }

  test("wordpiece alignment mirrors bert_token (P2: [CLS] offset, " +
      "first-piece indices)") {
    val toks = Seq("They", "announced", "a", "meeting")
    val (pieces, map) = Text.wordpieceAlign(toks)
    assert(pieces.head == "[CLS]" && pieces.last == "[SEP]")
    assert(map.length == toks.length)
    assert(map.head == 1) // word 0 lands right after [CLS]
    // map(i) points at word i's FIRST piece
    for (i <- toks.indices)
      assert(pieces(map(i)) == Text.wordpiece(toks(i)).head)
    // cumulative: map(i+1) = map(i) + nPieces(i)
    for (i <- 0 until toks.length - 1)
      assert(map(i + 1) == map(i) + Text.wordpiece(toks(i)).length)
    // total stream length = 1 ([CLS]) + sum(pieces) + 1 ([SEP])
    assert(pieces.length ==
      2 + toks.map(Text.wordpiece(_).length).sum)
  }

  test("poolWord: head/average/max over piece values (A2)") {
    val wp = Text.wordpiece("announced") // announc, ##ed
    val vals = wp.map(Text.pieceVal)
    val (h, a, m) = Text.poolWord(wp)
    assert(h == vals.head && m == vals.max)
    // fixed 4-decimal rounding, same formula as the SQL oracle
    assert(a == math.floor(vals.sum.toDouble * 10000.0 / vals.length + 0.5) / 10000.0)
    // single-piece word: all three pools agree
    val (h1, a1, m1) = Text.poolWord(Text.wordpiece("the"))
    assert(h1 == m1 && a1 == h1.toDouble)
    // pieceVal is position-weighted: anagram pieces differ
    assert(Text.pieceVal("ab") != Text.pieceVal("ba"))
  }
}
