package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.text.Text
import graft.tag.Viterbi

/** Property-based invariants over the pure text/decode kernels — the
  * functions every distributed stage maps over, so an invariant violation
  * here is a corpus-dependent wrong answer at any scale. Runs as a native
  * ScalaCheck suite (no Spark session — millisecond feedback). */
object PropertySpec extends Properties("graft.pure") {

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', ' ', '.', ',', '!', '?', ';', ':', '\'', '"',
        '(', ')', '-', '\n', '\t'))).map(_.mkString)

  property("tokenize: no empty tokens, no whitespace inside a token") =
    Prop.forAll(asciiText) { s =>
      val toks = Text.tokenize(s)
      toks.forall(t => t.nonEmpty && !t.exists(_.isWhitespace))
    }

  property("tokenize: every token char comes from the input") =
    Prop.forAll(asciiText) { s =>
      Text.tokenize(s).forall(_.forall(c => s.contains(c)))
    }

  property("tokenize is idempotent on its own tokens") =
    Prop.forAll(asciiText) { s =>
      Text.tokenize(s).forall { t =>
        val again = Text.tokenize(t)
        again.isEmpty || again == Seq(t)
      }
    }

  property("sentSplit: sentences are non-empty and preserve letters") =
    Prop.forAll(asciiText) { s =>
      val sents = Text.sentSplit(s)
      val letters = (x: String) => x.filter(_.isLetterOrDigit)
      sents.forall(_.trim.nonEmpty) &&
        letters(sents.mkString(" ")) == letters(s)
    }

  property("sha256: 64 lowercase hex chars, deterministic") =
    Prop.forAll(asciiText) { s =>
      val h = Text.sha256(s)
      h.length == 64 && h.forall(c => c.isDigit || (c >= 'a' && c <= 'f')) &&
        h == Text.sha256(s)
    }

  private val bioTag: Gen[String] =
    Gen.frequency(4 -> Gen.const("O"),
      3 -> Gen.oneOf("B-PER", "B-ORG", "B-GPE"),
      3 -> Gen.oneOf("I-PER", "I-ORG", "I-GPE"))
  private val b2i = Map("B-PER" -> "I-PER", "B-ORG" -> "I-ORG",
    "B-GPE" -> "I-GPE")

  property("bioDecode: spans in bounds, ordered, non-overlapping") =
    Prop.forAll(Gen.listOf(bioTag)) { tags =>
      val spans = Text.bioDecode(tags, b2i)
      spans.forall(sp => sp.start >= 0 && sp.end < tags.length &&
          sp.start <= sp.end) &&
        spans.sliding(2).forall {
          case Seq(a, b) => a.end < b.start
          case _ => true
        }
    }

  property("bioDecode(bioEncode(spans)) == spans for valid span sets") =
    Prop.forAll(Gen.choose(1, 30)) { n =>
      // generate a valid, SEPARATED span set: spans from a sorted cut,
      // with a one-token gap so adjacent same-label spans can't merge
      val starts = (0 until n by 4).take(5)
      val spans = starts.zipWithIndex.map { case (st, i) =>
        Text.SpanLabel(Seq("PER", "ORG", "GPE")(i % 3), st,
          math.min(st + 1, n - 1))
      }.filter(sp => sp.end < n)
      Text.bioDecode(Text.bioEncode(n, spans), b2i) == spans
    }

  private val word: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(k => Gen.listOfN(k,
      Gen.frequency(9 -> Gen.alphaLowerChar, 1 -> Gen.oneOf('X', '7', 'é'))))
      .map(_.mkString)

  property("wordpiece: pieces reassemble the lowercased word, or [UNK]") =
    Prop.forAll(word) { w =>
      val pieces = Text.wordpiece(w)
      pieces == Seq("[UNK]") || {
        pieces.nonEmpty &&
          pieces.head == pieces.head.stripPrefix("##") &&
          pieces.tail.forall(_.startsWith("##")) &&
          pieces.map(_.stripPrefix("##")).mkString ==
            w.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      }
    }

  property("wordpieceAlign: map points at each word's first piece") =
    Prop.forAll(Gen.listOf(word).map(_.filter(_.nonEmpty))) { words =>
      val (pieces, map) = Text.wordpieceAlign(words)
      pieces.headOption.contains("[CLS]") && pieces.last == "[SEP]" &&
        map.length == words.length &&
        map.zip(words).forall { case (p, w) =>
          val first = Text.wordpiece(w).head
          pieces(p) == first
        }
    }

  private val emissions: Gen[Array[Array[Double]]] =
    for {
      n <- Gen.choose(1, 8)
      k <- Gen.choose(2, 5)
      rows <- Gen.listOfN(n, Gen.listOfN(k, Gen.choose(-5.0, 5.0)))
    } yield rows.map(_.toArray).toArray

  property("viterbi: path length == input length; labels in range") =
    Prop.forAll(emissions) { em =>
      val k = em.head.length
      val trans = Array.fill(k, k)(0.0)
      val path = Viterbi.decode(em, trans)
      path.length == em.length && path.forall(s => s >= 0 && s < k)
    }

  property("viterbi: k-best first path == 1-best path score") =
    Prop.forAll(emissions) { em =>
      val k = em.head.length
      val trans = Array.fill(k, k)(0.0)
      def score(p: Array[Int]): Double =
        p.zipWithIndex.map { case (s, i) => em(i)(s) }.sum +
          p.sliding(2).collect { case Array(a, b) => trans(a)(b) }.sum
      val best = Viterbi.decode(em, trans)
      val kbest = Viterbi.decodeK(em, trans, 3)
      kbest.nonEmpty &&
        math.abs(score(kbest.head._1) - score(best)) < 1e-9 &&
        kbest.map(p => score(p._1)).sliding(2).forall {
          case Seq(a, b) => a >= b - 1e-9
          case _ => true
        } &&
        kbest.forall(p => math.abs(score(p._1) - p._2) < 1e-9)
    }
}
