package graft.gold

import scala.collection.mutable

import graft.corpus.Synth
import graft.model._
import graft.tag.Ontology
import graft.text.Text

/** Test-side INDEPENDENT derivation of the expected triple set from the
  * gold annotations (Synth.goldSentences) — plain Scala, no Spark, no code
  * shared with the pipeline's emitters. This is the engine-equivalent of
  * the reference's golden prediction corpora (SURVEY.md §5 item 3): the
  * same derivation the reference applies to its annotations (BIO decode →
  * assembly → merges → filters), applied to annotations we know to be
  * true by construction.
  */
object GoldDeriver {

  case class GoldTriple(subj: String, pred: String, obj: String,
      repo: String, path: String, contentSha: String)

  /** Union-find for the in-memory canonicalization mirror. */
  private class UF[T] {
    private val parent = mutable.Map.empty[T, T]
    def find(x: T): T = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: T, b: T): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
  }

  /** In-memory mirror of link.Canonicalize: distinct (repo, text) forms,
    * blocking on normLemma(last token), token-set containment edges,
    * connected components, canonical = longest text (ties: lexicographic
    * min). */
  def canonicalMap(mentions: Seq[(String, String)]): Map[(String, String), String] = {
    val forms = mentions.distinct
    val byBlock = forms.groupBy { case (repo, text) =>
      (repo, Text.normLemma(text.split(" ").last))
    }
    val uf = new UF[(String, String)]
    for ((_, group) <- byBlock; i <- group.indices; j <- i + 1 until group.length) {
      val ta = group(i)._2.split(" ").toSet
      val tb = group(j)._2.split(" ").toSet
      if ((ta intersect tb).size == math.min(ta.size, tb.size))
        uf.union(group(i), group(j))
    }
    val byComp = forms.groupBy(uf.find)
    val canonOf = byComp.map { case (root, members) =>
      root -> members.map(_._2).minBy(t => (-t.length, t))
    }
    forms.map(f => f -> canonOf(uf.find(f))).toMap
  }

  /** Expected triples for a corpus of nFiles × sentsPerFile. */
  def goldTriples(nFiles: Long, sentsPerFile: Int): Set[GoldTriple] = {
    val files = (0L until nFiles).map(i => Synth.sourceFile(i, sentsPerFile))
    val out = mutable.Set.empty[GoldTriple]

    // pass 1: collect arg mentions for canonicalization + typed events for
    // sameAs blocks
    val argMentions = mutable.ArrayBuffer.empty[(String, String)]
    val typedEventIds = mutable.ArrayBuffer.empty[(String, String, String, String)] // (repo, lemma, type, eventId)

    case class SentCtx(f: SourceFile, sha: String, g: Synth.GoldSentence, sentKey: String)
    val sents = files.flatMap { f =>
      val sha = Text.sha256(f.content)
      Synth.goldSentences(f.repo, f.path, sentsPerFile).map { g =>
        SentCtx(f, sha, g, s"${f.repo}/${f.path}#L${g.lineNum}:S${g.senNum}")
      }
    }

    for (SentCtx(f, _, g, sentKey) <- sents; e <- g.events if e.eventType.nonEmpty) {
      val t = e.triggers.head
      val eid = s"$sentKey:T${t.start}"
      typedEventIds += ((f.repo, Ontology.lemmaOf(t.text), e.eventType, eid))
      for (a <- e.arguments) argMentions += ((f.repo, a.text))
    }
    val canon = canonicalMap(argMentions.toSeq)
    val sameAsCanon: Map[(String, String, String), String] =
      typedEventIds.groupBy(x => (x._1, x._2, x._3))
        .map { case (k, v) => k -> v.map(_._4).min }

    // pass 2: emit
    for (SentCtx(f, sha, g, sentKey) <- sents) {
      def t3(s: String, p: String, o: String): Unit =
        out += GoldTriple(s, p, o, f.repo, f.path, sha)

      for (e <- g.events) {
        val tr = e.triggers.head
        val eid = s"$sentKey:T${tr.start}"
        if (e.eventType.nonEmpty) {
          t3(eid, "hasType", e.eventType)
          for (a <- e.arguments)
            t3(eid, a.role, canon((f.repo, a.text)))
          if (e.duration.nonEmpty) t3(eid, "hasDuration", e.duration)
          if (e.speculation) t3(eid, "speculated", "true")
          val canonical = sameAsCanon((f.repo, Ontology.lemmaOf(tr.text), e.eventType))
          if (canonical != eid) t3(eid, "sameAs", canonical)
        }
        // typeless (U1-injected) events carry no triples of their own; they
        // exist as relation endpoints only
      }
      for (r <- g.relations if r.label != "VAGUE" && r.label != "NONE")
        t3(s"$sentKey:T${r.left}", r.label, s"$sentKey:T${r.right}")
      for (n <- g.ner)
        t3(s"${f.repo}/${f.path}", "hasEntity",
          s"${n.label}:${g.tokens.slice(n.start, n.end + 1).mkString(" ")}")
    }
    out.toSet
  }

  /** Export the gold triple SET as a sorted TSV under
    * `root/n<nFiles>_s<spf>/gold_triples.tsv` — the independently derived
    * expected set the driver's DuckDB oracle aggregates for the composed
    * kg_* pipeline queries (graft.Verify writes it before running the
    * queries; the n/spf-keyed directory lets one static oracle SQL pick
    * the right corpus via a filename filter). Deterministic content;
    * bounded driver-side work (the gold derivation is vocabulary-bounded
    * plain Scala over nFiles × spf sentences — Verify runs at sf ≤ 0.01,
    * i.e. ≤ 600 files). Written once per (nFiles, spf) per JVM. */
  private val exported = mutable.Set.empty[(Long, Int)]
  def exportTsv(nFiles: Long, sentsPerFile: Int,
      root: String = "/tmp/graft_gold"): java.nio.file.Path = synchronized {
    val dir = java.nio.file.Paths.get(root, s"n${nFiles}_s$sentsPerFile")
    val file = dir.resolve("gold_triples.tsv")
    if (exported.add((nFiles, sentsPerFile)) ||
        !java.nio.file.Files.exists(file)) {
      java.nio.file.Files.createDirectories(dir)
      val rows = goldTriples(nFiles, sentsPerFile).toSeq
        .map { t =>
          val fields =
            Seq(t.subj, t.pred, t.obj, t.repo, t.path, t.contentSha)
          // corpus-derived text must be TSV-safe: a tab/newline/backslash
          // in any field would silently corrupt the DuckDB gold
          // aggregation — fail LOUDLY at export instead
          fields.find(f => f.exists(c => c == '\t' || c == '\n' ||
              c == '\r' || c == '\\')).foreach { bad =>
            throw new IllegalStateException(
              s"gold triple field not TSV-safe: '${bad.take(80)}'")
          }
          fields.mkString("\t")
        }
        .sorted
      val sb = new StringBuilder("subj\tpred\tobj\trepo\tpath\tcontentsha\n")
      rows.foreach(r => sb.append(r).append('\n'))
      java.nio.file.Files.write(file, sb.toString.getBytes("UTF-8"))
    }
    file
  }
}
