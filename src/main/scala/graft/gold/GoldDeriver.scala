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

  /** Independent mirror of the reference-loss timeline fit
    * (eval/TimelineFit — timelinemodule.py:103-216 semantics): per doc,
    * full-batch Adam on the binomial-CE + pairwise-L1 objective, fixed
    * 2000-epoch budget, hash init. Derived from the GOLD triple set (not
    * pipeline output), computed straight-line per document. The numeric
    * spec (op order, init, tie-routing) is fixed by SURVEY §7.4 so both
    * implementations produce bit-identical doubles; rounding to 4
    * decimals happens on both sides.
    *
    * Returns (doc, eventId, start_pt, duration) sorted. */
  def goldTimelines(nFiles: Long, sentsPerFile: Int): Seq[(String, String, Double, Double)] = {
    val triples = goldTriples(nFiles, sentsPerFile)
    val relLabels = Set("BEFORE", "AFTER", "SIMULTANEOUS", "INCLUDES", "IS_INCLUDED")
    val durIdx: Map[String, Int] = triples.iterator
      .filter(_.pred == "hasDuration")
      .map(t => t.subj -> Ontology.DurationClasses.indexOf(t.obj)).toMap
    val rels = triples.iterator.filter(t => relLabels(t.pred))
      .map(t => (t.subj.substring(0, t.subj.indexOf("#L")),
        t.subj, t.obj, t.pred)).toSeq
    rels.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (doc, group) =>
      val obs = group.map { case (_, a, b, label) =>
        (a, b, label, durIdx.getOrElse(a, 4), durIdx.getOrElse(b, 4))
      }
      mirrorFit(doc, obs).map { case (ev, s0, d0) => (doc, ev, s0, d0) }
    }.sortBy(r => (r._1, r._2))
  }

  /** The straight-line per-doc optimizer (mirror side). Same numeric spec
    * as TimelineFit.fitDoc, written independently: obs sorted (a,b,label),
    * predicates sorted-distinct, params u/v per predicate + scalar k, 2000
    * Adam steps with torch defaults, outputs anchored (u²−min u², v²)
    * rounded half-even to 4 decimals. */
  private def mirrorFit(doc: String,
      obsIn: Seq[(String, String, String, Int, Int)]): Seq[(String, Double, Double)] = {
    val obs = obsIn.sortBy(o => (o._1, o._2, o._3))
    val n = obs.length
    if (n == 0) return Seq.empty
    val preds = obs.flatMap(o => Seq(o._1, o._2)).distinct.sorted.toVector
    val at = preds.zipWithIndex.toMap
    val np = preds.length

    def h64(s: String): Long =
      s.foldLeft(1125899906842597L)((h, c) => 31 * h + c)
    def smix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val dh = h64(doc)
    def ini(idx: Int, column: Int): Double = {
      val z = smix(dh ^ (idx.toLong * 0x9e3779b97f4a7c15L) ^
        (column.toLong << 17))
      (java.lang.Math.floorMod(z, 2000L) - 999.5) / 1000.0
    }
    val u = Array.tabulate(np)(ini(_, 0))
    val v = Array.tabulate(np)(ini(_, 1))
    var kpar = ini(-1, 2)
    val logChoose = Array(1d, 10d, 45d, 120d, 210d, 252d, 210d, 120d, 45d,
      10d, 1d).map(math.log)
    val fineTarget: Map[String, (Double, Double, Double, Double)] = Map(
      "BEFORE" -> ((0.0, 0.4, 0.6, 1.0)),
      "AFTER" -> ((0.6, 1.0, 0.0, 0.4)),
      "INCLUDES" -> ((0.0, 1.0, 0.3, 0.7)),
      "IS_INCLUDED" -> ((0.3, 0.7, 0.0, 1.0)),
      "SIMULTANEOUS" -> ((0.0, 1.0, 0.0, 1.0)))

    val mAdam = new Array[Double](2 * np + 1)
    val vAdam = new Array[Double](2 * np + 1)
    for (epoch <- 1 to 2000) {
      val sq = u.map(x => x * x)
      var mn = sq(0); var argMn = 0
      for (j <- 1 until np) if (sq(j) < mn) { mn = sq(j); argMn = j }
      val beg = sq.map(_ - mn)
      val dur = v.map(x => x * x)
      val lgd = dur.map(math.log)
      val logits = lgd.map(kpar * _)
      val expected = Array.tabulate(np) { j =>
        val x = Array.tabulate(11)(k => logChoose(k) + k * logits(j))
        val mx = x.max
        var se = 0.0; var sk = 0.0
        for (k <- 0 until 11) {
          val e = math.exp(x(k) - mx); se += e; sk += k * e
        }
        sk / se
      }
      val gu = new Array[Double](np)
      val gv = new Array[Double](np)
      val gBeg = new Array[Double](np)
      val gDur = new Array[Double](np)
      var gK = 0.0
      val w = 1.0 / (4.0 * n)
      for ((a, b, label, ca, cb) <- obs) {
        val (ja, jb) = (at(a), at(b))
        for ((j0, c) <- Seq((ja, ca), (jb, cb))) {
          val diff = expected(j0) - c
          gK += w * diff * lgd(j0)
          gv(j0) += w * diff * kpar * 2.0 / v(j0)
        }
        val tv = Array(beg(ja), beg(ja) + dur(ja), beg(jb), beg(jb) + dur(jb))
        var qmin = 0; var qmax = 0
        for (q <- 1 until 4) {
          if (tv(q) < tv(qmin)) qmin = q
          if (tv(q) > tv(qmax)) qmax = q
        }
        val r = tv(qmax) - tv(qmin)
        val (tb1, te1, tb2, te2) = fineTarget(label)
        val gt = new Array[Double](4)
        for (((ai, bi), tgt) <- Seq(((0, 2), tb1 - tb2), ((1, 2), te1 - tb2),
            ((3, 0), te2 - tb1), ((1, 3), te1 - te2))) {
          val num = tv(ai) - tv(bi)
          val g = w * math.signum(num / r - tgt)
          gt(ai) += g / r
          gt(bi) -= g / r
          val gr = -g * num / (r * r)
          gt(qmax) += gr
          gt(qmin) -= gr
        }
        gBeg(ja) += gt(0) + gt(1); gDur(ja) += gt(1)
        gBeg(jb) += gt(2) + gt(3); gDur(jb) += gt(3)
      }
      var sumGBeg = 0.0
      for (j <- 0 until np) sumGBeg += gBeg(j)
      for (j <- 0 until np) {
        gu(j) += gBeg(j) * 2.0 * u(j)
        gv(j) += gDur(j) * 2.0 * v(j)
      }
      gu(argMn) -= sumGBeg * 2.0 * u(argMn)
      val bc1 = 1.0 - math.pow(0.9, epoch)
      val bc2 = 1.0 - math.pow(0.999, epoch)
      def adam(pi: Int, g: Double, cur: Double): Double = {
        mAdam(pi) = 0.9 * mAdam(pi) + 0.1 * g
        vAdam(pi) = 0.999 * vAdam(pi) + 0.001 * g * g
        cur - 0.001 * (mAdam(pi) / bc1) / (math.sqrt(vAdam(pi) / bc2) + 1e-8)
      }
      for (j <- 0 until np) u(j) = adam(j, gu(j), u(j))
      for (j <- 0 until np) v(j) = adam(np + j, gv(j), v(j))
      kpar = adam(2 * np, gK, kpar)
    }
    val sqF = u.map(x => x * x)
    val mnF = sqF.min
    preds.indices.map { j =>
      (preds(j), math.rint((sqF(j) - mnF) * 10000) / 10000,
        math.rint(v(j) * v(j) * 10000) / 10000)
    }
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
      // the timeline-fit mirror rides the same export gate: q47's oracle
      // reads this beside the triple set (values pre-rounded to 4
      // decimals on both sides; %.4f is exact on an rint-rounded value)
      val tlSb = new StringBuilder("doc\tevent\tstart_pt\tduration\n")
      goldTimelines(nFiles, sentsPerFile).foreach { case (doc, ev, s0, d0) =>
        tlSb.append(f"$doc\t$ev\t$s0%.4f\t$d0%.4f\n")
      }
      java.nio.file.Files.write(dir.resolve("gold_timelines.tsv"),
        tlSb.toString.getBytes("UTF-8"))
    }
    file
  }
}
