package graft.tag

/** S8 for real: the model-checkpoint side of the engine. The reference
  * torch.loads each component's checkpoint on the driver and ships the
  * model to workers (project/APIs pipeline model loads;
  * component/Duration run_model.py:109 `load_state_dict(torch.load(...))`);
  * the engine's analog persists its model side-tables — the lexicon
  * "weights" (SURVEY §7.4) — as a versioned TSV checkpoint, loads them
  * back on the driver, and BROADCASTS the loaded tables into the tagging
  * closures. The compiled-in Ontology values are the bootstrap; a
  * checkpoint round-trip must reproduce them exactly (TaggersSpec
  * round-trip + the q48 hash oracle, which runs the NER decode off the
  * broadcast LOADED model against the same oracle as the compiled-in
  * path).
  *
  * Load is STRICT: wrong magic/version, an unknown record kind, or a
  * malformed row throws — a corrupted checkpoint must fail loudly, never
  * tag with a partial model.
  */
object Checkpoint {

  val Magic = "graftlex"
  val Version = 1

  /** The broadcastable model: gazetteer (token sequence → entity type),
    * trigger lexicon (lemma → (event type, duration class)), negation
    * cues. */
  case class LexModel(gazetteer: Map[Seq[String], String],
      triggerLexicon: Map[String, (String, String)],
      negationCues: Set[String]) {
    lazy val maxGazLen: Int =
      if (gazetteer.isEmpty) 0 else gazetteer.keys.map(_.length).max
  }

  /** The compiled-in model tables (the bootstrap "weights"). */
  def fromOntology: LexModel =
    LexModel(Ontology.Gazetteer, Ontology.TriggerLexicon,
      Ontology.NegationCues)

  private def tsvSafe(f: String): String = {
    require(!f.exists(c => c == '\t' || c == '\n' || c == '\r'),
      s"checkpoint field not TSV-safe: '${f.take(40)}'")
    f
  }

  /** Serialize to `<dir>/model.tsv` (sorted, deterministic — equal models
    * write byte-identical checkpoints). Returns the file path. */
  def write(model: LexModel, dir: String): java.nio.file.Path = {
    val sb = new StringBuilder(s"$Magic\t$Version\n")
    val rows = Seq.newBuilder[String]
    model.gazetteer.foreach { case (toks, tpe) =>
      toks.foreach(t => require(!t.contains(' '), s"gazetteer token '$t'"))
      rows += s"gaz\t${tsvSafe(toks.mkString(" "))}\t${tsvSafe(tpe)}"
    }
    model.triggerLexicon.foreach { case (lemma, (tpe, dur)) =>
      rows += s"trig\t${tsvSafe(lemma)}\t${tsvSafe(tpe)}\t${tsvSafe(dur)}"
    }
    model.negationCues.foreach(c => rows += s"neg\t${tsvSafe(c)}")
    rows.result().sorted.foreach(r => sb.append(r).append('\n'))
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val f = d.resolve("model.tsv")
    java.nio.file.Files.write(f, sb.toString.getBytes("UTF-8"))
    f
  }

  /** Strict load of a checkpoint written by [[write]]. */
  def load(file: java.nio.file.Path): LexModel = {
    val lines = java.nio.file.Files.readAllLines(file)
    require(!lines.isEmpty, "empty checkpoint")
    val hdr = lines.get(0).split('\t')
    require(hdr.length == 2 && hdr(0) == Magic && hdr(1) == Version.toString,
      s"bad checkpoint header: '${lines.get(0).take(40)}'")
    val gaz = Map.newBuilder[Seq[String], String]
    val trig = Map.newBuilder[String, (String, String)]
    val neg = Set.newBuilder[String]
    var i = 1
    while (i < lines.size) {
      val parts = lines.get(i).split('\t')
      parts(0) match {
        case "gaz" =>
          require(parts.length == 3, s"bad gaz row at line ${i + 1}")
          gaz += parts(1).split(' ').toSeq -> parts(2)
        case "trig" =>
          require(parts.length == 4, s"bad trig row at line ${i + 1}")
          trig += parts(1) -> ((parts(2), parts(3)))
        case "neg" =>
          require(parts.length == 2, s"bad neg row at line ${i + 1}")
          neg += parts(1)
        case other =>
          throw new IllegalArgumentException(
            s"unknown checkpoint record kind '$other' at line ${i + 1}")
      }
      i += 1
    }
    LexModel(gaz.result(), trig.result(), neg.result())
  }
}
