package graft.tag

/** k-best Viterbi decoder over per-token emission scores + a transition
  * matrix — the pure-Scala stand-in for the reference's CRF decode
  * (component/BETTER/joint/CRF_util.py:45-173; k=1 fast path :60-65, which
  * is what the demo config uses — saved_args.json k_ner/k_tri/k_arg = 1).
  *
  * Scores are log-potentials; -inf (Double.NegativeInfinity) masks a label
  * at a position — exactly how the reference applies its decode-time
  * constraint masks (`masked_fill -1e7`, neural_model.py:484-486,514-523;
  * SURVEY.md P11).
  */
object Viterbi {

  val NegInf: Double = Double.NegativeInfinity

  /** Decode the single best path — the k=1 fast path the demo config uses
    * (CRF_util.py:60-65), allocation-free except three primitive arrays
    * (this runs once per sentence per tagger on every row; the k-best
    * variant below allocates per-(token,label) candidate lists and is kept
    * for the general case).
    *
    * @param emissions  emissions(t)(l) = log-score of label l at position t
    * @param transition transition(l1)(l2) = log-score of l1 -> l2
    * @return best label-index path (length = emissions.length)
    */
  def decode(emissions: Array[Array[Double]], transition: Array[Array[Double]]): Array[Int] = {
    val n = emissions.length
    if (n == 0) return Array.empty
    val L = emissions(0).length
    var prev = new Array[Double](L)
    var curr = new Array[Double](L)
    val back = Array.ofDim[Int](n, L)
    var l = 0
    while (l < L) {
      prev(l) =
        if (transition(0)(l) == NegInf || emissions(0)(l) == NegInf) NegInf
        else emissions(0)(l)
      l += 1
    }
    var t = 1
    while (t < n) {
      val em = emissions(t)
      var j = 0
      while (j < L) {
        var best = NegInf
        var bestP = -1
        if (em(j) != NegInf) {
          var p = 0
          while (p < L) {
            val tp = transition(p)(j)
            if (tp != NegInf && prev(p) != NegInf) {
              val s = prev(p) + tp
              if (s > best) { best = s; bestP = p }
            }
            p += 1
          }
        }
        curr(j) = if (bestP >= 0) best + em(j) else NegInf
        back(t)(j) = if (bestP >= 0) bestP else 0
        j += 1
      }
      val tmp = prev; prev = curr; curr = tmp
      t += 1
    }
    var bestL = 0
    var bestS = prev(0)
    l = 1
    while (l < L) { if (prev(l) > bestS) { bestS = prev(l); bestL = l }; l += 1 }
    val path = new Array[Int](n)
    path(n - 1) = bestL
    t = n - 1
    while (t > 0) { path(t - 1) = back(t)(path(t)); t -= 1 }
    path
  }

  /** k-best decode, mirroring the modified Viterbi with per-path extraction
    * of CRF_util.py:67-173 (list-Viterbi: keep k best (score, backpointer)
    * per state). Returns up to k (path, score) pairs, best first. */
  def decodeK(emissions: Array[Array[Double]], transition: Array[Array[Double]],
      k: Int): Seq[(Array[Int], Double)] = {
    val n = emissions.length
    if (n == 0) return Seq.empty
    val L = emissions(0).length
    // dp(t)(l) = up to k best (score, prevLabel, prevRank).
    // Start constraint: a sequence begins as if preceded by label 0 ("O"),
    // so BIO orphan I- tags are barred at position 0 as well (the reference
    // CRF learns START transitions; here they are structural).
    val dp = Array.ofDim[Array[(Double, Int, Int)]](n, L)
    for (l <- 0 until L) {
      val s =
        if (transition(0)(l) == NegInf || emissions(0)(l) == NegInf) NegInf
        else emissions(0)(l)
      dp(0)(l) = Array((s, -1, -1))
    }
    for (t <- 1 until n; l <- 0 until L) {
      val cands = new scala.collection.mutable.ArrayBuffer[(Double, Int, Int)]
      if (emissions(t)(l) != NegInf) {
        for (p <- 0 until L if transition(p)(l) != NegInf) {
          val prev = dp(t - 1)(p)
          var r = 0
          while (r < prev.length) {
            val s = prev(r)._1
            if (s != NegInf)
              cands += ((s + transition(p)(l) + emissions(t)(l), p, r))
            r += 1
          }
        }
      }
      dp(t)(l) =
        if (cands.isEmpty) Array((NegInf, -1, -1))
        else cands.sortBy(-_._1).take(k).toArray
    }
    // gather k best endings
    val endings = for {
      l <- 0 until L
      r <- dp(n - 1)(l).indices
      if dp(n - 1)(l)(r)._1 != NegInf
    } yield (dp(n - 1)(l)(r)._1, l, r)
    endings.sortBy(-_._1).take(k).map { case (score, lastL, lastR) =>
      val path = new Array[Int](n)
      var l = lastL; var r = lastR
      var t = n - 1
      while (t >= 0) {
        path(t) = l
        val (_, pl, pr) = dp(t)(l)(r)
        l = pl; r = pr
        t -= 1
      }
      (path, score)
    }
  }

  /** BIO-consistent transition matrix for a label vocabulary where index 0
    * is "O", followed by (B-x, I-x) pairs (or B-only tags). Disallows I-x
    * unless preceded by B-x or I-x. All allowed transitions score 0. */
  def bioTransitions(labels: Array[String]): Array[Array[Double]] = {
    val L = labels.length
    Array.tabulate(L, L) { (from, to) =>
      val t = labels(to)
      if (!t.startsWith("I-")) 0.0
      else {
        val f = labels(from)
        val tail = t.substring(2)
        if ((f.startsWith("B-") || f.startsWith("I-")) && f.substring(2) == tail) 0.0
        else NegInf
      }
    }
  }
}
