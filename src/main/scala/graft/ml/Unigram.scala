package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram-language-model tokenizer (the SentencePiece algorithm, Kudo 2018
 * arXiv:1804.10959): a piece vocabulary with log probabilities; encoding is
 * the Viterbi max-probability segmentation of each pre-token, learning is
 * seed-substring extraction + hard-EM (Viterbi E-step) with iterative
 * pruning to the target vocabulary size. The complement of [[Bpe]]: several
 * production corpora (T5, LLaMA, mT5) are tokenized unigram-LM rather than
 * BPE, and a curation engine that counts/packs by tokens needs the matching
 * tokenizer to measure them.
 *
 * Same scale discipline as [[Bpe.learn]]: the only distributed stage is the
 * word-frequency aggregate (TakeOrderedAndProject, bounded collect ≤
 * `maxWords`); seeding/EM/pruning run driver-side over that bounded list.
 * Everything is deterministic — ties break (count desc, piece asc), EM
 * counts are exact Longs, and the learned model round-trips through
 * [[writeUnigramFile]]/[[parseUnigramFile]] losslessly.
 */
object Unigram {

  /** Piece vocabulary with log probabilities, in learned order (count desc,
    * piece asc). Ships in a Spark broadcast (driver-state expression
    * doctrine); derived lookups rebuild lazily once per executor.
    * Out-of-vocabulary SINGLE code points segment as themselves at
    * `unkLogProb` (coverage guarantee: every string encodes). */
  case class UnigramModel(pieces: IndexedSeq[(String, Double)],
                          unkLogProb: Double = -20.0) extends Serializable {
    @transient lazy val logProbs: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
      pieces.foreach { case (p, lp) => m.putIfAbsent(p, java.lang.Double.valueOf(lp)) }
      m
    }
    /** Longest piece in CODE POINTS — the Viterbi lookback bound. */
    @transient lazy val maxPieceCp: Int =
      if (pieces.isEmpty) 1
      else pieces.iterator.map(p => p._1.codePointCount(0, p._1.length)).max

    /** Token-id vocabulary: `<unk>` at id 0, then pieces in model order. */
    @transient lazy val vocab: IndexedSeq[String] = "<unk>" +: pieces.map(_._1)
    @transient lazy val tokenIds: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.size * 2)
      var i = 0
      while (i < vocab.size) { m.putIfAbsent(vocab(i), Integer.valueOf(i)); i += 1 }
      m
    }
  }

  /** Code-point boundary offsets of `w`: 0, …, w.length — Viterbi DP states
    * sit on these so a piece can never split a surrogate pair. */
  private[graft] def cpBoundaries(w: String): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](w.length + 1)
    var i = 0
    out += 0
    while (i < w.length) { i += Character.charCount(w.codePointAt(i)); out += i }
    out.toArray
  }

  /**
   * Viterbi max-log-probability segmentation of one pre-token. DP over
   * code-point boundaries; candidate pieces are bounded by the model's
   * longest piece. Unknown SINGLE code points fall back to `unkLogProb`
   * (so every input segments). Deterministic tie-break: for equal scores
   * the LONGEST piece ending at each position wins (strict `>` with
   * ascending start index — the first maximizer is the longest candidate).
   */
  def encodeWord(word: String, model: UnigramModel): Array[String] = {
    if (word.isEmpty) return Array.empty
    val bd = cpBoundaries(word)
    val n = bd.length - 1
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - model.maxPieceCp)
      while (j < i) {
        val lp = model.logProbs.get(word.substring(bd(j), bd(i)))
        val score =
          if (lp != null) best(j) + lp.doubleValue
          else if (i - j == 1) best(j) + model.unkLogProb
          else Double.NegativeInfinity
        if (score > best(i)) { best(i) = score; back(i) = j }
        j += 1
      }
      i += 1
    }
    // reconstruct right-to-left
    val rev = new scala.collection.mutable.ArrayBuffer[String]()
    var k = n
    while (k > 0) { val j = back(k); rev += word.substring(bd(j), bd(k)); k = j }
    rev.reverseIterator.toArray
  }

  /**
   * Learn a unigram-LM piece vocabulary from a word-frequency table.
   *
   *  1. SEED: every code-point-aligned substring of length 2..`maxPieceLen`
   *     of every word, scored by count·length; the top `seedSize` plus ALL
   *     single code points seen (mandatory coverage — singles are never
   *     pruned, the SentencePiece `required_chars` rule).
   *  2. Hard-EM rounds: E-step Viterbi-segments every word under current
   *     probabilities and accumulates exact Long piece counts; M-step
   *     re-estimates p(piece) with add-α smoothing (α = 0.1) so surviving
   *     zero-count pieces keep a finite, comparable log-prob.
   *  3. PRUNE: while |multi-cp pieces| exceeds the budget, keep the top
   *     `pruneKeep` fraction by (EM count desc, piece asc) — never below
   *     the budget in one step — and re-run EM. SentencePiece prunes by
   *     likelihood-loss; count-ranked pruning under hard EM is the
   *     deterministic simplification (a piece Viterbi never uses has count
   *     0 and is exactly the piece whose removal costs nothing).
   *
   * vocabSize counts pieces EXCLUDING `<unk>`; singles take priority, the
   * remainder goes to multi-code-point pieces.
   */
  def learnPieces(wordCounts: Seq[(String, Long)], vocabSize: Int,
                  maxPieceLen: Int = 6, seedSize: Int = 20000,
                  emIters: Int = 2, pruneKeep: Double = 0.75,
                  unkLogProb: Double = -20.0): UnigramModel = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(pruneKeep > 0 && pruneKeep < 1, s"pruneKeep in (0,1), got $pruneKeep")
    require(emIters >= 1, s"emIters must be >= 1, got $emIters")
    val wc = wordCounts.filter { case (w, c) => w.nonEmpty && c > 0L }

    // ---- seed -----------------------------------------------------------
    val subCounts = new java.util.HashMap[String, Long]()
    val singles = new java.util.TreeSet[String]()
    wc.foreach { case (w, c) =>
      val bd = cpBoundaries(w)
      val n = bd.length - 1
      var i = 0
      while (i < n) {
        singles.add(w.substring(bd(i), bd(i + 1)))
        var len = 2
        while (len <= maxPieceLen && i + len <= n) {
          val s = w.substring(bd(i), bd(i + len))
          subCounts.put(s, subCounts.getOrDefault(s, 0L) + c * len)
          len += 1
        }
        i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val seededMulti = subCounts.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue.longValue))
      .sortBy { case (p, s) => (-s, p) }
      .take(math.max(0, seedSize - singles.size))
      .map(_._1)
    var multi: Seq[String] = seededMulti
    val singleSeq = singles.asScala.toIndexedSeq

    // ---- hard-EM + prune loop -------------------------------------------
    val singleBudget = math.min(vocabSize, singleSeq.size)
    val multiBudget = math.max(0, vocabSize - singleSeq.size)
    var model = initModel(singleSeq, multi, subCounts, unkLogProb)
    var done = false
    while (!done) {
      var counts: java.util.HashMap[String, Long] = null
      var it = 0
      while (it < emIters) {
        counts = emCounts(wc, model)
        model = smoothedModel(singleSeq, multi, counts, unkLogProb)
        it += 1
      }
      if (multi.size <= multiBudget) done = true
      else {
        val keep = math.max(multiBudget,
          math.ceil(multi.size * pruneKeep).toLong.toInt)
        val next = multi
          .map(p => (p, counts.getOrDefault(p, 0L)))
          .sortBy { case (p, c) => (-c, p) }
          .take(if (keep == multi.size) multiBudget else keep)
          .map(_._1)
        multi = next
        model = smoothedModel(singleSeq, multi, counts, unkLogProb)
      }
    }
    // final E/M settle on the pruned vocabulary
    val finalCounts = emCounts(wc, model)
    val settled = smoothedModel(singleSeq, multi, finalCounts, unkLogProb)
    // drop single-cp overflow only if singles alone exceed vocabSize
    if (singleSeq.size <= vocabSize) settled
    else {
      val keptSingles = singleSeq
        .map(p => (p, finalCounts.getOrDefault(p, 0L)))
        .sortBy { case (p, c) => (-c, p) }
        .take(singleBudget).map(_._1)
      smoothedModel(keptSingles.sorted, Seq.empty, finalCounts, unkLogProb)
    }
  }

  /** Initial probabilities from seed substring scores (singles get their
    * score too via the sub-count table; absent → smoothed floor). */
  private def initModel(singles: Seq[String], multi: Seq[String],
                        scores: java.util.HashMap[String, Long],
                        unkLogProb: Double): UnigramModel = {
    val counts = new java.util.HashMap[String, Long](scores)
    smoothedModel(singles, multi, counts, unkLogProb)
  }

  /** M-step: add-α log-probabilities over the current vocabulary, pieces
    * ordered (count desc, piece asc) — the model order that fixes ids. */
  private def smoothedModel(singles: Seq[String], multi: Seq[String],
                            counts: java.util.HashMap[String, Long],
                            unkLogProb: Double): UnigramModel = {
    val alpha = 0.1
    val all = (singles ++ multi)
      .map(p => (p, counts.getOrDefault(p, 0L)))
      .sortBy { case (p, c) => (-c, p) }
    val total = all.iterator.map(_._2).sum.toDouble
    val denom = math.log(total + alpha * all.size)
    UnigramModel(
      all.map { case (p, c) => (p, math.log(c + alpha) - denom) }.toIndexedSeq,
      unkLogProb)
  }

  /** E-step: exact Long piece counts from Viterbi segmentations. */
  private def emCounts(wc: Seq[(String, Long)],
                       model: UnigramModel): java.util.HashMap[String, Long] = {
    val counts = new java.util.HashMap[String, Long]()
    wc.foreach { case (w, c) =>
      encodeWord(w, model).foreach(p =>
        counts.put(p, counts.getOrDefault(p, 0L) + c))
    }
    counts
  }

  /** Serialize: version line, unk log-prob, then one `piece logp` line per
    * piece in model order. Pieces come from [[graft.operators.TextOps
    * .bpeTokenPattern]] pre-tokens — they can never contain ASCII space —
    * and logp uses Double.toString (round-trip exact). */
  def writeUnigramFile(model: UnigramModel): String =
    (s"#graft-unigram v1" ::
      s"#unk ${model.unkLogProb}" ::
      model.pieces.map { case (p, lp) => s"$p $lp" }.toList).mkString("\n")

  def parseUnigramFile(lines: Iterator[String]): UnigramModel = {
    val it = lines.map(_.trim).filter(_.nonEmpty).buffered
    require(it.hasNext, "empty unigram model file")
    val header = it.next()
    require(header.startsWith("#graft-unigram"),
      s"not a graft unigram file: '$header'")
    var unk = -20.0
    if (it.hasNext && it.head.startsWith("#unk ")) {
      unk = it.next().substring(5).toDouble
    }
    val pieces = scala.collection.immutable.IndexedSeq.newBuilder[(String, Double)]
    it.foreach { line =>
      val sep = line.lastIndexOf(' ')
      require(sep > 0 && sep < line.length - 1, s"malformed piece line: '$line'")
      pieces += ((line.substring(0, sep), line.substring(sep + 1).toDouble))
    }
    UnigramModel(pieces.result(), unk)
  }

  /**
   * Learn a unigram-LM model from a document corpus: pre-tokenize with
   * [[graft.operators.TextOps.bpeTokenPattern]] (the same splitter
   * `unigram_encode` applies), aggregate word counts distributed, keep the
   * top `maxWords` by (count desc, word asc) — bounded collect — and run
   * seed + hard-EM + prune driver-side.
   */
  def learn(df: DataFrame, textCol: String, vocabSize: Int,
            maxWords: Int = 50000, minCount: Long = 2L,
            maxPieceLen: Int = 6, seedSize: Int = 20000,
            emIters: Int = 2): UnigramModel = {
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val wc = df
      .select(explode(regexp_extract_all(col(textCol),
        lit(graft.operators.TextOps.bpeTokenPattern), lit(0))).as("__w"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount)
      .orderBy(col("__c").desc, col("__w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    learnPieces(wc.toSeq, vocabSize, maxPieceLen, seedSize, emIters)
  }
}
